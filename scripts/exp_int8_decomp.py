"""Experiment 2: WHERE does the int8 vgg11_me model lose to bf16?

DEVICE-side scan timing (``utils.timing.scan_time_s``): wall-clock pairing
at these ~0.3 ms call times measures the tunnel's dispatch throughput, not
the chip (per-pair ratios spread 0.2–3.4×, first version of this script);
the scan methodology is ±2% reproducible, so each comparison below is a
real decision (VERDICT r3 items 1b + 3).

Parts:
  A. model variants int8-vs-bf16 (which component inverts the speedup)
  B. per-BLOCK prefix attribution of the flagship (both dtypes): time
     model prefixes cut after each backbone block / head stage; successive
     differences = per-stage device time (VERDICT r3 item 4)

Writes scripts/exp_int8_decomp.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bayestpu.core.config import BayesConfig, DropoutKind, QuantConfig, SamplingMode
from bayestpu.core.rng import BAYES_RNG
from bayestpu.engine import sampler
from bayestpu.nn.zoo import get_model
from bayestpu.utils.timing import scan_compare, scan_time_s

Q = QuantConfig(total_bits=8, integer_bits=0, int8_infer=True)
S = 10


def build_step(name, quant, fused=True, bayes=None, **kw):
    """scalar-carry step running the full spatial predictive."""
    key = jax.random.key(0)
    x = jax.random.normal(key, (128, 32, 32, 3))
    bayes = bayes or BayesConfig(rate=0.25)
    model = get_model(name, bayes=bayes, fused=fused,
                      dtype=jnp.bfloat16, quant=quant, **kw)
    vs = jax.jit(lambda k, xb: model.init(
        {"params": k, BAYES_RNG: k}, xb))(key, x)

    def step(c):
        # carry feeds BOTH the input and the key: a constant key lets XLA
        # hoist in-graph (unfused) mask draws out of the timing loop
        k = jax.random.fold_in(key, (c * 1e30).astype(jnp.int32))
        return sampler.predictive(model, vs, x + c, k, S,
                                  SamplingMode.SPATIAL).probs
    return step


def part_a(out):
    none_b = BayesConfig(kind=DropoutKind.NONE)
    cases = {
        "vgg11_1exit": dict(name="vgg11"),
        "vgg11_me_5exit": dict(name="vgg11_me"),
        "vgg11_me_unfused": dict(name="vgg11_me", fused=False),
        "vgg11_nobayes": dict(name="vgg11", bayes=none_b),
        "resnet18_me": dict(name="resnet18_me", num_classes=100),
    }
    for tag, c in cases.items():
        kw = {k: v for k, v in c.items() if k != "name"}
        cmp = scan_compare(build_step(c["name"], Q, **kw),
                           build_step(c["name"], None, **kw),
                           iters=40, repeats=3, labels=("int8", "bf16"))
        rec = {"int8_ms": cmp["int8_s"] * 1e3,
               "bf16_ms": cmp["bf16_s"] * 1e3,
               "int8_speedup": 1.0 / cmp["median_ratio_a_over_b"],
               "ratios": [1.0 / p["ratio_a_over_b"] for p in cmp["pairs"]]}
        out["variants"][tag] = rec
        print(tag, json.dumps(rec), flush=True)


def build_prefix_step(quant, n_blocks_keep, with_exits, with_head):
    """vgg11_me prefix: first n blocks (+ their exits if with_exits),
    then (optionally) the dense head + classifier on the final block."""
    from bayestpu.nn.zoo.vgg import VGG

    key = jax.random.key(0)
    x = jax.random.normal(key, (128, 32, 32, 3))
    model = get_model("vgg11_me", bayes=BayesConfig(rate=0.25), fused=True,
                      dtype=jnp.bfloat16, quant=quant)
    vs = jax.jit(lambda k, xb: model.init(
        {"params": k, BAYES_RNG: k}, xb))(key, x)

    # a truncated twin sharing the SAME param tree prefix: n_exits=1 +
    # fewer blocks can't reuse params, so instead run the full model but
    # time prefixes via capture: simplest robust route — rebuild VGG with a
    # truncated cfg and fresh params; per-stage deltas only need consistent
    # shapes, not shared weights.
    from bayestpu.nn.zoo.vgg import CFGS, _blocks_of
    blocks = _blocks_of(CFGS["vgg11"])
    cfg = []
    for b in blocks[:n_blocks_keep]:
        cfg.extend(b)
        cfg.append("M")
    CFGS["_prefix"] = cfg
    m = VGG(cfg_name="_prefix", bayes=BayesConfig(rate=0.25),
            num_classes=10,
            n_exits=(n_blocks_keep if with_exits else 1),
            dropout_exit=with_head, head_dims=(512, 512) if with_head else (),
            quant=quant, dtype=jnp.bfloat16, fused=True)
    vs2 = jax.jit(lambda k, xb: m.init(
        {"params": k, BAYES_RNG: k}, xb))(key, x)

    def step(c):
        k = jax.random.fold_in(key, (c * 1e30).astype(jnp.int32))
        return sampler.predictive(m, vs2, x + c, k, S,
                                  SamplingMode.SPATIAL).probs
    return step


def part_b(out):
    for dtag, q in (("bf16", None), ("int8", Q)):
        rows = []
        prev = 0.0
        # backbone blocks without exits/head
        for nb in range(1, 6):
            t = scan_time_s(build_prefix_step(q, nb, False, False),
                            iters=40, repeats=3).median_s
            rows.append({"prefix": f"blocks<= {nb} (no exits)",
                         "total_ms": t * 1e3,
                         "delta_ms": (t - prev) * 1e3})
            prev = t
            print(dtag, rows[-1], flush=True)
        # + exits
        t = scan_time_s(build_prefix_step(q, 5, True, False),
                        iters=40, repeats=3).median_s
        rows.append({"prefix": "5 blocks + 4 exit cascades",
                     "total_ms": t * 1e3, "delta_ms": (t - prev) * 1e3})
        prev = t
        print(dtag, rows[-1], flush=True)
        # + dense head + bayes classifier sites
        t = scan_time_s(build_prefix_step(q, 5, True, True),
                        iters=40, repeats=3).median_s
        rows.append({"prefix": "full (head + bayes classifiers)",
                     "total_ms": t * 1e3, "delta_ms": (t - prev) * 1e3})
        print(dtag, rows[-1], flush=True)
        out["prefix_attribution"][dtag] = rows


def main():
    out = {"device": str(jax.devices()[0]), "method": "scan_time_s",
           "variants": {}, "prefix_attribution": {}}
    print("== A: variant int8-vs-bf16 ==", flush=True)
    part_a(out)
    print("== B: prefix attribution ==", flush=True)
    part_b(out)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "exp_int8_decomp.json")
    with open(path, "w") as fp:
        json.dump(out, fp, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()

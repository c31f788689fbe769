"""Experiment: per-dtype routing of DETERMINISTIC convs (VERDICT r3 item 1a).

Round 3 reverted all deterministic convs to XLA based on bf16 paired
measurements (commit 051b418), which also collapsed the int8 routing to the
same choice without measuring it. This experiment measures, paired
(``utils.timing.paired_compare``), at the flagship's actual shapes:

  A. isolated conv-chain: XLA int8 conv (+XLA-fused requant epilogue)
     vs Pallas ``conv_int8_fused`` (in-kernel epilogue, int8 residency),
     vs the XLA bf16 conv chain as the speed reference;
  B. in-model: vgg11_me int8 spatial predict with deterministic-conv
     routing XLA-everywhere vs Pallas-everywhere vs Pallas-deep-only.

Writes scripts/exp_int8_routing.json. Run on the TPU chip.
"""

from __future__ import annotations

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bayestpu.core.config import BayesConfig, QuantConfig, SamplingMode
from bayestpu.core.rng import BAYES_RNG
from bayestpu.engine import sampler
from bayestpu.kernels.masked_conv import conv_int8_fused
from bayestpu.utils.timing import paired_compare

Q = QuantConfig(total_bits=8, integer_bits=0, int8_infer=True)
STEP = 2.0 ** -7

# (H, in_ch, out_ch) of every deterministic conv in vgg11_me's backbone +
# exit cascades at batch 128 (CIFAR-10, 32x32)
VGG_SHAPES = [
    (32, 3, 64), (16, 64, 128), (8, 128, 256), (8, 256, 256),
    (4, 256, 512), (4, 512, 512), (2, 512, 512), (2, 512, 512),
    # exit-head stride-2 cascades (largest members)
    (16, 64, 128), (8, 128, 256), (8, 256, 512),
]


def _rand_int8(key, shape):
    return jax.random.randint(key, shape, -127, 128, jnp.int8)


def chain_xla_int8(xq, w1, w2, b1, b2):
    """Two int8 convs, XLA path, int8 residency between them (the current
    in-model dataflow: fused.py int8_mode XLA branch + XLA epilogue)."""
    def one(x, w, b):
        acc = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * (STEP * STEP) + b
        y = jax.nn.relu(y)
        s = y / STEP
        return jnp.clip(jnp.trunc(s + jnp.where(s >= 0, 0.5, -0.5)),
                        -128.0, 127.0).astype(jnp.int8)
    return one(one(xq, w1, b1), w2, b2)


def chain_pallas_int8(xq, w1, w2, b1, b2):
    def one(x, w, b):
        return conv_int8_fused(x, w, STEP, STEP, bias=b, act="relu",
                               out_step=STEP)
    return one(one(xq, w1, b1), w2, b2)


def chain_xla_bf16(x, w1, w2, b1, b2):
    def one(x, w, b):
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(jnp.float32)
        return jax.nn.relu(y + b).astype(jnp.bfloat16)
    return one(one(x, w1, b1), w2, b2)


def isolated(batch=128):
    out = []
    key = jax.random.key(0)
    for (h, cin, cout) in VGG_SHAPES:
        ks = jax.random.split(key, 6)
        xq = _rand_int8(ks[0], (batch, h, h, cin))
        w1 = _rand_int8(ks[1], (3, 3, cin, cout))
        w2 = _rand_int8(ks[2], (3, 3, cout, cout))
        b1 = jax.random.normal(ks[3], (cout,)) * 0.1
        b2 = jax.random.normal(ks[4], (cout,)) * 0.1
        xf = xq.astype(jnp.float32) * STEP

        f_xla = jax.jit(chain_xla_int8)
        f_pal = jax.jit(chain_pallas_int8)
        f_bf = jax.jit(chain_xla_bf16)
        rec = {"shape": [h, cin, cout], "batch": batch}
        # correctness spot-check before timing
        ref = np.asarray(f_xla(xq, w1, w2, b1, b2), jnp.int32)
        got = np.asarray(f_pal(xq, w1, w2, b1, b2), jnp.int32)
        rec["pallas_vs_xla_int8_maxdiff"] = int(np.abs(ref - got).max())
        cmp = paired_compare(
            functools.partial(f_pal, xq, w1, w2, b1, b2),
            functools.partial(f_xla, xq, w1, w2, b1, b2),
            pairs=3, iters=16, labels=("pallas_int8", "xla_int8"))
        rec["pallas_vs_xla_int8"] = {
            "pallas_ms": cmp["median_pallas_int8_s"] * 1e3,
            "xla_ms": cmp["median_xla_int8_s"] * 1e3,
            "ratio_pallas_over_xla": cmp["median_ratio_a_over_b"],
            "winner": cmp["winner"]}
        cmp2 = paired_compare(
            functools.partial(f_bf, xf, w1.astype(jnp.float32),
                              w2.astype(jnp.float32), b1, b2),
            functools.partial(f_xla, xq, w1, w2, b1, b2),
            pairs=3, iters=16, labels=("bf16", "xla_int8"))
        rec["bf16_vs_xla_int8"] = {
            "bf16_ms": cmp2["median_bf16_s"] * 1e3,
            "xla_int8_ms": cmp2["median_xla_int8_s"] * 1e3,
            "ratio_bf16_over_xla_int8": cmp2["median_ratio_a_over_b"],
            "winner": cmp2["winner"]}
        out.append(rec)
        print(json.dumps(rec), flush=True)
    return out


def in_model(batch=128, routings=("xla", "pallas", "deep")):
    """vgg11_me int8 spatial predict under different deterministic-conv
    routings, all pairs measured against the 'xla' baseline."""
    from bayestpu.nn import fused as fused_mod
    from bayestpu.nn.zoo import get_model

    key = jax.random.key(0)
    x = jax.random.normal(key, (batch, 32, 32, 3))

    def build(routing):
        orig = fused_mod._det_conv_pallas
        if routing == "xla":
            fused_mod._det_conv_pallas = lambda c, s, i: False
        elif routing == "pallas":
            fused_mod._det_conv_pallas = lambda c, s, i: True
        elif routing == "deep":
            fused_mod._det_conv_pallas = (
                lambda c, s, i: c >= 256)
        try:
            model = get_model("vgg11_me", bayes=BayesConfig(rate=0.25),
                              fused=True, dtype=jnp.bfloat16, quant=Q)
            vs = jax.jit(lambda k, xb: model.init(
                {"params": k, BAYES_RNG: k}, xb))(key, x)

            @jax.jit
            def f(vs, xb, k):
                return jnp.sum(sampler.predictive(
                    model, vs, xb, k, 10, SamplingMode.SPATIAL).probs)
            # trace+compile inside the patched scope
            f(vs, x, key).block_until_ready()
        finally:
            fused_mod._det_conv_pallas = orig
        return functools.partial(f, vs, x, key)

    fns = {r: build(r) for r in routings}
    out = {}
    for r in routings:
        if r == "xla":
            continue
        cmp = paired_compare(fns[r], fns["xla"], pairs=5, iters=16,
                             labels=(r, "xla"))
        out[f"{r}_vs_xla"] = {
            f"{r}_ms": cmp[f"median_{r}_s"] * 1e3,
            "xla_ms": cmp["median_xla_s"] * 1e3,
            "ratio": cmp["median_ratio_a_over_b"],
            "winner": cmp["winner"],
            "pairs": cmp["pairs"]}
        print(r, json.dumps(out[f"{r}_vs_xla"]["ratio"]), flush=True)
    return out


def main():
    res = {"device": str(jax.devices()[0])}
    print("== isolated conv chains ==", flush=True)
    res["isolated"] = isolated()
    print("== in-model routing ==", flush=True)
    res["in_model"] = in_model()
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "exp_int8_routing.json")
    with open(path, "w") as fp:
        json.dump(res, fp, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()

"""Experiment: WHY does flagship throughput fall off at batch 1024?
(VERDICT r4 next #6: 4.43 M samples/s @256 -> 3.89 M @1024, fraction of
peak 0.63 -> 0.56, unexplained.)

Method: device-side scan timing (``utils.timing.scan_time_s``) of vgg11_me
bf16 spatial-predictive PREFIXES (same truncation scheme as
``exp_int8_decomp.build_prefix_step``) at batch 256 and 1024; per-stage
delta ratio (t_1024 / (4 * t_256)) localizes which stage loses efficiency
at the larger batch. A stage ratio ~1.0 scales linearly; >1.0 is the
falloff.

Writes scripts/exp_batch_falloff.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bayestpu.core.config import BayesConfig, SamplingMode
from bayestpu.core.rng import BAYES_RNG
from bayestpu.engine import sampler
from bayestpu.utils.timing import scan_time_s

S = 10


def build_prefix_step(batch, n_blocks_keep, with_exits, with_head):
    from bayestpu.nn.zoo.vgg import CFGS, VGG, _blocks_of

    key = jax.random.key(0)
    x = jax.random.normal(key, (batch, 32, 32, 3))
    blocks = _blocks_of(CFGS["vgg11"])
    cfg = []
    for b in blocks[:n_blocks_keep]:
        cfg.extend(b)
        cfg.append("M")
    CFGS["_prefix_bf"] = cfg
    m = VGG(cfg_name="_prefix_bf", bayes=BayesConfig(rate=0.25),
            num_classes=10,
            n_exits=(n_blocks_keep if with_exits else 1),
            dropout_exit=with_head,
            head_dims=(512, 512) if with_head else (),
            quant=None, dtype=jnp.bfloat16, fused=True)
    vs = jax.jit(lambda k, xb: m.init(
        {"params": k, BAYES_RNG: k}, xb))(key, x)

    def step(c):
        k = jax.random.fold_in(key, (c * 1e30).astype(jnp.int32))
        return sampler.predictive(m, vs, x + c, k, S,
                                  SamplingMode.SPATIAL).probs
    return step


def main():
    out = {"device": str(jax.devices()[0]), "method": "scan_time_s",
           "model": "vgg11_me bf16 S10", "stages": []}
    cuts = ([(nb, False, False) for nb in range(1, 6)]
            + [(5, True, False), (5, True, True)])
    names = ([f"blocks<= {nb} (no exits)" for nb in range(1, 6)]
             + ["5 blocks + 4 exit cascades", "full (head + classifiers)"])
    # batch 1 rides along: the FPGA papers' headline is single-input
    # latency, and VERDICT r4 weak #4 asked for a small-shape
    # decomposition of the batch-1 flagship too — per-stage deltas at
    # batch 1 show whether its 0.13-of-peak fraction is a per-stage
    # dispatch/shape floor (flat deltas) or a fixable mapping miss.
    batches = (1, 256, 1024)
    prev = {b: 0.0 for b in batches}
    for (nb, we, wh), name in zip(cuts, names):
        row = {"prefix": name}
        for batch in batches:
            iters = {1: 100, 256: 40, 1024: 10}[batch]
            t = scan_time_s(build_prefix_step(batch, nb, we, wh),
                            iters=iters, repeats=3).median_s
            row[f"total_ms_b{batch}"] = t * 1e3
            row[f"delta_ms_b{batch}"] = (t - prev[batch]) * 1e3
            prev[batch] = t
        d256, d1024 = row["delta_ms_b256"], row["delta_ms_b1024"]
        row["delta_ratio_1024_over_4x256"] = (
            d1024 / (4 * d256) if d256 > 1e-4 else None)
        out["stages"].append(row)
        print(json.dumps(row), flush=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "exp_batch_falloff.json")
    with open(path, "w") as fp:
        json.dump(out, fp, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()

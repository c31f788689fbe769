"""Experiment: small-model mapping (VERDICT r4 next #5 — lenet_me at 0.11
of compute peak, batch-1 flagship at 0.13; the reference hand-tunes
per-layer ReuseFactors exactly here, ``hls4ml_build.py:23-58``).

Questions, each answered with device-side scan timing:

A. Whole-model: does the fused Pallas path beat the unfused (XLA) path at
   lenet_me's tiny shapes at all?  (Per-layer kernel choice is the TPU
   analogue of per-layer ReuseFactor.)
B. Stage isolation (fused path): conv1+pool / conv2 / fc1 / heads timed
   standalone at the model's own shapes; sum vs full-model time = the
   dispatch/fusion-boundary overhead the roofline fraction can't see.
C. Knob sweep on the dominant masked kernels at lenet shapes:
   block_m for the multi-sample masked matmul, block_b for the masked
   conv.

Writes scripts/exp_small_tuning.json.
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
from bayestpu.nn.zoo import get_model
from bayestpu.utils.timing import scan_compare, scan_time_s

S, BATCH = 10, 256


def model_step(fused: bool):
    key = jax.random.key(0)
    x = jax.random.normal(key, (BATCH, 28, 28, 1))
    m = get_model("lenet_me", bayes=BayesConfig(rate=0.25), fused=fused,
                  dtype=jnp.bfloat16)
    vs = jax.jit(lambda k, xb: m.init(
        {"params": k, BAYES_RNG: k}, xb))(key, x)

    def step(c):
        k = jax.random.fold_in(key, (c * 1e30).astype(jnp.int32))
        return sampler.predictive(m, vs, x + c, k, S,
                                  SamplingMode.SPATIAL).probs
    return step


def part_a(out):
    cmp = scan_compare(model_step(True), model_step(False),
                       iters=100, repeats=3, labels=("fused", "unfused"))
    out["model_fused_vs_unfused"] = {
        "fused_ms": cmp["fused_s"] * 1e3,
        "unfused_ms": cmp["unfused_s"] * 1e3,
        "fused_speedup": 1.0 / cmp["median_ratio_a_over_b"],
        "ratios": [1.0 / p["ratio_a_over_b"] for p in cmp["pairs"]]}
    print("A", json.dumps(out["model_fused_vs_unfused"]), flush=True)


def part_b(out):
    """Standalone stages at lenet_me's own shapes (bf16, fused path)."""
    key = jax.random.key(0)
    kb = jnp.bfloat16
    x0 = jax.random.normal(key, (BATCH, 28, 28, 1), kb)
    w1 = jax.random.normal(key, (5, 5, 1, 20), kb) * 0.1
    x1 = jax.random.normal(key, (BATCH, 14, 14, 20), kb)   # post pool
    w2 = jax.random.normal(key, (5, 5, 20, 20), kb) * 0.1
    xf = jax.random.normal(key, (S, BATCH, 100), kb)       # per-sample feats
    wf = jax.random.normal(key, (100, 10), kb) * 0.1

    import flax.linen as nn

    def conv(xc, w):
        return jax.lax.conv_general_dilated(
            xc, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    stages = {
        # conv1 (deterministic, sample-invariant -> computed once)
        "conv1_pool": lambda c: nn.max_pool(
            jax.nn.relu(conv(x0 + c.astype(kb), w1)), (2, 2), (2, 2)),
        # conv2 (deterministic in lenet_me) + pool7
        "conv2_pool": lambda c: nn.max_pool(
            jax.nn.relu(conv(x1 + c.astype(kb), w2)), (7, 7), (7, 7)),
        # per-sample heads: S x (B,100) @ (100,10) + softmax
        "heads": lambda c: jax.nn.softmax(
            jnp.einsum("sbf,fc->sbc", xf + c.astype(kb), wf), -1),
    }
    rows = {}
    for tag, f in stages.items():
        t = scan_time_s(f, iters=200, repeats=3).median_s
        rows[tag] = t * 1e3
        print("B", tag, f"{t * 1e3:.4f} ms", flush=True)
    t_full = scan_time_s(model_step(True), iters=100, repeats=3).median_s
    rows["full_model"] = t_full * 1e3
    rows["sum_of_stages"] = sum(v for k, v in rows.items()
                                if k != "full_model")
    rows["note"] = ("full includes 2 fused masked fc_1-style matmuls, "
                    "exit-branch convs, and per-op dispatch/fusion "
                    "boundaries the isolated stages don't")
    out["stage_isolation"] = rows
    print("B full", f"{t_full * 1e3:.4f} ms", flush=True)


def part_c(out):
    from bayestpu.kernels.masked_conv import dropout_conv_inference
    from bayestpu.kernels.masked_matmul import dropout_matmul_inference

    key = jax.random.key(0)
    seeds = jnp.asarray([1, 2], jnp.int32)
    # fc_1-like masked matmul, sample-collapsed: (S*B, 80) @ (80, 100)
    xm = jax.random.normal(key, (S * BATCH, 80), jnp.bfloat16)
    wm = jax.random.normal(key, (80, 100), jnp.bfloat16) * 0.1
    sweep = {}
    for bm in (128, 256, 512, 1024):
        t = scan_time_s(
            lambda c, bm=bm: dropout_matmul_inference(
                xm + c.astype(jnp.bfloat16), wm, seeds, 0.25, block_m=bm),
            iters=400, repeats=3).median_s
        sweep[f"block_m={bm}"] = t * 1e3
        print("C matmul", bm, f"{t * 1e3:.4f} ms", flush=True)
    out["matmul_block_m_sweep_ms"] = sweep

    # masked conv at lenet conv2 shape, multi-sample collapse
    xc = jax.random.normal(key, (BATCH, 14, 14, 20), jnp.bfloat16)
    wc = jax.random.normal(key, (5, 5, 20, 20), jnp.bfloat16) * 0.1
    csweep = {}
    # 0 = auto; pinned bb≥32 at this geometry fails to compile (scoped
    # VMEM OOM at 128, compiler crash at 32 — honoring pinned knobs is
    # by-design, the auto path is the safe one)
    for bb in (0, 8, 16):
        t = scan_time_s(
            lambda c, bb=bb: dropout_conv_inference(
                xc + c.astype(jnp.bfloat16), wc, seeds, 0.25,
                block_b=bb),
            iters=200, repeats=3).median_s
        csweep[f"block_b={bb or 'auto'}"] = t * 1e3
        print("C conv", bb, f"{t * 1e3:.4f} ms", flush=True)
    out["conv_block_b_sweep_ms"] = csweep


def main():
    out = {"device": str(jax.devices()[0]), "method": "scan_time_s",
           "model": f"lenet_me b{BATCH} S{S}"}
    part_a(out)
    part_b(out)
    part_c(out)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "exp_small_tuning.json")
    with open(path, "w") as fp:
        json.dump(out, fp, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()

"""Benchmark harness: MC forward samples/s on the flagship multi-exit model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The headline metric is MC samples/s for the multi-exit MC-dropout model
(BASELINE.json north star: "MC forward samples/s/chip at fixed ECE").
``vs_baseline`` compares the engine's spatial (vmapped, fused) mapping to the
reference's temporal mapping strategy — a host-side loop of single-sample
predicts, which is exactly how the FPGA artifact collects MC samples
(``Hardware_Artifact/bayes_hw/hls4ml_pred.py:97-110``) — measured on the
same hardware in the same process.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from bayestpu.core.config import BayesConfig, SamplingMode
from bayestpu.core.rng import BAYES_RNG, sample_keys
from bayestpu.engine import sampler
from bayestpu.nn.zoo import get_model

BATCH = 256
MC_SAMPLES = 10
WARMUP = 3
ITERS = 20


def _time(fn, *args) -> float:
    for _ in range(WARMUP):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS


def main() -> None:
    model = get_model("lenet_me", bayes=BayesConfig(rate=0.25),
                      dtype=jnp.bfloat16)
    key = jax.random.key(0)
    x = jax.random.normal(key, (BATCH, 28, 28, 1))
    variables = model.init({"params": key, BAYES_RNG: key}, x)

    @jax.jit
    def spatial(vs, xb, k):
        return sampler.predictive(model, vs, xb, k, MC_SAMPLES,
                                  SamplingMode.SPATIAL).probs

    # The reference-style temporal baseline: one jitted single-sample predict,
    # driven by a host loop (hls4ml_pred.py:102 semantics).
    @jax.jit
    def one_sample(vs, xb, k, i):
        out = model.apply(vs, xb, sample_idx=i, train=False,
                          rngs={BAYES_RNG: k})
        return jax.nn.softmax(out.logits, axis=-1)

    def host_loop(vs, xb, k):
        keys = sample_keys(k, MC_SAMPLES)
        acc = None
        for i in range(MC_SAMPLES):
            p = one_sample(vs, xb, keys[i], jnp.int32(i))
            acc = p if acc is None else acc + p
        return acc / MC_SAMPLES

    t_spatial = _time(spatial, variables, x, key)
    t_loop = _time(host_loop, variables, x, key)

    samples_per_s = BATCH * MC_SAMPLES / t_spatial
    baseline_sps = BATCH * MC_SAMPLES / t_loop
    print(json.dumps({
        "metric": "mc_samples_per_sec",
        "value": round(samples_per_s, 1),
        "unit": "image-samples/s (lenet_me, batch=256, S=10)",
        "vs_baseline": round(samples_per_s / baseline_sps, 3),
    }))


if __name__ == "__main__":
    main()

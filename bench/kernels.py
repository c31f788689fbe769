"""Kernel-level microbenchmarks: fused Pallas paths vs their XLA baselines.

Run on the real chip: ``python -m bench.kernels``. Shapes model the MC head
the reference replicates on fabric (backbone feature width K → classes N)
plus one compute-bound shape. Prints a JSON dict per config.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp

from bayestpu.kernels.masked_matmul import (
    dropout_matmul,
    dropout_matmul_int8,
    dropout_matmul_samples,
)
from bayestpu.core.config import QuantConfig
from bayestpu.core.quant import quantize_int8

RATE = 0.3
S = 10


def _min_ms(f, *args, iters=50):
    from bench.timing import pipelined_s
    return pipelined_s(f, *args, iters=iters) * 1e3


def bench_shape(m: int, k: int, n: int) -> dict:
    k1, k2 = jax.random.split(jax.random.key(0))
    x = jax.random.normal(k1, (m, k))
    w = jax.random.normal(k2, (k, n)) * 0.5
    seeds = jnp.arange(2 * S, dtype=jnp.int32).reshape(S, 2) * 29 + 5

    multi = jax.jit(lambda a, b: dropout_matmul_samples(a, b, seeds, RATE))
    vmapped = jax.jit(lambda a, b: jax.vmap(
        lambda s: dropout_matmul(a, b, s, RATE))(seeds))
    # unfused baseline: mask tensors materialized in HBM (what the fused
    # kernels exist to avoid)
    def unfused(a, b):
        keys = jax.random.split(jax.random.key(1), S)
        def one(kk):
            keep = jax.random.bernoulli(kk, 1 - RATE, a.shape)
            return jnp.where(keep, a / (1 - RATE), 0.0) @ b
        return jax.vmap(one)(keys)
    unfused = jax.jit(unfused)

    cfg = QuantConfig(total_bits=8, integer_bits=2, int8_infer=True)
    xq, xs = quantize_int8(x, cfg)
    wq, ws = quantize_int8(w, cfg)
    int8_one = jax.jit(lambda a, b: dropout_matmul_int8(
        a, b, seeds[0], RATE, xs, ws))
    f32_one = jax.jit(lambda a, b: dropout_matmul(a, b, seeds[0], RATE))

    return {
        "shape": [m, k, n], "mc_samples": S,
        "multi_sample_kernel_ms": round(_min_ms(multi, x, w), 4),
        "vmap_fused_ms": round(_min_ms(vmapped, x, w), 4),
        "vmap_unfused_hbm_masks_ms": round(_min_ms(unfused, x, w), 4),
        "one_sample_int8_ms": round(_min_ms(int8_one, xq, wq), 4),
        "one_sample_f32_ms": round(_min_ms(f32_one, x, w), 4),
    }


def main() -> None:
    for shape in [(128, 512, 10),      # vgg11 head (the reference's mc head)
                  (1024, 512, 128),    # wide-batch head
                  (1024, 2048, 1024)]: # compute-bound
        print(json.dumps(bench_shape(*shape)))


if __name__ == "__main__":
    main()

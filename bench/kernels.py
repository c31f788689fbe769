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


def bench_conv_shape(b: int, h: int, w: int, c: int, f: int, k: int = 3
                     ) -> dict:
    """Fused masked-conv kernels vs the unfused path they replace:
    (Pallas elementwise mask → HBM → XLA conv) ≙ ``nn/fused.py::
    BayesConvInput`` + ``lax.conv`` — VERDICT r1 item 1's acceptance bar."""
    from bayestpu.kernels.masked_conv import (
        bank_conv,
        dropout_conv,
        dropout_conv_int8,
        dropout_conv_samples,
        mask_apply_nhwc,
    )

    k1, k2 = jax.random.split(jax.random.key(0))
    x = jax.random.normal(k1, (b, h, w, c))
    wk = jax.random.normal(k2, (k, k, c, f)) * 0.1
    seeds = jnp.arange(2 * S, dtype=jnp.int32).reshape(S, 2) * 29 + 5

    # every benched fn reduces its output to a scalar: pipelined timing keeps
    # ~50 results in flight, and a (B,H,W,F) conv output ×50 would OOM HBM
    fused_one = jax.jit(lambda a, ww: jnp.sum(
        dropout_conv(a, ww, seeds[0], RATE)))
    fused_multi = jax.jit(lambda a, ww: jnp.sum(
        dropout_conv_samples(a, ww, seeds[:4], RATE)))

    def xla_conv(a, ww):
        return jax.lax.conv_general_dilated(
            a, ww, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)

    # the unfused path this kernel replaces: same Pallas mask kernel, masked
    # activation round-trips HBM, conv is XLA's
    unfused_one = jax.jit(lambda a, ww: jnp.sum(xla_conv(
        mask_apply_nhwc(a, seeds[0], RATE), ww)))
    plain_conv = jax.jit(lambda a, ww: jnp.sum(xla_conv(a, ww)))

    bank = (jax.random.uniform(k1, (4, c)) > 0.5).astype(jnp.float32) * 2.0
    fused_bank = jax.jit(lambda a, ww: jnp.sum(bank_conv(a, ww, bank, 1)))
    unfused_bank = jax.jit(lambda a, ww: jnp.sum(xla_conv(a * bank[1], ww)))

    cfg = QuantConfig(total_bits=8, integer_bits=2, int8_infer=True)
    xq, xs = quantize_int8(x, cfg)
    wq, ws = quantize_int8(wk, cfg)
    int8_one = jax.jit(lambda a, ww: jnp.sum(dropout_conv_int8(
        a, ww, seeds[0], RATE, xs, ws)))

    gflop = 2 * b * h * w * c * f * k * k / 1e9
    out = {
        "conv_shape": [b, h, w, c, f, k], "gflop_per_sample": round(gflop, 2),
        "fused_dropout_conv_ms": round(_min_ms(fused_one, x, wk), 4),
        "unfused_mask_hbm_xla_conv_ms": round(_min_ms(unfused_one, x, wk), 4),
        "plain_xla_conv_ms": round(_min_ms(plain_conv, x, wk), 4),
        "fused_4sample_conv_ms": round(_min_ms(fused_multi, x, wk), 4),
        "fused_bank_conv_ms": round(_min_ms(fused_bank, x, wk), 4),
        "unfused_bank_xla_conv_ms": round(_min_ms(unfused_bank, x, wk), 4),
        "fused_int8_conv_ms": round(_min_ms(int8_one, xq, wq), 4),
    }
    out["fused_tflops"] = round(gflop / out["fused_dropout_conv_ms"], 1)
    out["vs_unfused"] = round(out["unfused_mask_hbm_xla_conv_ms"]
                              / out["fused_dropout_conv_ms"], 3)
    return out


def main() -> None:
    for shape in [(128, 512, 10),      # vgg11 head (the reference's mc head)
                  (1024, 512, 128),    # wide-batch head
                  (1024, 2048, 1024)]: # compute-bound
        print(json.dumps(bench_shape(*shape)))
    for cshape in [(128, 32, 32, 64, 128),    # vgg11 block-2 conv
                   (128, 16, 16, 256, 256),   # mid-net conv
                   (128, 8, 8, 512, 512)]:    # deep conv
        print(json.dumps(bench_conv_shape(*cshape)))


if __name__ == "__main__":
    main()

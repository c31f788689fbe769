"""Experiment 3: the int8 HEAD cost (prefix row 'full' = +0.044 ms int8 vs
+0.002 ms bf16 — scripts/exp_int8_decomp.py part B).

Isolates, with device scan timing, the flagship head's pieces at their real
shapes (batch 128, S=10):

  1. Bayes classifier site: S-vmapped fused dropout matmul (128,512)→10,
     int8 kernel vs bf16 kernel
  2. deterministic dense 512→512: XLA int8_matmul vs bf16 dot
  3. the requant chain: fake-quant QuantAct between two int8 denses

Writes scripts/exp_int8_head.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bayestpu.core.config import QuantConfig
from bayestpu.core.quant import fake_quant, int8_matmul, quantize_int8
from bayestpu.kernels.masked_matmul import (
    dropout_matmul_inference,
    dropout_matmul_int8_inference,
)
from bayestpu.utils.timing import scan_compare

Q = QuantConfig(total_bits=8, integer_bits=0, int8_infer=True)
S, B = 10, 128


def main():
    key = jax.random.key(0)
    out = {"device": str(jax.devices()[0])}

    # 1. S-vmapped fused Bayes head (the per-exit classifier pattern)
    x = jax.random.uniform(key, (B, 512), minval=-1, maxval=1)
    w = jax.random.uniform(key, (512, 10), minval=-0.1, maxval=0.1)
    xq, xs = quantize_int8(x, Q)
    wq, ws = quantize_int8(w, Q)
    seeds = jnp.stack([jnp.arange(S, dtype=jnp.int32),
                       jnp.arange(S, dtype=jnp.int32) + 7], -1)

    def head_int8(c):
        xc = jnp.clip(xq + (c * 0).astype(jnp.int8), -127, 127)
        return jax.vmap(lambda s: dropout_matmul_int8_inference(
            xc, wq, s, 0.25, xs, ws))(seeds)

    def head_bf16(c):
        return jax.vmap(lambda s: dropout_matmul_inference(
            (x + c).astype(jnp.bfloat16), w.astype(jnp.bfloat16), s, 0.25))(
                seeds)

    cmp = scan_compare(head_int8, head_bf16, iters=200, repeats=3,
                       labels=("int8", "bf16"))
    out["bayes_head_vmapS"] = {
        "int8_us": cmp["int8_s"] * 1e6, "bf16_us": cmp["bf16_s"] * 1e6,
        "int8_speedup": 1.0 / cmp["median_ratio_a_over_b"]}
    print("bayes_head", json.dumps(out["bayes_head_vmapS"]), flush=True)

    # 2. deterministic 512→512 dense
    w2 = jax.random.uniform(key, (512, 512), minval=-0.1, maxval=0.1)
    w2q, w2s = quantize_int8(w2, Q)

    def fc_int8(c):
        xc, xsc = quantize_int8(x + c, Q)
        return int8_matmul(xc, w2q, xsc, w2s)

    def fc_bf16(c):
        return jnp.dot((x + c).astype(jnp.bfloat16),
                       w2.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)

    cmp = scan_compare(fc_int8, fc_bf16, iters=200, repeats=3,
                       labels=("int8", "bf16"))
    out["fc512"] = {
        "int8_us": cmp["int8_s"] * 1e6, "bf16_us": cmp["bf16_s"] * 1e6,
        "int8_speedup": 1.0 / cmp["median_ratio_a_over_b"]}
    print("fc512", json.dumps(out["fc512"]), flush=True)

    # 3. two denses with the fake-quant act chain between (the head chain)
    def chain_int8(c):
        xc, xsc = quantize_int8(x + c, Q)
        y = int8_matmul(xc, w2q, xsc, w2s)
        y = fake_quant(jax.nn.relu(y), Q)
        yq, ysq = quantize_int8(y, Q)
        return int8_matmul(yq, w2q, ysq, w2s)

    def chain_bf16(c):
        y = jnp.dot((x + c).astype(jnp.bfloat16), w2.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        y = jax.nn.relu(y)
        return jnp.dot(y.astype(jnp.bfloat16), w2.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)

    cmp = scan_compare(chain_int8, chain_bf16, iters=200, repeats=3,
                       labels=("int8", "bf16"))
    out["fc_chain"] = {
        "int8_us": cmp["int8_s"] * 1e6, "bf16_us": cmp["bf16_s"] * 1e6,
        "int8_speedup": 1.0 / cmp["median_ratio_a_over_b"]}
    print("fc_chain", json.dumps(out["fc_chain"]), flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "exp_int8_head.json")
    with open(path, "w") as fp:
        json.dump(out, fp, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()

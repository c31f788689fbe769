"""Experiment: quantize-LATE mixed precision on the int8 flagship.

The round-5 per-stage attribution (``scripts/exp_int8_decomp.json`` part B)
shows the int8 vgg11_me loses to its bf16 twin exactly in the first two
backbone stages: blocks 0-1 cost 0.081 ms int8 vs 0.056 ms bf16 (the entry
residency boundary plus <=64-in-ch convs where XLA's int8 lowering cannot
beat bf16), while blocks 2-4 win big (0.094 ms vs 0.196 ms).  The obvious
mixed-precision move -- run blocks 0-1 in bf16 and enter int8 residency at
block 2, where the int8 MXU actually pays -- is exactly the reference's
per-layer-Precision freedom (``hls4ml_build.py:88-100``: granularity='name',
each LayerName gets its own ap_fixed width), expressed here through the
existing ``VGG.quant_overrides`` machinery (a ``None`` override makes that
block float).

Measures, with paired device-side scan windows (``utils.timing.scan_compare``):
  * full-int8 vs bf16 (the shipped 1.32x point, re-measured in-run)
  * late-k (blocks < k float, int8 from block k on) vs full-int8, k=1,2,3
  * the winning late-k vs bf16 (the new headline pairing)

Quality note: making early blocks float can only move the model TOWARD the
bf16 reference (fewer quantized layers), so the int8 quality gate bounds
these variants' drift from above; the bench quality gate still runs on the
full-int8 point.

Writes scripts/exp_quantize_late.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bayestpu.core.config import BayesConfig, QuantConfig, SamplingMode
from bayestpu.core.rng import BAYES_RNG
from bayestpu.engine import sampler
from bayestpu.nn.zoo import get_model
from bayestpu.utils.timing import scan_compare

Q = QuantConfig(total_bits=8, integer_bits=0, int8_infer=True)
S = 10


def build_step(quant, overrides=None):
    key = jax.random.key(0)
    x = jax.random.normal(key, (128, 32, 32, 3))
    model = get_model("vgg11_me", bayes=BayesConfig(rate=0.25), fused=True,
                      dtype=jnp.bfloat16, quant=quant,
                      quant_overrides=overrides)
    vs = jax.jit(lambda k, xb: model.init(
        {"params": k, BAYES_RNG: k}, xb))(key, x)

    def step(c):
        k = jax.random.fold_in(key, (c * 1e30).astype(jnp.int32))
        return sampler.predictive(model, vs, x + c, k, S,
                                  SamplingMode.SPATIAL).probs
    return step


def late_overrides(k: int):
    """Blocks < k run float (no quant); int8 residency starts at block k."""
    return {f"block{i}": None for i in range(k)}


def main():
    out = {"device": str(jax.devices()[0]), "S": S, "batch": 128,
           "variants": {}}

    bf16 = build_step(None)
    full = build_step(Q)

    cmp0 = scan_compare(full, bf16, iters=40, repeats=3,
                        labels=("int8", "bf16"))
    out["full_int8_vs_bf16"] = {
        "int8_ms": cmp0["int8_s"] * 1e3, "bf16_ms": cmp0["bf16_s"] * 1e3,
        "speedup": 1.0 / cmp0["median_ratio_a_over_b"]}
    print("full_int8_vs_bf16", json.dumps(out["full_int8_vs_bf16"]),
          flush=True)

    best_k, best_speedup = 0, 1.0
    for k in (1, 2, 3):
        late = build_step(Q, late_overrides(k))
        cmp = scan_compare(late, full, iters=40, repeats=3,
                           labels=("late", "full"))
        rec = {"late_ms": cmp["late_s"] * 1e3,
               "full_ms": cmp["full_s"] * 1e3,
               "speedup_vs_full_int8": 1.0 / cmp["median_ratio_a_over_b"],
               "ratios": [1.0 / p["ratio_a_over_b"] for p in cmp["pairs"]]}
        out["variants"][f"late{k}"] = rec
        print(f"late{k}", json.dumps(rec), flush=True)
        if rec["speedup_vs_full_int8"] > best_speedup:
            best_k, best_speedup = k, rec["speedup_vs_full_int8"]

    if best_k:
        late = build_step(Q, late_overrides(best_k))
        cmp = scan_compare(late, bf16, iters=40, repeats=3,
                           labels=("late", "bf16"))
        out["best"] = {
            "k": best_k, "late_ms": cmp["late_s"] * 1e3,
            "bf16_ms": cmp["bf16_s"] * 1e3,
            "speedup_vs_bf16": 1.0 / cmp["median_ratio_a_over_b"],
            "ratios": [1.0 / p["ratio_a_over_b"] for p in cmp["pairs"]]}
        print("best", json.dumps(out["best"]), flush=True)
    else:
        out["best"] = {"k": 0, "note": "no late variant beat full int8"}
        print("best: none beat full int8", flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "exp_quantize_late.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("wrote", path)


if __name__ == "__main__":
    main()

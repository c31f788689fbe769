"""Experiment: execution routing of int8-inference DENSE layers.

The flagship's per-stage decomposition (``scripts/exp_int8_decomp.json``)
shows one stage where int8 runs SLOWER than its bf16 twin: the final
"head + bayes classifiers" stage, 0.025 ms int8 vs 0.010 ms bf16. The
exit heads are 512-wide Dense/BayesDense matmuls — small enough that the
int8 quantize/rescale bracket may cost more than the MXU saves.

Knob: ``QuantConfig.int8_dense_min_dim`` — dense layers with
``in_features >= min_dim`` take the int8 MXU path, the rest run bf16 on
the same ap_fixed grid (identical semantics; same pattern as the conv
threshold ``int8_conv_min_ch``, measured in ``exp_int8_routing.json``).
The threshold is a static model attribute, so every variant — including
``scan_compare``'s own jit — traces with the intended routing (the
ADVICE-r4 lesson: no monkeypatching around re-traces).

Sweep on the int8 flagship (vgg11_me, b128, S=10):
- ``min_dim=0``   (default: every dense int8)
- ``min_dim=513`` (512-wide exit heads run bf16; nothing wider exists)
- ``min_dim=10^9``(all dense bf16 — isolates the dense int8 contribution)

Writes scripts/exp_int8_dense_routing.json.
"""

from __future__ import annotations

import dataclasses
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
S, BATCH = 10, 128


def build(min_dim: int | None):
    """int8 flagship step fn under a dense routing threshold."""
    key = jax.random.key(0)
    x = jax.random.normal(key, (BATCH, 32, 32, 3))
    q = Q if min_dim is None else dataclasses.replace(
        Q, int8_dense_min_dim=min_dim)
    m = get_model("vgg11_me", bayes=BayesConfig(rate=0.25), fused=True,
                  dtype=jnp.bfloat16, quant=q)
    vs = jax.jit(lambda k, xb: m.init(
        {"params": k, BAYES_RNG: k}, xb))(key, x)

    def step(c):
        k = jax.random.fold_in(key, (c * 1e30).astype(jnp.int32))
        return sampler.predictive(m, vs, x + c, k, S,
                                  SamplingMode.SPATIAL).probs
    return step


def main():
    out = {"device": str(jax.devices()[0]), "method": "scan_compare",
           "model": "vgg11_me int8 b128 S10",
           "knob": "QuantConfig.int8_dense_min_dim", "sweep": {}}
    base = build(None)   # the shipped default
    for tag, cand in [("dense_bf16_heads", build(513)),
                      ("dense_bf16_all", build(10 ** 9))]:
        cmp = scan_compare(cand, base, iters=60, repeats=3,
                           labels=(tag, "default"))
        rec = {"candidate_ms": cmp[f"{tag}_s"] * 1e3,
               "default_ms": cmp["default_s"] * 1e3,
               "speedup_vs_default": 1.0 / cmp["median_ratio_a_over_b"],
               "ratios": [1.0 / p["ratio_a_over_b"] for p in cmp["pairs"]]}
        out["sweep"][tag] = rec
        print(tag, json.dumps(rec), flush=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "exp_int8_dense_routing.json")
    with open(path, "w") as fp:
        json.dump(out, fp, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()

"""Experiment: execution routing of int8-inference convs (VERDICT r3 item
1a; round-5 form — the threshold is now a ``QuantConfig`` field).

Question: which convs of an int8 model should run on the int8 MXU path vs
the fake-quant float path (identical ap_fixed-grid semantics either way)?
The knob is ``QuantConfig.int8_conv_min_ch``: convs with FLOAT inputs and
``in_ch > threshold`` use int8 execution (int8-residency inputs have no
choice).

Method: build the int8 vgg11_me flagship at thresholds {64 (the current
default — adopted FROM this sweep), 4 (round-4's default: everything on
the int8 MXU), 128, ∞ (= convs never take the int8 MXU path)} and
scan_compare each against the default, DEVICE-side scan timing.

NOTE the round-4 version of this sweep monkeypatched a module function that
was restored before ``scan_compare`` re-traced the model, so all variants
timed the DEFAULT routing and its "within ~1%" finding was vacuous (ADVICE
r4 medium). This version bakes the threshold into the model's static config
so every trace — including scan_compare's own jit — uses the intended
routing. The checked-in JSON is from a re-run of THIS version.

Writes scripts/exp_int8_routing.json.
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


def build(threshold: int | None, det_pallas: bool = False):
    """int8 flagship step fn under a routing threshold (None = default)."""
    key = jax.random.key(0)
    x = jax.random.normal(key, (BATCH, 32, 32, 3))
    q = Q
    if threshold is not None:
        q = dataclasses.replace(q, int8_conv_min_ch=threshold)
    if det_pallas:
        q = dataclasses.replace(q, int8_det_pallas=True)
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
           "knob": "QuantConfig.int8_conv_min_ch", "sweep": {}}
    base = build(None)   # current default threshold (>64, from this sweep)
    cands = [(f"in_ch>{t}", build(t)) for t in (4, 128, 10 ** 9)]
    # deterministic residency convs on the Pallas int8 fused kernel
    # instead of XLA's int8 conv (QuantConfig.int8_det_pallas)
    cands.append(("det_pallas", build(None, det_pallas=True)))
    for tag, cand in cands:
        cmp = scan_compare(cand, base, iters=60, repeats=3,
                           labels=(tag, "default"))
        rec = {"candidate_ms": cmp[f"{tag}_s"] * 1e3,
               "default_ms": cmp["default_s"] * 1e3,
               "speedup_vs_default": 1.0 / cmp["median_ratio_a_over_b"],
               "ratios": [1.0 / p["ratio_a_over_b"] for p in cmp["pairs"]]}
        out["sweep"][tag] = rec
        print(tag, json.dumps(rec), flush=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "exp_int8_routing.json")
    with open(path, "w") as fp:
        json.dump(out, fp, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()

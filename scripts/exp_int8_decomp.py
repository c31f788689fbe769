"""Experiment 2: WHERE does the int8 vgg11_me model lose to bf16?

Paired (alternating) int8-vs-bf16 comparisons across model variants that
isolate components (VERDICT r3 item 1b — per-component attribution):

  1. vgg11 single-exit backbone+head       (no exit cascades)
  2. vgg11_me 5-exit flagship              (the failing config)
  3. vgg11_me with fused=False             (no Pallas head kernels)
  4. vgg11 backbone only via n_exits=1 + rate=0 (no Bayes sites at all)

Writes scripts/exp_int8_decomp.json.
"""

from __future__ import annotations

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bayestpu.core.config import BayesConfig, DropoutKind, QuantConfig, SamplingMode
from bayestpu.core.rng import BAYES_RNG
from bayestpu.engine import sampler
from bayestpu.nn.zoo import get_model
from bayestpu.utils.timing import paired_compare

Q = QuantConfig(total_bits=8, integer_bits=0, int8_infer=True)


def build(name, quant, fused=True, bayes=None, **kw):
    key = jax.random.key(0)
    x = jax.random.normal(key, (128, 32, 32, 3))
    bayes = bayes or BayesConfig(rate=0.25)
    model = get_model(name, bayes=bayes, fused=fused,
                      dtype=jnp.bfloat16, quant=quant, **kw)
    vs = jax.jit(lambda k, xb: model.init(
        {"params": k, BAYES_RNG: k}, xb))(key, x)

    @jax.jit
    def f(vs, xb, k):
        return jnp.sum(sampler.predictive(
            model, vs, xb, k, 10, SamplingMode.SPATIAL).probs)
    f(vs, x, key).block_until_ready()
    return functools.partial(f, vs, x, key)


def pair(tag, mk_a, mk_b, out, pairs=5):
    cmp = paired_compare(mk_a, mk_b, pairs=pairs, iters=16,
                         labels=("int8", "bf16"))
    rec = {"int8_ms": cmp["median_int8_s"] * 1e3,
           "bf16_ms": cmp["median_bf16_s"] * 1e3,
           "int8_speedup": 1.0 / cmp["median_ratio_a_over_b"],
           "ratios": [1.0 / p["ratio_a_over_b"] for p in cmp["pairs"]]}
    out[tag] = rec
    print(tag, json.dumps(rec), flush=True)


def main():
    out = {"device": str(jax.devices()[0])}
    none_b = BayesConfig(kind=DropoutKind.NONE)

    cases = {
        "vgg11_1exit": dict(name="vgg11", kw={}),
        "vgg11_me_5exit": dict(name="vgg11_me", kw={}),
        "vgg11_me_unfused": dict(name="vgg11_me", kw={}, fused=False),
        "vgg11_nobayes": dict(name="vgg11", kw={}, bayes=none_b),
    }
    for tag, c in cases.items():
        f_i8 = build(c["name"], Q, fused=c.get("fused", True),
                     bayes=c.get("bayes"), **c["kw"])
        f_bf = build(c["name"], None, fused=c.get("fused", True),
                     bayes=c.get("bayes"), **c["kw"])
        pair(tag, f_i8, f_bf, out)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "exp_int8_decomp.json")
    with open(path, "w") as fp:
        json.dump(out, fp, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()

"""Sweeps: cost vs number of Bayesian layers / masks / scale.

≙ the autobayes sweeps — ``diff_dropouts.py`` (n = 1..8 inserted MCD layers),
``diff_masksembles.py`` (n Masksembles layers), ``diff_scale.py`` (scale
sweep) — which built one HLS project per point and scraped latency/LUT
reports. Here each point compiles the MC-predictive executable and records
the TPU analogues: compile time, measured latency, XLA cost-model FLOPs /
bytes, and executable size (≙ LUT/FF). Results go to ``<out>/<sweep>.json``
and can be plotted with ``bayestpu.cli.figures``.

    python -m bayestpu.cli.sweep dropouts --max_n 8
    python -m bayestpu.cli.sweep masks    --max_n 8
    python -m bayestpu.cli.sweep scale    --values 1.5 2 3 4
    python -m bayestpu.cli.sweep samples  --model lenet --values 2 3 5 7 9

The ``samples`` sweep is the latency/resource experiment matrix of
``bayes_hw/scripts/lat_resource_eval/*`` (mc_samples ∈ {2,3,5,7,9} ×
spatial/temporal mapping × any zoo model).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp

from bayestpu.core.config import (
    BayesConfig,
    DropoutKind,
    EngineConfig,
    InsertStrategy,
    SamplingMode,
)
from bayestpu.engine.engine import BayesEngine
from bayestpu.nn.convert import Sequential, convert_to_bayesian, lenet_specs


_INPUTS = {"lenet": (28, 28, 1), "lenet_me": (28, 28, 1)}


def _model_point(name: str, bayes: BayesConfig, mode: SamplingMode,
                 batch: int, iters: int, fused: bool = False) -> dict:
    from bayestpu.nn.zoo import get_model
    model = get_model(name, bayes=bayes, fused=fused)
    x = jnp.zeros((batch,) + _INPUTS.get(name, (32, 32, 3)))
    eng = BayesEngine(model, bayes, EngineConfig(mode=mode)).init(
        jax.random.key(0), x)
    return _measure(eng, x, iters)


def _measure(eng: BayesEngine, x: jax.Array, iters: int) -> dict:
    t0 = time.perf_counter()
    eng.compile(x)
    compile_s = time.perf_counter() - t0
    bench = eng.benchmark(x, iters=iters)
    cost = eng.cost_analysis(x)
    return {
        "compile_s": compile_s,
        "latency_ms": bench["latency_s"] * 1e3,
        "samples_per_s": bench["samples_per_s"],
        "flops": cost.get("flops"),
        "bytes_accessed": cost.get("bytes_accessed"),
        "code_bytes": cost.get("generated_code_size_in_bytes"),
    }


def _point(bayes: BayesConfig, batch: int = 32, iters: int = 10,
           fused: bool = False) -> dict:
    specs = tuple(convert_to_bayesian(lenet_specs(), bayes))
    model = Sequential(specs=specs, fused=fused)
    x = jnp.zeros((batch, 28, 28, 1))
    eng = BayesEngine(model, bayes).init(jax.random.key(0), x)
    return _measure(eng, x, iters)


def main(argv=None) -> dict:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("sweep", choices=["dropouts", "masks", "scale", "samples"])
    p.add_argument("--max_n", type=int, default=4)
    p.add_argument("--values", type=float, nargs="*", default=None)
    p.add_argument("--mc_samples", type=int, default=4)
    p.add_argument("--model", default="lenet",
                   help="zoo model for the `samples` sweep")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--dropout_type", default="mc", choices=["mc", "mask"],
                   help="`samples` sweep: MC dropout or Masksembles "
                        "(≙ the mc_dropout/ vs mask_ensemble/ script trees)")
    p.add_argument("--modes", nargs="*", default=["spatial", "temporal"],
                   choices=["spatial", "temporal"],
                   help="`samples` sweep mappings (≙ Strategy "
                        "latency/resource)")
    p.add_argument("--fused", action="store_true",
                   help="lower (Bayes site -> conv/dense) pairs to the fused "
                        "Pallas masked kernels (the dropout-in-fabric "
                        "synthesis the reference sweeps measure)")
    p.add_argument("--out", default="sweeps")
    a = p.parse_args(argv)

    rows = []
    if a.sweep == "dropouts":
        # diff_dropouts.py: n=1..max inserted MCD layers, strategy counts
        # from the back (ap_fixed<8,8> there; float here — quant sweeps are
        # a separate axis)
        for n in range(1, a.max_n + 1):
            cfg = BayesConfig(kind=DropoutKind.MC, rate=0.25,
                              num_bayes_layers=n, num_samples=a.mc_samples,
                              strategy=InsertStrategy.FULL if n > 4
                              else InsertStrategy.DEFAULT)
            rows.append({"n_bayes_layers": n, **_point(cfg, fused=a.fused)})
    elif a.sweep == "masks":
        for n in range(2, a.max_n + 1):
            cfg = BayesConfig(kind=DropoutKind.MASK, num_masks=n, scale=2.0,
                              num_bayes_layers=1)
            rows.append({"num_masks": n, **_point(cfg, fused=a.fused)})
    elif a.sweep == "scale":
        values = a.values or [1.5, 2.0, 3.0, 4.0]
        for s in values:
            cfg = BayesConfig(kind=DropoutKind.MASK, num_masks=4, scale=s,
                              num_bayes_layers=1)
            rows.append({"scale": s, **_point(cfg, fused=a.fused)})
    else:  # samples — lat_resource_eval matrix (mc|mask × mapping × model)
        values = [int(v) for v in (a.values or [2, 3, 5, 7, 9])]
        for s in values:
            if a.dropout_type == "mask":
                # mask_ensemble scripts sweep the #masks (= #samples)
                cfg = BayesConfig(kind=DropoutKind.MASK, num_masks=s,
                                  scale=2.0, num_samples=s)
            else:
                cfg = BayesConfig(kind=DropoutKind.MC, rate=0.25,
                                  num_samples=s)
            for mode in (SamplingMode(m) for m in a.modes):
                rows.append({"mc_samples": s, "mode": mode.value,
                             **_model_point(a.model, cfg, mode, a.batch,
                                            iters=10, fused=a.fused)})

    os.makedirs(a.out, exist_ok=True)
    path = os.path.join(a.out, f"{a.sweep}.json")
    out = {"sweep": a.sweep, "device": str(jax.devices()[0]), "rows": rows}
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()

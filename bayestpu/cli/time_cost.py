"""Conversion/compile-time benchmark — ≙ ``Hardware_Artifact/autobayes/
time_cost.py`` (100-loop timeit of Keras→BNN conversion and hls compile).

Times (a) spec conversion NN→BNN, (b) model init, (c) XLA jit compile of the
MC predictive — the analogue of hls4ml codegen + g++ csim build — and writes
``timing/<net>.txt`` in the reference's format.
"""

from __future__ import annotations

import argparse
import json
import os
import timeit

import jax
import jax.numpy as jnp

from bayestpu.core.config import BayesConfig, DropoutKind, InsertStrategy
from bayestpu.engine.engine import BayesEngine
from bayestpu.nn.convert import Sequential, convert_to_bayesian, lenet_specs


def main(argv=None) -> dict:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("net", nargs="?", default="LeNet")
    p.add_argument("--loops", type=int, default=100)
    p.add_argument("--out_dir", default="timing")
    a = p.parse_args(argv)

    specs = lenet_specs()
    bayes = BayesConfig(kind=DropoutKind.MC, rate=0.25,
                        strategy=InsertStrategy.FULL, num_samples=4)

    t_convert = timeit.timeit(
        lambda: convert_to_bayesian(specs, bayes), number=a.loops) / a.loops

    converted = tuple(convert_to_bayesian(specs, bayes))
    x = jnp.zeros((1, 28, 28, 1))

    def build_and_compile():
        model = Sequential(specs=converted)
        eng = BayesEngine(model, bayes).init(jax.random.key(0), x)
        eng.compile(x)

    n_compile = max(a.loops // 20, 1)  # jit compile is the slow leg
    t_compile = timeit.timeit(build_and_compile, number=n_compile) / n_compile

    os.makedirs(a.out_dir, exist_ok=True)
    path = os.path.join(a.out_dir, f"{a.net}.txt")
    with open(path, "w") as f:
        f.write(f"Conversion time of {a.net}: {t_convert}\n")
        f.write(f"Compile time of {a.net}: {t_compile}\n")
    out = {"net": a.net, "convert_s": t_convert, "compile_s": t_compile,
           "file": path}
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()

"""Sanity example — ≙ ``Hardware_Artifact/bayes_hw/official_example.py``.

The reference's known-good baseline flow: load a trained LeNet, build the
stock (non-Bayesian) accelerator at ``ap_fixed<16,6>`` with the Resource
strategy, compile the csim library, and print Keras vs HLS accuracy side by
side on 2000 MNIST test images (``official_example.py:27-82``).

TPU analogue, end to end on one chip (or CPU):

1. train a plain LeNet briefly on MNIST (synthetic fallback offline),
2. AOT-compile the float executable and the ``ap_fixed<16,6>``-equivalent
   fake-quant executable (the reference's operating point, ``:27``),
3. print float vs quantized accuracy side by side + the XLA cost report
   (the analogue of the Vivado resource/latency estimates).

Run:  python examples/official_example.py [--epochs 2] [--eval_images 2000]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

# runnable from a source checkout without installing the package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bayestpu.core.config import BayesConfig, DropoutKind, EngineConfig, QuantConfig
from bayestpu.data.datasets import get_dataset, iterate_batches, train_val_split
from bayestpu.engine.engine import BayesEngine
from bayestpu.nn.zoo import get_model
from bayestpu.train.loop import create_state, train_loop
from bayestpu.train.optim import get_optimizer, get_recipe


def main(argv=None) -> dict:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--eval_images", type=int, default=2000)
    p.add_argument("--data_dir", default=None)
    a = p.parse_args(argv)

    key = jax.random.key(0)
    ds = get_dataset("mnist", a.data_dir)
    ds, x_val, y_val = train_val_split(ds, 0.1, seed=0)
    recipe = get_recipe("lenet", epochs=a.epochs)
    steps = max(len(ds.x_train) // recipe.batch_size, 1)

    # a plain (non-Bayesian) LeNet — the official example uses the stock flow
    model = get_model("lenet", bayes=BayesConfig(kind=DropoutKind.NONE))
    tx = get_optimizer(recipe, steps)
    state = create_state(model, tx, key,
                         jnp.asarray(ds.x_train[:recipe.batch_size]))
    state = train_loop(
        model, state, tx,
        lambda: iterate_batches(ds.x_train, ds.y_train, recipe.batch_size,
                                seed=0),
        key, recipe.epochs,
        val_batches=lambda: iterate_batches(x_val, y_val,
                                            recipe.test_batch_size,
                                            shuffle=False))

    x = jnp.asarray(ds.x_test[:a.eval_images])
    y = np.asarray(ds.y_test[:a.eval_images])
    bayes = BayesConfig(kind=DropoutKind.NONE, num_samples=1)
    out = {}
    for label, quant in (
            ("float", None),
            # ap_fixed<16,6>: 16 total bits, 6 integer bits (:27)
            ("ap_fixed<16,6>", QuantConfig(total_bits=16, integer_bits=6))):
        # same trained params, re-lowered at the quantized operating point
        qmodel = get_model("lenet", bayes=BayesConfig(kind=DropoutKind.NONE),
                           quant=quant)
        eng = BayesEngine(qmodel, bayes, EngineConfig()).attach(
            state.variables())
        eng.compile(x)
        probs = np.asarray(eng.predict(x).probs[-1])
        acc = float((probs.argmax(-1) == y).mean())
        cost = eng.cost_analysis(x)
        out[label] = {"acc": acc, "flops": cost.get("flops"),
                      "code_bytes": cost.get("generated_code_size_in_bytes")}
        print(f"Accuracy {label}: {acc}")
    print(json.dumps(out, indent=2, default=str))
    return out


if __name__ == "__main__":
    main()

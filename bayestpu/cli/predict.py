"""Prediction/verification CLI — ≙ ``Hardware_Artifact/bayes_hw/hls4ml_pred.py``.

Loads a checkpoint, runs MC (or per-mask) predictive inference, and prints
accuracy, ECE and aPE (on dataset-matched gaussian noise) side by side for
the temporal and spatial mappings — the acceptance test of the flow
(``hls4ml_pred.py:89-119`` prints Keras-vs-HLS; here the golden pair is
unfused-vs-fused / temporal-vs-spatial).
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp

from bayestpu.cli import common
from bayestpu.core.config import EngineConfig, SamplingMode
from bayestpu.data.datasets import get_dataset
from bayestpu.engine.engine import BayesEngine
from bayestpu.core.rng import BAYES_RNG
from bayestpu.train.checkpoint import restore_variables


def main(argv=None) -> dict:
    p = argparse.ArgumentParser(description=__doc__)
    common.add_model_args(p)
    p.add_argument("--load_model", required=True,
                   help="checkpoint dir from bayestpu.cli.train")
    p.add_argument("--eval_images", type=int, default=200,
                   help="≙ hls4ml_pred.py --eval_imgs default 200")
    p.add_argument("--passes", type=int, default=1,
                   help=">1 repeats the evaluation with fresh keys and "
                        "reports mean±std (≙ evaluate.py:12-18)")
    p.add_argument("--log", default=None,
                   help="write a log_<id>.txt-style metric dump here")
    a = p.parse_args(argv)

    key = jax.random.key(a.seed)
    ds = get_dataset(a.dataset, a.data_dir)
    model = common.build_model(a)

    template = jax.jit(lambda k, x: model.init(
        {"params": k, BAYES_RNG: k}, x))(key, jnp.asarray(ds.x_test[:8]))
    variables = restore_variables(a.load_model, template)

    x = jnp.asarray(ds.x_test[:a.eval_images])
    y = jnp.asarray(ds.y_test[:a.eval_images])
    bayes = common.bayes_from_args(a)

    out = {}
    for mode in (SamplingMode.TEMPORAL, SamplingMode.SPATIAL):
        eng = BayesEngine(model, bayes, EngineConfig(mode=mode)).attach(
            variables)
        if a.passes > 1:
            out[mode.value] = eng.evaluate_repeated(
                x, y, passes=a.passes, key=key,
                log_path=(f"{a.log}.{mode.value}" if a.log else None))
        else:
            out[mode.value] = eng.evaluate(x, y, ood_check=True)
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main()

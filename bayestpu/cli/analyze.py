"""Analysis CLI — ≙ the ``results_analyzer.py`` __main__ (``:736-789``).

Loads a checkpoint and runs the FullAnalysis battery: per-exit +
exit-ensemble acc/ECE(KDE+hist)/NLL/MSE, overthinking counts, the
confidence-threshold early-exit sweep with FLOPs accounting, and (optional)
the 1..49 multipass sweep. Writes the reference's artifact set into --out.
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp

from bayestpu.cli import common
from bayestpu.data.datasets import get_dataset
from bayestpu.core.rng import BAYES_RNG
from bayestpu.metrics.analysis import FullAnalysis
from bayestpu.train.checkpoint import restore_variables


def main(argv=None) -> dict:
    p = argparse.ArgumentParser(description=__doc__)
    common.add_model_args(p)
    p.add_argument("--load_model", required=True)
    p.add_argument("--out", default="analysis_out")
    p.add_argument("--eval_images", type=int, default=1000)
    p.add_argument("--multipass", action="store_true",
                   help="run the 1..49 MC-pass sweep (slow)")
    p.add_argument("--model_type", default=None,
                   choices=[None, "vgg19", "resnet18"],
                   help="FLOPs table for the early-exit sweep")
    p.add_argument("--experiment_id", default="0")
    a = p.parse_args(argv)

    key = jax.random.key(a.seed)
    ds = get_dataset(a.dataset, a.data_dir)
    model = common.build_model(a)
    template = jax.jit(lambda k, x: model.init(
        {"params": k, BAYES_RNG: k}, x))(key, jnp.asarray(ds.x_test[:8]))
    variables = restore_variables(a.load_model, template)

    fa = FullAnalysis(model, variables,
                      ds.x_test[:a.eval_images], ds.y_test[:a.eval_images],
                      mc_passes=a.mc_samples, model_type=a.model_type)
    summary = fa.save(a.out, a.experiment_id)
    # validation artifact (≙ save_validation, results_analyzer.py:218-223)
    from bayestpu.data.datasets import train_val_split
    _, x_val, y_val = train_val_split(ds, 0.1, a.seed)
    summary["validation_npy"] = fa.save_validation(
        a.out, x_val[:a.eval_images], y_val[:a.eval_images],
        a.experiment_id)
    summary["early_exit"] = fa.confidence_exiting_table()
    if a.multipass:
        summary["multipass"] = fa.multipass_experiment()
    print(json.dumps(summary, indent=2, default=float))
    return summary


if __name__ == "__main__":
    main()

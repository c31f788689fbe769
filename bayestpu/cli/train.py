"""Training CLI — ≙ ``Hardware_Artifact/bayes_hw/train_qkeras_mcme.py`` and
the sacred pipeline of ``Software_Artifact/software/main.py``.

Trains a (multi-exit) Bayesian model with the EED loss, early stopping on
validation accuracy, then saves a full checkpoint and prints the evaluation
battery. Example (≙ ``scripts/train_pred_eval/train_pred_mnist_lenet_mcme.sh``):

    python -m bayestpu.cli.train --model lenet_me --dataset mnist \
        --dropout_type mc --mc_samples 5 --epochs 5 --quant_tbit 8
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp

from bayestpu.cli import common
from bayestpu.data.augment import random_crop_flip
from bayestpu.data.datasets import get_dataset, iterate_batches, train_val_split
from bayestpu.engine.engine import BayesEngine
from bayestpu.train.checkpoint import save_checkpoint
from bayestpu.train.loop import create_state, train_loop
from bayestpu.train.losses import EEDConfig
from bayestpu.train.optim import get_optimizer, get_recipe


def main(argv=None) -> dict:
    p = argparse.ArgumentParser(description=__doc__)
    common.add_model_args(p)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--loss_output", default="MSE", choices=["MSE", "KL"])
    p.add_argument("--no_eed", action="store_true")
    p.add_argument("--accum_steps", type=int, default=1,
                   help="gradient accumulation (train_base.py:28-34)")
    p.add_argument("--val_mode", default="acc", choices=["acc", "eed", "ce"],
                   help="early-stop metric (train_utils.py:40-65)")
    p.add_argument("--augment", action="store_true")
    p.add_argument("--pipeline", default="device", choices=["device", "host"],
                   help="augment on-device (jit-fused random_crop_flip) or "
                        "host-native (C++ fused gather+crop+flip, "
                        "bayestpu/native/data_pipeline.cc)")
    p.add_argument("--val_fraction", type=float, default=0.1)
    p.add_argument("--out", default="snapshots/run")
    p.add_argument("--resume", action="store_true",
                   help="resume from <out>_last (full state: params + opt "
                        "+ PRNG key + step); continues bit-identically")
    p.add_argument("--checkpoint_every", type=int, default=1,
                   help="rolling <out>_last checkpoint every N epochs "
                        "(0 = off)")
    p.add_argument("--runs_db", default=None,
                   help="record config/stdout/metrics under this runs_db "
                        "dir (≙ sacred FileStorageObserver, main.py:10-13); "
                        "omit to disable")
    a = p.parse_args(argv)

    key = jax.random.key(a.seed)
    ds = get_dataset(a.dataset, a.data_dir)
    overrides = {k: v for k, v in
                 {"epochs": a.epochs, "batch_size": a.batch_size,
                  "lr": a.lr,
                  "accum_steps": a.accum_steps if a.accum_steps > 1 else None,
                  }.items() if v is not None}
    recipe = get_recipe(a.model.split("_")[0], **overrides)
    ds, x_val, y_val = train_val_split(ds, a.val_fraction, a.seed)
    steps = max(len(ds.x_train) // recipe.batch_size, 1)

    model = common.build_model(a)
    tx = get_optimizer(recipe, steps)
    state = create_state(
        model, tx, key,
        jnp.asarray(ds.x_train[:recipe.batch_size]))

    start_epoch, best0 = 0, None
    # sibling of the final checkpoint (orbax save(force=True) to a.out
    # would delete anything nested inside it)
    resume_path = a.out.rstrip("/") + "_last"
    if a.resume:
        if not os.path.isdir(resume_path):
            raise FileNotFoundError(
                f"--resume: no checkpoint at {resume_path}")
        from bayestpu.train.checkpoint import restore_checkpoint
        state, key, aux = restore_checkpoint(resume_path, state, key,
                                             with_aux=True)
        start_epoch = int(aux["epoch"]) + 1
        best0 = (float(aux["best_metric"]), aux["best_params"],
                 int(aux["since_best"]))
        print(f"resumed from {resume_path}: step {state.step} "
              f"(epoch {start_epoch})")

    if a.pipeline == "host":
        from bayestpu.data.pipeline import BatchPipeline
        pipe = BatchPipeline(ds.x_train, ds.y_train, recipe.batch_size,
                             pad=4 if a.augment else 0, train=True,
                             seed=a.seed)
        pipe.seek(start_epoch)  # resumed runs replay the right shuffles
        augment_fn = None  # host pipeline already augments

        def train_batches():
            return iter(pipe)
    else:
        # device path: raw numpy batches; augmentation runs INSIDE the
        # epoch scan (train_loop augment_fn) so the whole epoch is one
        # dispatch
        augment_fn = ((lambda k, x, i: random_crop_flip(k, x, 4, i))
                      if a.augment else None)

        def train_batches():
            # consumed once: train_loop caches the stacked arrays on device
            # and reshuffles there each epoch (reshuffle=True below)
            return iterate_batches(ds.x_train, ds.y_train,
                                   recipe.batch_size, seed=a.seed)

    def val_batches():
        return iterate_batches(x_val, y_val, recipe.test_batch_size,
                               shuffle=False)

    has_bn = "batch_stats" in state.extra
    run = None
    if a.runs_db:
        from bayestpu.utils.rundb import Run
        run = Run(a.runs_db, config=vars(a), name=common.run_suffix(a))

    def log_fn(msg: str) -> None:
        print(msg)
        if run is not None:
            run.log_text(msg)

    mesh = None
    if a.opt_mode == "sharded" and len(jax.devices()) > 1:
        from bayestpu.engine import sharding as _sh
        mesh = _sh.make_mesh(len(jax.devices()), 1)
        log_fn(f"data-parallel training over {mesh}")

    history: dict = {}
    state = train_loop(
        model, state, tx, train_batches, key, recipe.epochs,
        val_batches=val_batches,
        eed_cfg=EEDConfig(use_eed=not a.no_eed, loss_output=a.loss_output),
        patience=recipe.patience, has_batch_stats=has_bn,
        val_mode=a.val_mode, augment_fn=augment_fn, mesh=mesh,
        checkpoint_dir=resume_path, checkpoint_every=a.checkpoint_every,
        start_epoch=start_epoch, best0=best0,
        plateau_factor=(recipe.plateau_factor
                        if recipe.scheduler == "plateau" else None),
        plateau_patience=recipe.plateau_patience,
        reshuffle=(a.pipeline == "device"), history=history, log_fn=log_fn)

    if a.quant_tbit > 0 and "batch_stats" in state.extra:
        # QAT: re-estimate BN running stats with frozen params before the
        # checkpoint/eval (train.loop.bn_reestimate docstring has the why)
        from bayestpu.train.loop import bn_reestimate
        bs_train = recipe.batch_size
        n_full = (len(ds.x_train) // bs_train) * bs_train
        xs_re = jnp.asarray(ds.x_train[:n_full]).reshape(
            (-1, bs_train) + ds.x_train.shape[1:])
        state.extra = {**state.extra, "batch_stats": bn_reestimate(
            model, state.params, state.extra["batch_stats"], xs_re, key)}
        log_fn("BN running stats re-estimated (QAT)")

    ckpt = save_checkpoint(a.out, state, key)
    loss_fig = None
    if history.get("train_loss"):
        from bayestpu.cli.figures import loss_curve
        loss_fig = loss_curve(history["train_loss"],
                              history.get("val_metric", []),
                              a.out.rstrip("/") + "_loss_curve.png")
    eng = BayesEngine(model, common.bayes_from_args(a),
                      common.engine_from_args(a)).attach(state.variables())
    from bayestpu.metrics.entropy import NOISE_STATS
    mets = eng.evaluate(jnp.asarray(ds.x_test[:1000]),
                        jnp.asarray(ds.y_test[:1000]), ood_check=True,
                        dataset=(a.dataset if a.dataset in NOISE_STATS
                                 else None))
    result = {"checkpoint": ckpt, "synthetic": ds.meta["synthetic"], **mets}
    if run is not None:
        run.log_metrics(state.step, **{k: v for k, v in mets.items()
                                       if isinstance(v, float)})
        run.log_text(json.dumps(result))
        run.close()
        result["run_id"] = run.run_id
    print(json.dumps(result, indent=2))
    return result


if __name__ == "__main__":
    main()

"""Golden-model verification CLI.

≙ ``Hardware_Artifact/autobayes/verify_accuracy.py`` (Keras vs HLS-csim
accuracy per mask index and mask-averaged) and
``autobayes/verify_masksembles.py`` (converter-produced vs hand-built
Masksembles equivalence). The golden pair here is the **unfused** XLA path
(the readable reference implementation) vs the **fused Pallas** engine path
— compared per ``mask_index`` (``predict(x, mask_index=i)`` semantics,
``verify_accuracy.py:88-92``) and on the mask-averaged prediction.

    python -m bayestpu.cli.verify_accuracy --epochs 1
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np
import optax

from bayestpu.core.config import BayesConfig, DropoutKind
from bayestpu.core.rng import BAYES_RNG
from bayestpu.data.datasets import get_dataset, iterate_batches
from bayestpu.metrics.ece import accuracy
from bayestpu.nn.zoo import get_model
from bayestpu.train.loop import create_state, make_train_step


def main(argv=None) -> dict:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", default="mnist")
    p.add_argument("--data_dir", default=None)
    p.add_argument("--num_masks", type=int, default=4)
    p.add_argument("--scale", type=float, default=2.0)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--eval_images", type=int, default=512)
    a = p.parse_args(argv)

    key = jax.random.key(0)
    ds = get_dataset(a.dataset, a.data_dir)
    bayes = BayesConfig(kind=DropoutKind.MASK, num_masks=a.num_masks,
                        scale=a.scale)

    # Train once with the golden (unfused) model; both models share params.
    golden = get_model("lenet", bayes=bayes, fused=False)
    fused = get_model("lenet", bayes=bayes, fused=True)
    tx = optax.adam(1e-3)
    state = create_state(golden, tx, key, jnp.asarray(ds.x_train[:64]))
    step = make_train_step(golden, tx)
    for _ in range(a.epochs):
        for x, y in iterate_batches(ds.x_train, ds.y_train, 64):
            state.params, state.extra, state.opt_state, _ = step(
                state.params, state.extra, state.opt_state,
                jnp.asarray(x), jnp.asarray(y),
                jax.random.fold_in(key, state.step))
            state.step += 1

    x = jnp.asarray(ds.x_test[:a.eval_images])
    y = jnp.asarray(ds.y_test[:a.eval_images])
    variables = state.variables()

    report: dict = {"per_mask": []}
    g_sum = f_sum = None
    for i in range(a.num_masks):
        pg = jax.nn.softmax(golden.apply(
            variables, x, sample_idx=i, rngs={BAYES_RNG: key}).logits[-1])
        pf = jax.nn.softmax(fused.apply(
            variables, x, sample_idx=i, rngs={BAYES_RNG: key}).logits[-1])
        report["per_mask"].append({
            "mask_index": i,
            "acc_golden": float(accuracy(pg, y)),
            "acc_fused": float(accuracy(pf, y)),
            "max_abs_diff": float(jnp.abs(pg - pf).max()),
        })
        g_sum = pg if g_sum is None else g_sum + pg
        f_sum = pf if f_sum is None else f_sum + pf

    report["averaged"] = {
        "acc_golden": float(accuracy(g_sum / a.num_masks, y)),
        "acc_fused": float(accuracy(f_sum / a.num_masks, y)),
        "max_abs_diff": float(jnp.abs(g_sum - f_sum).max() / a.num_masks),
    }
    worst = max(r["max_abs_diff"] for r in report["per_mask"])
    report["pass"] = bool(worst < 1e-3 and
                          abs(report["averaged"]["acc_golden"]
                              - report["averaged"]["acc_fused"]) < 1e-6)
    print(json.dumps(report, indent=2))
    if not report["pass"]:
        raise SystemExit(1)
    return report


if __name__ == "__main__":
    main()

"""Multi-exit output protocol and exit-ensembling.

The reference's multi-exit nets emit a list of per-exit logits with the final
exit last — ``[out1, out2, out3, out]`` in
``Software_Artifact/software/models/resnet18/resnet18.py:144-180`` — plus an
``intermediary_output_list`` carrying features for distillation. Here that is
a typed, pytree-compatible structure: exits are stacked on a leading axis
when shapes agree (they always do for classification heads), so per-exit
reductions are single XLA ops instead of Python loops.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ExitOutputs(NamedTuple):
    """Outputs of a multi-exit forward pass.

    logits:   (num_exits, batch, classes) — exit 0 is the earliest, exit -1
              the final head (reference order).
    features: (num_exits, batch, feat) or () — pre-logit features for
              feature distillation (``loss_functions.py:60-68``); empty tuple
              when the model does not expose them.
    """

    logits: jax.Array
    features: jax.Array | tuple = ()

    @property
    def num_exits(self) -> int:
        return self.logits.shape[0]

    @property
    def final(self) -> jax.Array:
        return self.logits[-1]


def stack_exits(exit_list: list[jax.Array],
                feature_list: list[jax.Array] | None = None) -> ExitOutputs:
    feats = jnp.stack(feature_list) if feature_list else ()
    return ExitOutputs(logits=jnp.stack(exit_list), features=feats)


def exit_ensemble_probs(logits: jax.Array) -> jax.Array:
    """Cumulative softmax-ensemble across exits.

    ``ens[k] = mean(softmax(logits[0..k]))`` — the running ensemble the
    reference maintains per-exit (``Software_Artifact/software/train/loss/
    base_classes.py:54-58`` and ``results_analyzer.py:163-165``).

    Returns (num_exits, batch, classes); row k is the ensemble of exits 0..k.
    """
    probs = jax.nn.softmax(logits, axis=-1)
    csum = jnp.cumsum(probs, axis=0)
    denom = jnp.arange(1, logits.shape[0] + 1, dtype=probs.dtype)
    return csum / denom[:, None, None]


def ensemble_logit_mean(logits: jax.Array) -> jax.Array:
    """Mean of exit logits — the EED distillation target
    (``loss_functions.py:31``: ``(sum(middle_outputs)+output)/n``)."""
    return jnp.mean(logits, axis=0)

"""Multi-exit training losses: Exit-Ensemble Distillation (EED) and metrics.

Re-implements the semantics of
``Software_Artifact/software/train/loss/loss_functions.py`` (class
``ExitEnsembleDistillation``, itself derived from Lee et al.'s
exit-ensemble-distillation training) and the per-exit accuracy machinery of
``loss/base_classes.py`` as pure JAX functions over stacked exit logits
(E, B, C):

- classification term: CE on EVERY exit incl. the final one
  (``loss_functions.py:20-27``);
- distillation target: stop-gradient mean of all exit logits when
  ``use_eed`` (``:31``), else the final exit's logits (``:35``);
- output distillation: MSE between each exit's logits and the target
  (``:48-57``) or KL at temperature T with the 0.1·T² weighting (``:39-46``);
- optional feature distillation with the ReLU-support mask (``:85-87``).

Single-exit models degenerate to plain CE, mirroring ``:22-23``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from bayestpu.nn.multiexit import exit_ensemble_probs


@dataclasses.dataclass(frozen=True)
class EEDConfig:
    use_eed: bool = True
    loss_output: str = "MSE"         # "MSE" | "KL"
    use_feature_dist: bool = False
    temperature: float = 3.0


def _ce(logits: jax.Array, labels: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


def eed_loss(exit_logits: jax.Array, labels: jax.Array,
             features: jax.Array | None = None,
             cfg: EEDConfig = EEDConfig()) -> jax.Array:
    """EED training loss.

    exit_logits: (E, B, C), exit -1 is the final head (framework order);
    labels: (B,) int class ids; features: optional (E, B, F) for feature
    distillation.
    """
    n_exits = exit_logits.shape[0]
    l_c = jnp.sum(jax.vmap(_ce, in_axes=(0, None))(exit_logits, labels))
    if n_exits == 1:
        return l_c

    final = exit_logits[-1]
    middles = exit_logits[:-1]
    if cfg.use_eed:
        target = jax.lax.stop_gradient(jnp.mean(exit_logits, axis=0))
    else:
        target = jax.lax.stop_gradient(final)

    if cfg.loss_output == "MSE":
        mse = jax.vmap(lambda m: jnp.mean((m - target) ** 2))(middles)
        l_o = jnp.sum(mse)
        if cfg.use_eed:
            l_o = l_o + jnp.mean((final - target) ** 2)
    elif cfg.loss_output == "KL":
        t = cfg.temperature
        soft_target = jax.nn.softmax(target / t, axis=-1)

        def kd(logits: jax.Array) -> jax.Array:
            logp = jax.nn.log_softmax(logits / t, axis=-1)
            return -jnp.mean(jnp.sum(logp * soft_target, axis=-1))

        l_o = 0.1 * jnp.sum(jax.vmap(kd)(middles)) * t * t
        if cfg.use_eed:
            l_o = l_o + 0.1 * kd(final) * t * t
    else:
        raise ValueError(f"unknown loss_output {cfg.loss_output!r}")

    total = l_c + l_o

    if cfg.use_feature_dist and features is not None and features.shape[0] > 1:
        f_final = features[-1]
        f_target = jax.lax.stop_gradient(jnp.mean(features, axis=0))

        def fdist(f: jax.Array) -> jax.Array:
            support = ((f > 0) | (f_target > 0)).astype(f.dtype)
            return jnp.mean(jnp.abs((f - f_target) ** 2 * support))

        l_f = jnp.sum(jax.vmap(fdist)(features[:-1]))
        if cfg.use_eed:
            l_f = l_f + fdist(f_final)
        total = total + l_f
    return total


def topk_correct(logits: jax.Array, labels: jax.Array, k: int = 1
                 ) -> jax.Array:
    """Fraction of rows whose label is in the top-k predictions (≙
    ``multiclass_accuracies``, ``loss/loss_utils.py:3-22``)."""
    _, idx = jax.lax.top_k(logits, k)
    hit = jnp.any(idx == labels[:, None], axis=-1)
    return jnp.mean(hit.astype(jnp.float32))


def multi_exit_accuracy(exit_logits: jax.Array, labels: jax.Array,
                        tops: tuple[int, ...] = (1,)) -> dict[str, jax.Array]:
    """Per-exit top-k accuracies plus the cumulative exit-ensemble accuracy
    (``base_classes.py:39-66``: running softmax-ensemble across exits)."""
    out: dict[str, jax.Array] = {}
    n_exits = exit_logits.shape[0]
    for k in tops:
        accs = jax.vmap(topk_correct, in_axes=(0, None, None))(
            exit_logits, labels, k)
        for e in range(n_exits):
            out[f"exit{e}_top{k}"] = accs[e]
    ens = exit_ensemble_probs(exit_logits)  # (E, B, C) cumulative
    for e in range(n_exits):
        out[f"ens{e}_top1"] = topk_correct(ens[e], labels, 1)
    out["avg_maxprob"] = jnp.mean(jnp.max(
        jax.nn.softmax(exit_logits[-1], axis=-1), axis=-1))
    return out

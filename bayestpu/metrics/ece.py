"""Calibration metrics on device: ECE (adaptive + equal-width), NLL, MSE, acc.

Re-implements the reference's metric battery with XLA-friendly numerics:

- ``ece_hist`` ≙ ``ece_hist_binary`` (``Software_Artifact/software/train/
  results_analyzer.py:446-495``): top-1 confidence vs correctness with
  **equal-mass** bins (boundaries at sorted-confidence quantiles), default
  15 bins, L1 gap weighting.
- ``ece_equal_width`` ≙ the HW side's
  ``tfp.stats.expected_calibration_error`` with 10 equal-width bins
  (``Hardware_Artifact/bayes_hw/hls4ml_pred.py:90-91,115-116``).
- ``ece_bins``/``ece_from_bins`` — the distributed decomposition: per-bin
  (count, conf-sum, acc-sum) partial sums are psum-able across a mesh, then
  finalized (SURVEY §5.8: "histogram bins are trivially all-reducible").
- ``eval_metrics`` ≙ ``ece_eval_binary`` (``results_analyzer.py:497-505``)
  minus the KDE term (the KDE ECE is a host-side finalizer in
  ``bayestpu.metrics.kde``).

All take probabilities (post-MC-mean) of shape (B, C) and integer labels
(B,); one-hot labels can be converted with ``labels.argmax(-1)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def accuracy(probs: jax.Array, labels: jax.Array) -> jax.Array:
    return jnp.mean((jnp.argmax(probs, axis=-1) == labels).astype(jnp.float32))


def nll(probs: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean negative log-likelihood (``results_analyzer.py:501``:
    ``-sum(label*log(p))/N``)."""
    p = jnp.clip(probs, _EPS, 1.0)
    ll = jnp.take_along_axis(jnp.log(p), labels[:, None], axis=-1)[:, 0]
    return -jnp.mean(ll)


def brier_mse(probs: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean squared error against one-hot labels (``results_analyzer.py:499``)."""
    onehot = jax.nn.one_hot(labels, probs.shape[-1], dtype=probs.dtype)
    return jnp.mean(jnp.sum((probs - onehot) ** 2, axis=-1))


def _confidence_correct(probs: jax.Array, labels: jax.Array
                        ) -> tuple[jax.Array, jax.Array]:
    pred = jnp.argmax(probs, axis=-1)
    conf = jnp.take_along_axis(probs, pred[:, None], axis=-1)[:, 0]
    conf = conf / jnp.clip(jnp.sum(probs, axis=-1), _EPS, None)  # renormalize
    correct = (pred == labels).astype(jnp.float32)
    return conf, correct


def ece_hist(probs: jax.Array, labels: jax.Array, n_bins: int = 15,
             order: int = 1) -> jax.Array:
    """Adaptive (equal-mass) binned ECE, matching ``ece_hist_binary``.

    Bin boundaries sit at every ``len/n_bins``-th sorted confidence; bins are
    half-open on the left ``(lo, hi]`` with the first reaching down to 0 —
    exactly the reference's ``gt(lower) * le(upper)`` membership.
    """
    conf, correct = _confidence_correct(probs, labels)
    n = conf.shape[0]
    x = jnp.sort(conf)
    bin_count = n // n_bins
    idx = jnp.minimum((jnp.arange(1, n_bins + 1)) * bin_count, n - 1)
    uppers = x[idx].at[-1].set(1.0)
    lowers = jnp.concatenate([jnp.zeros((1,), conf.dtype), uppers[:-1]])

    in_bin = (conf[None, :] > lowers[:, None]) & (conf[None, :] <= uppers[:, None])
    in_bin = in_bin.astype(jnp.float32)                       # (n_bins, N)
    cnt = jnp.sum(in_bin, axis=1)
    prop = cnt / n
    mean_conf = jnp.sum(in_bin * conf[None, :], axis=1) / jnp.clip(cnt, 1.0)
    mean_acc = jnp.sum(in_bin * correct[None, :], axis=1) / jnp.clip(cnt, 1.0)
    gap = jnp.abs(mean_conf - mean_acc) ** order
    return jnp.sum(jnp.where(cnt > 0, gap * prop, 0.0))


def ece_bins(probs: jax.Array, labels: jax.Array, n_bins: int = 10
             ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Equal-width per-bin partial sums (count, conf_sum, acc_sum).

    These are linear in the data → ``jax.lax.psum`` them over data/sample
    shards, then call ``ece_from_bins``. This is the framework's distributed
    ECE reduction (SURVEY §5.8).
    """
    conf, correct = _confidence_correct(probs, labels)
    # bin i covers (i/n, (i+1)/n]; conf==0 lands in bin 0 (as tfp does).
    bin_idx = jnp.clip(jnp.ceil(conf * n_bins).astype(jnp.int32) - 1, 0,
                       n_bins - 1)
    onehot = jax.nn.one_hot(bin_idx, n_bins, dtype=jnp.float32)  # (N, n_bins)
    cnt = jnp.sum(onehot, axis=0)
    conf_sum = onehot.T @ conf
    acc_sum = onehot.T @ correct
    return cnt, conf_sum, acc_sum


def ece_from_bins(cnt: jax.Array, conf_sum: jax.Array, acc_sum: jax.Array
                  ) -> jax.Array:
    n = jnp.sum(cnt)
    mean_conf = conf_sum / jnp.clip(cnt, 1.0)
    mean_acc = acc_sum / jnp.clip(cnt, 1.0)
    gap = jnp.abs(mean_conf - mean_acc)
    return jnp.sum(jnp.where(cnt > 0, gap * cnt / n, 0.0))


def ece_equal_width(probs: jax.Array, labels: jax.Array, n_bins: int = 10
                    ) -> jax.Array:
    """Single-device equal-width ECE (≙ tfp's, ``hls4ml_pred.py:90``)."""
    return ece_from_bins(*ece_bins(probs, labels, n_bins))


def eval_metrics(probs: jax.Array, labels: jax.Array) -> dict[str, jax.Array]:
    """acc / NLL / MSE / hist-ECE battery (≙ ``ece_eval_binary`` minus the
    KDE term, which is host-side)."""
    return {
        "acc": accuracy(probs, labels),
        "nll": nll(probs, labels),
        "mse": brier_mse(probs, labels),
        "ece_hist": ece_hist(probs, labels),
        "ece_ew10": ece_equal_width(probs, labels),
    }

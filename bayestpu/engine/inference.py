"""Confidence-gated early exit — on-device, vectorized.

The reference *simulates* early exit on the host with per-instance Python
sets (``results_analyzer.py:606-630`` ``confidence_exiting``): walk exits
from index 1 upward, take the first whose confidence clears the threshold,
else the final exit. XLA has no data-dependent early return (SURVEY §7 hard
parts), so the TPU-native expression is masked selection: compute every
exit's logits (they are already all emitted by one forward), then gather
each row's earliest-confident exit. Real latency savings come from batched
exit policies; the *simulated* FLOPs savings are accounted exactly as the
reference does (``bayestpu.metrics.flops``).

Confidence rules (``is_confident``, ``results_analyzer.py:728-734``):
``max``    — top-1 probability > threshold;
``margin`` — (top-1 − top-2) > threshold (the reference's ``diff=True``).

Exit indexing parity: the reference's loop starts at exit index 1 — exit 0
is never an early-exit candidate — so ``first_exit`` defaults to 1.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from bayestpu.metrics.ece import eval_metrics


class EarlyExitResult(NamedTuple):
    probs: jax.Array      # (B, C) selected per-instance prediction
    exit_idx: jax.Array   # (B,) chosen exit index
    exit_frac: jax.Array  # (E,) fraction of the batch leaving at each exit


def _confidence(probs: jax.Array, rule: str) -> jax.Array:
    if rule == "max":
        return jnp.max(probs, axis=-1)
    if rule == "margin":
        top2 = jax.lax.top_k(probs, 2)[0]
        return jnp.abs(top2[..., 0] - top2[..., 1])
    raise ValueError(f"unknown confidence rule {rule!r}")


def early_exit_select(probs: jax.Array, threshold: float,
                      rule: str = "max", first_exit: int = 1
                      ) -> EarlyExitResult:
    """Select each instance's earliest confident exit.

    probs: (E, B, C) per-exit (MC-averaged) probabilities.
    """
    n_exits = probs.shape[0]
    conf = _confidence(probs, rule)                       # (E, B)
    confident = conf > threshold
    idx = jnp.arange(n_exits)[:, None]
    confident = jnp.where(idx < first_exit, False, confident)
    confident = confident.at[-1].set(True)                # final always exits
    exit_idx = jnp.argmax(confident, axis=0)              # first True
    sel = jnp.take_along_axis(
        probs, exit_idx[None, :, None], axis=0)[0]        # (B, C)
    frac = jnp.mean(
        jax.nn.one_hot(exit_idx, n_exits, dtype=jnp.float32), axis=0)
    return EarlyExitResult(sel, exit_idx, frac)


def confidence_exiting(probs: jax.Array, labels: jax.Array,
                       threshold: float, rule: str = "max",
                       first_exit: int = 1) -> dict:
    """acc/ECE/NLL of the early-exit prediction at one threshold
    (≙ ``confidence_exiting``, ``results_analyzer.py:606-630``)."""
    res = early_exit_select(probs, threshold, rule, first_exit)
    mets = eval_metrics(res.probs, labels)
    mets["mean_exit"] = jnp.mean(res.exit_idx.astype(jnp.float32))
    return mets


# Threshold sweep of the paper (results_analyzer.py:551)
REFERENCE_THRESHOLDS = (0.1, 0.15, 0.25, 0.5, 0.6, 0.7, 0.8, 0.9, 0.95,
                        0.99, 0.999)


def threshold_sweep(probs: jax.Array, labels: jax.Array,
                    thresholds=REFERENCE_THRESHOLDS, rule: str = "max",
                    first_exit: int = 1) -> list[dict]:
    out = []
    for t in thresholds:
        m = confidence_exiting(probs, labels, t, rule, first_exit)
        out.append({"threshold": t, **{k: float(v) for k, v in m.items()}})
    return out

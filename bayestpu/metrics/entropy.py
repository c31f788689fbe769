"""Predictive-entropy (aPE) uncertainty metrics.

≙ ``Hardware_Artifact/bayes_hw/metric_utils.py:3-6`` (mean predictive
entropy) evaluated on dataset-matched gaussian noise
(``data_utils.py:73-89``) as the OOD-uncertainty check in
``hls4ml_pred.py:93,118``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def predictive_entropy(probs: jax.Array) -> jax.Array:
    """Entropy of each predictive distribution; probs (..., C) → (...)."""
    return -jnp.sum(probs * jnp.log(probs + _EPS), axis=-1)


def mean_predictive_entropy(probs: jax.Array) -> jax.Array:
    """aPE: average predictive entropy over a batch (``metric_utils.py:3-6``)."""
    return jnp.mean(predictive_entropy(probs))


def random_noise_like(key: jax.Array, shape: tuple[int, ...],
                      mean: float = 0.0, std: float = 1.0) -> jax.Array:
    """Gaussian noise images matched to dataset statistics — the OOD probe of
    ``Hardware_Artifact/bayes_hw/data_utils.py:73-89``."""
    return mean + std * jax.random.normal(key, shape)

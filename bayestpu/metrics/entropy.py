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


# Per-channel noise stats of the reference's OOD protocol, verbatim from
# ``Hardware_Artifact/bayes_hw/data_utils.py:66-71`` (NOT the train-side
# normalization stats — the HW artifact deliberately probes MNIST with
# standard-normal noise and CIFAR/SVHN with dataset-matched moments).
NOISE_STATS: dict[str, tuple[tuple[float, ...], tuple[float, ...]]] = {
    "mnist": ((0.0,), (1.0,)),
    "cifar10": ((0.4914, 0.4822, 0.4465), (0.2023, 0.1994, 0.2010)),
    "cifar100": ((0.4914, 0.4822, 0.4465), (0.2023, 0.1994, 0.2010)),
    "svhn": ((129.3 / 255, 124.1 / 255, 112.4 / 255),
             (68.2 / 255, 65.4 / 255, 70.4 / 255)),
}


def random_noise_data(key: jax.Array, dataset: str, shape: tuple[int, ...],
                      normalized: bool = True) -> jax.Array:
    """Dataset-matched OOD noise with the reference's FIXED per-dataset
    per-channel stats (``data_utils.py:73-89``: ``np.random.normal(MEAN,
    STD, shape)`` with the module constants) — protocol-comparable aPE_ood.
    ``shape`` is (..., C) channels-last.

    ``normalized``: the reference feeds its models [0,1]-scaled images and
    generates the noise in that space; this pipeline standardizes inputs
    with ``data.datasets.DATASET_STATS``, so by default the raw-space noise
    is passed through the same standardization to land in the model's
    input space."""
    if dataset not in NOISE_STATS:
        raise KeyError(f"no noise stats for dataset {dataset!r}; "
                       f"known: {sorted(NOISE_STATS)}")
    mean, std = NOISE_STATS[dataset]
    mean_a = jnp.asarray(mean, jnp.float32)
    std_a = jnp.asarray(std, jnp.float32)
    if shape[-1] != mean_a.shape[0]:
        raise ValueError(f"shape {shape} has {shape[-1]} channels; "
                         f"{dataset} stats have {mean_a.shape[0]}")
    noise = mean_a + std_a * jax.random.normal(key, shape)
    if normalized:
        from bayestpu.data.datasets import DATASET_STATS
        nm, ns = DATASET_STATS[dataset]
        noise = (noise - jnp.asarray(nm, jnp.float32)) / jnp.asarray(
            ns, jnp.float32)
    return noise

"""KDE-ECE sanity and agreement with the binned estimator."""

import numpy as np

from bayestpu.metrics.kde import ece_kde


def _calibrated(n=8000, conf=0.7, seed=0):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 2, n)
    correct = rng.random(n) < conf
    pred = np.where(correct, labels, 1 - labels)
    probs = np.zeros((n, 2))
    probs[np.arange(n), pred] = conf
    probs[np.arange(n), 1 - pred] = 1 - conf
    # jitter so the KDE has spread
    probs += rng.normal(0, 0.01, probs.shape)
    probs = np.clip(probs, 1e-6, 1)
    probs /= probs.sum(1, keepdims=True)
    return probs, labels


def test_calibrated_low():
    probs, labels = _calibrated()
    assert ece_kde(probs, labels) < 0.03


def test_overconfident_high():
    n = 4000
    rng = np.random.default_rng(1)
    labels = rng.integers(0, 2, n)
    pred = rng.integers(0, 2, n)  # 50% accuracy
    probs = np.zeros((n, 2))
    probs[np.arange(n), pred] = 0.95
    probs[np.arange(n), 1 - pred] = 0.05
    probs += rng.normal(0, 0.01, probs.shape)
    probs = np.clip(probs, 1e-6, 1)
    probs /= probs.sum(1, keepdims=True)
    e = ece_kde(probs, labels)
    assert 0.35 < e < 0.55  # true gap ≈ 0.45


def test_multiclass_and_onehot_labels():
    rng = np.random.default_rng(2)
    n, c = 2000, 10
    logits = 3 * rng.normal(size=(n, c))
    labels = np.argmax(logits + rng.normal(size=(n, c)), axis=-1)
    probs = np.exp(logits)
    probs /= probs.sum(1, keepdims=True)
    e1 = ece_kde(probs, labels)
    onehot = np.eye(c)[labels]
    e2 = ece_kde(probs, onehot)
    assert abs(e1 - e2) < 1e-12
    assert 0.0 <= e1 <= 1.0


def test_tracks_binned_ece():
    import jax.numpy as jnp
    from bayestpu.metrics.ece import ece_hist
    probs, labels = _calibrated(conf=0.85, seed=3)
    kde = ece_kde(probs, labels)
    binned = float(ece_hist(jnp.asarray(probs), jnp.asarray(labels)))
    assert abs(kde - binned) < 0.05

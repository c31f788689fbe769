"""Calibration metric battery vs hand-computed and reference semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from bayestpu.metrics import ece
from bayestpu.metrics.entropy import mean_predictive_entropy
from bayestpu.train.losses import eed_loss, multi_exit_accuracy, EEDConfig


def _synthetic(key, n=512, c=10, sharp=5.0):
    k1, k2 = jax.random.split(key)
    logits = sharp * jax.random.normal(k1, (n, c))
    labels = jnp.argmax(logits + jax.random.normal(k2, (n, c)), axis=-1)
    return jax.nn.softmax(logits), labels


def test_accuracy_and_nll_basics():
    probs = jnp.array([[0.9, 0.1], [0.2, 0.8], [0.6, 0.4]])
    labels = jnp.array([0, 1, 1])
    np.testing.assert_allclose(float(ece.accuracy(probs, labels)), 2 / 3,
                               rtol=1e-6)
    expect_nll = -(np.log(0.9) + np.log(0.8) + np.log(0.4)) / 3
    np.testing.assert_allclose(float(ece.nll(probs, labels)), expect_nll,
                               rtol=1e-4)


def test_perfectly_calibrated_low_ece(key):
    # predictions whose confidence == accuracy by construction
    n = 20000
    conf = 0.7
    k1, k2 = jax.random.split(key)
    labels = jax.random.bernoulli(k1, 0.5, (n,)).astype(jnp.int32)
    correct = jax.random.bernoulli(k2, conf, (n,))
    pred = jnp.where(correct, labels, 1 - labels)
    probs = jnp.where(pred[:, None] == 0,
                      jnp.array([conf, 1 - conf]), jnp.array([1 - conf, conf]))
    assert float(ece.ece_equal_width(probs, labels)) < 0.02
    assert float(ece.ece_hist(probs, labels)) < 0.02


def test_overconfident_high_ece():
    n = 1000
    probs = jnp.tile(jnp.array([[0.99, 0.01]]), (n, 1))
    labels = jnp.concatenate([jnp.zeros(n // 2, jnp.int32),
                              jnp.ones(n - n // 2, jnp.int32)])
    # 99% confident, 50% right → ECE ≈ 0.49
    np.testing.assert_allclose(float(ece.ece_equal_width(probs, labels)),
                               0.49, atol=0.01)


def test_distributed_bins_decomposition(key):
    """Per-shard bin partials summed == single-shot ECE (SURVEY §5.8)."""
    probs, labels = _synthetic(key)
    whole = ece.ece_equal_width(probs, labels, n_bins=10)
    parts = [ece.ece_bins(probs[i::4], labels[i::4], n_bins=10)
             for i in range(4)]
    cnt = sum(p[0] for p in parts)
    cs = sum(p[1] for p in parts)
    acs = sum(p[2] for p in parts)
    np.testing.assert_allclose(float(ece.ece_from_bins(cnt, cs, acs)),
                               float(whole), rtol=1e-5)


def test_entropy_bounds():
    c = 10
    uniform = jnp.full((4, c), 1 / c)
    onehot = jax.nn.one_hot(jnp.zeros(4, jnp.int32), c)
    assert abs(float(mean_predictive_entropy(uniform)) - np.log(c)) < 1e-5
    assert float(mean_predictive_entropy(onehot)) < 1e-5


def test_eed_single_exit_is_ce(key):
    logits = jax.random.normal(key, (1, 8, 10))
    labels = jnp.arange(8) % 10
    loss = eed_loss(logits, labels)
    logp = jax.nn.log_softmax(logits[0])
    expect = -float(jnp.mean(
        jnp.take_along_axis(logp, labels[:, None], axis=-1)))
    np.testing.assert_allclose(float(loss), expect, rtol=1e-6)


def test_eed_multi_exit_terms(key):
    logits = jax.random.normal(key, (3, 8, 10))
    labels = jnp.arange(8) % 10
    mse_loss = eed_loss(logits, labels, cfg=EEDConfig(loss_output="MSE"))
    kl_loss = eed_loss(logits, labels, cfg=EEDConfig(loss_output="KL"))
    assert np.isfinite(float(mse_loss)) and np.isfinite(float(kl_loss))
    # EED target differs from plain distill-to-final
    plain = eed_loss(logits, labels, cfg=EEDConfig(use_eed=False))
    assert float(mse_loss) != float(plain)


def test_eed_gradients_flow(key):
    labels = jnp.arange(8) % 10

    def f(logits):
        return eed_loss(logits, labels)

    g = jax.grad(f)(jax.random.normal(key, (2, 8, 10)))
    assert np.isfinite(np.asarray(g)).all()
    assert not np.allclose(np.asarray(g), 0)


def test_multi_exit_accuracy_keys(key):
    logits = jax.random.normal(key, (3, 16, 10))
    labels = jnp.arange(16) % 10
    m = multi_exit_accuracy(logits, labels, tops=(1, 5))
    assert {"exit0_top1", "exit2_top5", "ens2_top1", "avg_maxprob"} <= set(m)
    perfect = jax.nn.one_hot(labels, 10)[None] * 50.0
    m2 = multi_exit_accuracy(jnp.tile(perfect, (2, 1, 1)), labels)
    assert float(m2["exit0_top1"]) == 1.0
    assert float(m2["ens1_top1"]) == 1.0


def test_random_noise_data_protocol(key):
    """OOD noise uses the reference's FIXED per-dataset stats
    (data_utils.py:66-89), standardized into the model input space."""
    import pytest

    from bayestpu.data.datasets import DATASET_STATS
    from bayestpu.metrics.entropy import NOISE_STATS, random_noise_data

    raw = random_noise_data(key, "cifar10", (4096, 2, 2, 3),
                            normalized=False)
    m, s = NOISE_STATS["cifar10"]
    np.testing.assert_allclose(np.asarray(raw.mean((0, 1, 2))), m, atol=0.02)
    np.testing.assert_allclose(np.asarray(raw.std((0, 1, 2))), s, atol=0.02)

    norm = random_noise_data(key, "cifar10", (4096, 2, 2, 3))
    dm, dstd = DATASET_STATS["cifar10"]
    expect = (np.asarray(raw) - np.asarray(dm)) / np.asarray(dstd)
    np.testing.assert_allclose(np.asarray(norm), expect, rtol=1e-5, atol=1e-5)

    with pytest.raises(KeyError):
        random_noise_data(key, "nope", (1, 1, 1, 3))
    with pytest.raises(ValueError):
        random_noise_data(key, "mnist", (1, 1, 1, 3))  # channel mismatch

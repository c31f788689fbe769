"""Bayesian layer semantics vs the reference behaviours."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayestpu.core.rng import BAYES_RNG
from bayestpu.nn.bayes import BayesianDropout, Masksembles


def test_mcd_always_on_at_inference(key):
    """Ref: keras BayesianDropout applies dropout with training=True always
    (converter/keras/MCDropout.py:23-31)."""
    layer = BayesianDropout(rate=0.5)
    x = jnp.ones((8, 64))
    y = layer.apply({}, x, train=False, rngs={BAYES_RNG: key})
    assert (np.asarray(y) == 0).any()          # some units dropped
    kept = np.asarray(y)[np.asarray(y) != 0]
    np.testing.assert_allclose(kept, 2.0)      # inverted-dropout scaling


def test_mcd_zero_rate_identity(key):
    layer = BayesianDropout(rate=0.0)
    x = jax.random.normal(key, (4, 16))
    y = layer.apply({}, x, train=False, rngs={BAYES_RNG: key})
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_mcd_mean_preserving(key):
    layer = BayesianDropout(rate=0.3)
    x = jnp.ones((64, 256))
    keys = jax.random.split(key, 50)
    ys = jnp.stack([
        layer.apply({}, x, rngs={BAYES_RNG: k}) for k in keys])
    np.testing.assert_allclose(float(ys.mean()), 1.0, atol=0.02)


def test_masksembles_eval_selects_bank_row(key):
    layer = Masksembles(num_masks=4, scale=2.0)
    x = jnp.ones((6, 64))
    vs = layer.init(key, x)
    bank = np.asarray(vs["masks"]["bank"])
    for i in range(4):
        y = layer.apply(vs, x, sample_idx=i)
        np.testing.assert_array_equal(np.asarray(y), np.tile(bank[i], (6, 1)))
    # round-robin wraps (ref utils.py:166-168)
    y = layer.apply(vs, x, sample_idx=5)
    np.testing.assert_array_equal(np.asarray(y), np.tile(bank[1], (6, 1)))


def test_masksembles_train_splits_batch(key):
    layer = Masksembles(num_masks=4, scale=2.0)
    x = jnp.ones((8, 64))
    vs = layer.init(key, x, train=True)
    bank = np.asarray(vs["masks"]["bank"])
    y = np.asarray(layer.apply(vs, x, train=True))
    # group g (2 rows) must be masked by bank row g (ref Masksembles.py:177-181)
    for g in range(4):
        np.testing.assert_array_equal(y[2 * g], bank[g])
        np.testing.assert_array_equal(y[2 * g + 1], bank[g])


def test_masksembles_batch_divisibility(key):
    layer = Masksembles(num_masks=4, scale=2.0)
    x = jnp.ones((6, 64))  # 6 % 4 != 0
    with pytest.raises(ValueError):
        layer.init(key, x, train=True)


def test_masksembles_2d_input(key):
    layer = Masksembles(num_masks=4, scale=2.0)
    x = jnp.ones((4, 8, 8, 32))
    vs = layer.init(key, x)
    y = layer.apply(vs, x, sample_idx=2)
    bank = np.asarray(vs["masks"]["bank"])
    np.testing.assert_array_equal(
        np.asarray(y), np.broadcast_to(bank[2], (4, 8, 8, 32)))

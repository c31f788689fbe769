"""NN→BNN converter: strategy placement parity with nn2bnn.py semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from bayestpu.core.config import BayesConfig, DropoutKind, InsertStrategy
from bayestpu.nn.convert import (
    Act, Bayes, C, D, Flatten, MasksemblesModel, MCDropoutModel, Pool,
    convert_to_bayesian, lenet_specs, strategy_default, strategy_full,
    strategy_last,
)


def test_strategy_default_last_n_compute():
    specs = lenet_specs()
    # compute layers at indices 0, 3, 7, 9 → last 2 are [7, 9]
    assert strategy_default(specs, 2) == [7, 9]
    assert strategy_default(specs, 1) == [9]
    assert strategy_default(specs, 0) == []


def test_strategy_last_first_dense_after_conv():
    specs = lenet_specs()
    # last conv at 3; first Dense after it at 7
    assert strategy_last(specs) == [7]


def test_strategy_full_after_every_compute():
    specs = lenet_specs()
    assert strategy_full(specs) == [1, 4, 8, 10]


def test_convert_inserts_sites():
    bayes = BayesConfig(kind=DropoutKind.MC, rate=0.5, num_bayes_layers=2,
                        strategy=InsertStrategy.DEFAULT)
    out = convert_to_bayesian(lenet_specs(), bayes)
    kinds = [type(s).__name__ for s in out]
    assert kinds.count("Bayes") == 2
    # site inserted directly before each of the two Dense layers
    d_idx = [i for i, s in enumerate(out) if isinstance(s, D)]
    for i in d_idx:
        assert isinstance(out[i - 1], Bayes)


def test_full_strategy_conversion_count():
    bayes = BayesConfig(kind=DropoutKind.MC, rate=0.5,
                        strategy=InsertStrategy.FULL)
    out = convert_to_bayesian(lenet_specs(), bayes)
    assert sum(isinstance(s, Bayes) for s in out) == 4


def test_mcdropout_wrapper_end_to_end(key):
    m = MCDropoutModel(lenet_specs(), num_samples=4, rate=0.3, num=1)
    x = jax.random.normal(key, (4, 28, 28, 1))
    m.init(key, x)
    probs = m.predict(x)
    assert probs.shape == (4, 10)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-5)
    mets = m.evaluate(x, jnp.zeros(4, jnp.int32))
    assert set(mets) >= {"acc", "nll", "ece_hist"}


def test_masksembles_wrapper_end_to_end(key):
    m = MasksemblesModel(lenet_specs(), num_masks=4, scale=2.0, num=1)
    x = jax.random.normal(key, (4, 28, 28, 1))
    m.init(key, x)
    probs = m.predict(x)
    assert probs.shape == (4, 10)
    # enumerating masks is deterministic — key must not matter
    probs2 = m.predict(x, jax.random.key(123))
    np.testing.assert_allclose(np.asarray(probs), np.asarray(probs2),
                               rtol=1e-5, atol=1e-6)


def test_num_zero_keeps_model_deterministic(key):
    m = MCDropoutModel(lenet_specs(), num_samples=4, rate=0.3, num=0)
    x = jax.random.normal(key, (2, 28, 28, 1))
    m.init(key, x)
    a, b = m.predict(x), m.predict(x, jax.random.key(9))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

"""Distributed evaluation on the 8-device virtual CPU mesh (SURVEY §4.6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayestpu.core.config import BayesConfig
from bayestpu.core.rng import BAYES_RNG
from bayestpu.engine import distributed, sharding
from bayestpu.metrics.ece import ece_equal_width
from bayestpu.nn.zoo import get_model

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 virtual devices")


@needs_8
def test_make_mesh_shapes():
    mesh = sharding.make_mesh(4, 2)
    assert mesh.shape == {"data": 4, "sample": 2}
    mesh2 = sharding.make_mesh()  # defaults to all-sample
    assert mesh2.shape["sample"] == 8


@needs_8
def test_sharded_predictive_matches_local(key):
    model = get_model("lenet", bayes=BayesConfig(rate=0.3))
    x = jax.random.normal(key, (16, 28, 28, 1))
    vs = model.init({"params": key, BAYES_RNG: key}, x)
    mesh = sharding.make_mesh(2, 4)
    from bayestpu.engine import sampler
    k = jax.random.key(5)
    local = sampler.predictive(model, vs, x, k, 8)
    shard = sharding.sharded_predictive(model, vs, x, k, 8, mesh)
    # same per-sample keys (fold_in by index) → same mean up to float assoc
    np.testing.assert_allclose(np.asarray(shard.probs),
                               np.asarray(local.probs), rtol=1e-4, atol=1e-5)


@needs_8
def test_sample_padding_to_mesh():
    model = get_model("lenet", bayes=BayesConfig(rate=0.3))
    key = jax.random.key(0)
    x = jnp.zeros((8, 28, 28, 1))
    vs = model.init({"params": key, BAYES_RNG: key}, x)
    mesh = sharding.make_mesh(2, 4)
    pred = sharding.sharded_predictive(model, vs, x, key, 6, mesh)
    assert pred.num_samples == 8  # padded up to sample-axis multiple


@needs_8
def test_distributed_evaluate_matches_unsharded(key):
    model = get_model("lenet", bayes=BayesConfig(rate=0.0))
    x = jax.random.normal(key, (32, 28, 28, 1))
    y = jax.random.randint(jax.random.fold_in(key, 1), (32,), 0, 10)
    vs = model.init({"params": key, BAYES_RNG: key}, x)
    mesh = sharding.make_mesh(4, 2)
    mets = distributed.distributed_evaluate(model, vs, x, y, 2, mesh)
    # rate 0 → deterministic; compare against plain forward
    out = model.apply(vs, x, rngs={BAYES_RNG: key})
    probs = jax.nn.softmax(out.logits[-1], axis=-1)
    want_acc = float((jnp.argmax(probs, -1) == y).mean())
    np.testing.assert_allclose(mets["acc"], want_acc, atol=1e-6)
    np.testing.assert_allclose(mets["ece"],
                               float(ece_equal_width(probs, y)), atol=1e-5)
    assert mets["n"] == 32


def test_initialize_single_host_noop():
    distributed.initialize()  # must not raise on one host

"""MC engine: temporal vs spatial equivalence, moments, multi-exit shapes."""

import jax
import jax.numpy as jnp
import numpy as np

from bayestpu.core.config import BayesConfig, DropoutKind, SamplingMode
from bayestpu.core.rng import BAYES_RNG
from bayestpu.engine import sampler
from bayestpu.nn.zoo import get_model


def _init(model, key, x):
    return model.init({"params": key, BAYES_RNG: key}, x)


def test_lenet_forward_shapes(key):
    model = get_model("lenet")
    x = jnp.zeros((4, 28, 28, 1))
    vs = _init(model, key, x)
    out = model.apply(vs, x, rngs={BAYES_RNG: key})
    assert out.logits.shape == (1, 4, 10)


def test_lenet_me_two_exits(key):
    model = get_model("lenet_me")
    x = jnp.zeros((4, 28, 28, 1))
    vs = _init(model, key, x)
    out = model.apply(vs, x, rngs={BAYES_RNG: key})
    assert out.logits.shape == (2, 4, 10)
    assert out.features.shape == (2, 4, 100)


def test_temporal_equals_spatial(key):
    """P1 and P2 mappings use identical per-sample masks (fold_in-derived
    keys), so results agree to float tolerance — the only difference is XLA
    reduction order between the scanned and vmapped graphs (SURVEY §2.10)."""
    model = get_model("lenet", bayes=BayesConfig(rate=0.4, num_bayes_layers=2))
    x = jax.random.normal(key, (4, 28, 28, 1))
    vs = _init(model, key, x)
    k = jax.random.key(42)
    lt = sampler.mc_logits(model, vs, x, k, 6, SamplingMode.TEMPORAL)
    ls = sampler.mc_logits(model, vs, x, k, 6, SamplingMode.SPATIAL)
    np.testing.assert_allclose(np.asarray(lt), np.asarray(ls),
                               rtol=1e-5, atol=1e-5)


def test_samples_differ(key):
    model = get_model("lenet", bayes=BayesConfig(rate=0.4))
    x = jax.random.normal(key, (4, 28, 28, 1))
    vs = _init(model, key, x)
    ls = sampler.mc_logits(model, vs, x, jax.random.key(1), 4)
    assert not np.allclose(np.asarray(ls[0]), np.asarray(ls[1]))


def test_streaming_moments_match_materialized(key):
    model = get_model("lenet", bayes=BayesConfig(rate=0.25))
    x = jax.random.normal(key, (4, 28, 28, 1))
    vs = _init(model, key, x)
    k = jax.random.key(7)
    a = sampler.predictive(model, vs, x, k, 8)
    b = sampler.mc_moments(model, vs, x, k, 8)
    np.testing.assert_allclose(np.asarray(a.probs), np.asarray(b.probs),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.var), np.asarray(b.var),
                               rtol=1e-4, atol=1e-6)


def test_masksembles_model_enumerates_masks(key):
    cfg = BayesConfig(kind=DropoutKind.MASK, num_masks=4, scale=2.0)
    model = get_model("lenet", bayes=cfg)
    x = jax.random.normal(key, (2, 28, 28, 1))
    vs = _init(model, key, x)
    logits = sampler.mc_logits(model, vs, x, jax.random.key(0), 4)
    # deterministic given mask index: recomputing sample i reproduces it
    logits2 = sampler.mc_logits(model, vs, x, jax.random.key(9), 4)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2),
                               rtol=1e-6)
    # different masks → different logits
    assert not np.allclose(np.asarray(logits[0]), np.asarray(logits[1]))


def test_predictive_probs_normalized(key):
    model = get_model("lenet_me", bayes=BayesConfig(rate=0.25))
    x = jax.random.normal(key, (4, 28, 28, 1))
    vs = _init(model, key, x)
    pred = sampler.predictive(model, vs, x, jax.random.key(3), 5)
    np.testing.assert_allclose(np.asarray(pred.probs.sum(-1)), 1.0, rtol=1e-5)
    assert pred.entropy.shape == (2, 4)

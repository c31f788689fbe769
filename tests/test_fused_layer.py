"""BayesDense fused layer vs composed (site + Dense) reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayestpu.core.config import BayesConfig, DropoutKind
from bayestpu.core.rng import BAYES_RNG
from bayestpu.engine import sampler
from bayestpu.nn.fused import BayesDense
from bayestpu.nn.zoo import get_model


def _mk(bayes, fused):
    return BayesDense(features=16, bayes=bayes, fused=fused)


def test_mask_family_fused_exact(key):
    """Masksembles fused path must be EXACT vs unfused (same bank, same
    row) — the golden per-mask equivalence of verify_accuracy.py:88-92."""
    cfg = BayesConfig(kind=DropoutKind.MASK, num_masks=4, scale=2.0)
    x = jax.random.normal(key, (8, 64))
    mf = _mk(cfg, fused=True)
    vs = mf.init({"params": key, BAYES_RNG: key}, x)
    mu = _mk(cfg, fused=False)
    for i in range(5):
        yf = mf.apply(vs, x, sample_idx=i)
        yu = mu.apply(vs, x, sample_idx=i)
        np.testing.assert_allclose(np.asarray(yf), np.asarray(yu),
                                   rtol=1e-5, atol=1e-5)


def test_mask_train_batchsplit_matches_unfused(key):
    cfg = BayesConfig(kind=DropoutKind.MASK, num_masks=4, scale=2.0)
    x = jax.random.normal(key, (8, 64))
    mf = _mk(cfg, fused=True)
    vs = mf.init({"params": key, BAYES_RNG: key}, x, train=True)
    mu = _mk(cfg, fused=False)
    yf = mf.apply(vs, x, train=True)
    yu = mu.apply(vs, x, train=True)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yu), rtol=1e-5,
                               atol=1e-5)


@pytest.mark.slow  # heavy; full tier runs it (pytest -m "")
def test_mc_fused_statistics(key):
    """MC fused path: different PRNG, same distribution — check the MC mean
    of the masked matmul converges to the unmasked matmul."""
    cfg = BayesConfig(kind=DropoutKind.MC, rate=0.5)
    x = jnp.ones((4, 256))
    m = _mk(cfg, fused=True)
    vs = m.init({"params": key, BAYES_RNG: key}, x)
    base = _mk(BayesConfig(kind=DropoutKind.NONE), fused=True).apply(vs, x)
    keys = jax.random.split(jax.random.key(1), 256)
    ys = jnp.stack([m.apply(vs, x, rngs={BAYES_RNG: k}) for k in keys])
    # MC-mean estimator: |mean - base| should be within ~4 standard errors
    se = np.asarray(ys.std(0)) / np.sqrt(len(keys))
    err = np.abs(np.asarray(ys.mean(0)) - np.asarray(base))
    assert (err < 4 * se + 1e-3).mean() > 0.99, (err / (se + 1e-9)).max()
    # and individual samples actually differ
    assert not np.allclose(np.asarray(ys[0]), np.asarray(ys[1]))


def test_none_kind_is_plain_dense(key):
    cfg = BayesConfig(kind=DropoutKind.NONE)
    x = jax.random.normal(key, (4, 32))
    m = _mk(cfg, fused=True)
    vs = m.init({"params": key, BAYES_RNG: key}, x)
    kernel = vs["params"]["kernel"]
    bias = vs["params"]["bias"]
    np.testing.assert_allclose(np.asarray(m.apply(vs, x)),
                               np.asarray(x @ kernel + bias), rtol=1e-5)


def test_fused_lenet_me_end_to_end(key):
    """Whole model with fused heads runs under the MC engine (vmap)."""
    model = get_model("lenet_me", bayes=BayesConfig(rate=0.25), fused=True)
    x = jax.random.normal(key, (4, 28, 28, 1))
    vs = model.init({"params": key, BAYES_RNG: key}, x)
    logits = sampler.mc_logits(model, vs, x, jax.random.key(1), 4)
    assert logits.shape == (4, 2, 4, 10)
    assert np.isfinite(np.asarray(logits)).all()
    assert not np.allclose(np.asarray(logits[0]), np.asarray(logits[1]))


def test_fused_gradients(key):
    model = get_model("lenet", bayes=BayesConfig(rate=0.25), fused=True)
    x = jax.random.normal(key, (4, 28, 28, 1))
    vs = model.init({"params": key, BAYES_RNG: key}, x)

    def loss(params):
        out = model.apply({"params": params}, x, train=True,
                          rngs={BAYES_RNG: key})
        return jnp.sum(out.logits ** 2)

    g = jax.grad(loss)(vs["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)

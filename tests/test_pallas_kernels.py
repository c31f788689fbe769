"""Pallas fused-mask matmul kernels vs the naive XLA path (interpret mode).

On CPU the kernels run in the Pallas interpreter (the csim analogue —
SURVEY §2.9: "interpreter mode for Pallas as the csim analogue"); compiled
behaviour is exercised on the real chip by bench.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayestpu.core.rng import key_to_seeds
from bayestpu.kernels import mask_bank
from bayestpu.kernels.masked_matmul import (
    bank_matmul,
    dropout_matmul,
    _dropout_apply,
)

I = dict(interpret=True)


def test_rate_zero_is_plain_matmul(key):
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (32, 64))
    w = jax.random.normal(k2, (64, 16))
    seeds = key_to_seeds(key)[:2].astype(jnp.int32)
    y = dropout_matmul(x, w, seeds, 0.0, **I)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x @ w), rtol=1e-5,
                               atol=1e-5)


def test_dropout_matmul_structure(key):
    """y must equal (x ⊙ m / keep) @ w for SOME binary mask m — recover the
    mask via the kernel's own mask-apply path and check exact consistency."""
    k1, k2 = jax.random.split(key)
    m_dim, k_dim, n_dim = 16, 32, 8
    x = jax.random.normal(k1, (m_dim, k_dim))
    w = jax.random.normal(k2, (k_dim, n_dim))
    seeds = jnp.asarray([12345, 678], jnp.int32)
    rate = 0.4
    y = dropout_matmul(x, w, seeds, rate, **I)
    xm = _dropout_apply(x, seeds, rate, 128, 128, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(xm @ w), rtol=1e-4,
                               atol=1e-4)
    # the recovered masked activation is binary-scaled: entries are 0 or x/keep
    ratio = np.asarray(xm) / np.asarray(x)
    kept = ratio[np.abs(np.asarray(x)) > 1e-6]
    is_zero = np.isclose(kept, 0.0, atol=1e-5)
    is_scale = np.isclose(kept, 1 / 0.6, rtol=1e-4)
    assert np.all(is_zero | is_scale)
    assert is_zero.any() and is_scale.any()


def test_dropout_statistics(key):
    x = jnp.ones((256, 256))
    w = jnp.eye(256)
    rate = 0.3
    seeds = jnp.asarray([7, 8], jnp.int32)
    y = np.asarray(dropout_matmul(x, w, seeds, rate, **I))
    keep_frac = (np.abs(y) > 1e-6).mean()
    np.testing.assert_allclose(keep_frac, 1 - rate, atol=0.03)
    np.testing.assert_allclose(y.mean(), 1.0, atol=0.05)  # inverted scaling


def test_mask_consistent_across_output_tiles(key):
    """The j (output-column) grid dim must not change the x mask: columns of
    w that are identical must produce identical output columns."""
    x = jax.random.normal(key, (64, 64))
    w = jnp.tile(jax.random.normal(jax.random.fold_in(key, 1), (64, 1)),
                 (1, 256))  # 256 identical columns spanning >1 n-tile
    seeds = jnp.asarray([3, 4], jnp.int32)
    y = np.asarray(dropout_matmul(x, w, seeds, 0.5, block_n=128, **I))
    np.testing.assert_allclose(y, np.tile(y[:, :1], (1, y.shape[1])),
                               rtol=1e-5, atol=1e-5)


def test_determinism_and_seed_sensitivity(key):
    x = jax.random.normal(key, (32, 32))
    w = jnp.eye(32)
    a = dropout_matmul(x, w, jnp.asarray([1, 2], jnp.int32), 0.5, **I)
    b = dropout_matmul(x, w, jnp.asarray([1, 2], jnp.int32), 0.5, **I)
    c = dropout_matmul(x, w, jnp.asarray([1, 3], jnp.int32), 0.5, **I)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_padding_unaligned_shapes(key):
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (37, 45))
    w = jax.random.normal(k2, (45, 19))
    seeds = jnp.asarray([5, 6], jnp.int32)
    y = dropout_matmul(x, w, seeds, 0.25, **I)
    assert y.shape == (37, 19)
    xm = _dropout_apply(x, seeds, 0.25, 128, 128, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(xm @ w), rtol=1e-4,
                               atol=1e-4)


def test_vjp_consistent_with_forward_mask(key):
    """grad must use the same mask as the forward pass: for y = sum(drop(x)@w)
    with w = I, dy/dx == mask/keep (exactly the recovered forward mask)."""
    x = jax.random.normal(key, (16, 32))
    w = jnp.eye(32)
    seeds = jnp.asarray([11, 22], jnp.int32)
    rate = 0.5

    def f(x):
        return jnp.sum(dropout_matmul(x, w, seeds, rate, **I))

    g = np.asarray(jax.grad(f)(x))
    xm = np.asarray(_dropout_apply(x, seeds, rate, 128, 128, interpret=True))
    mask_scaled = np.where(np.asarray(x) != 0, xm / np.asarray(x), g)
    np.testing.assert_allclose(g, mask_scaled, rtol=1e-4, atol=1e-4)


def test_bank_matmul_matches_reference(key):
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (24, 64))
    w = jax.random.normal(k2, (64, 32))
    _, bank = mask_bank.generation_wrapper(64, 4, 2.0, rng=0)
    bank = jnp.asarray(bank)
    for i in [0, 3, 5]:  # incl. round-robin wrap
        y = bank_matmul(x, w, bank, i, **I)
        want = (x * bank[i % 4]) @ w
        np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)


def test_bank_matmul_traced_index(key):
    """sample_idx may be a traced scalar (vmapped by the engine)."""
    x = jax.random.normal(key, (8, 64))
    w = jnp.eye(64)
    _, bank = mask_bank.generation_wrapper(64, 4, 2.0, rng=1)
    bank = jnp.asarray(bank)

    def f(i):
        return bank_matmul(x, w, bank, i, **I)

    ys = jax.lax.map(f, jnp.arange(4))
    for i in range(4):
        np.testing.assert_allclose(np.asarray(ys[i]),
                                   np.asarray(x * bank[i]), rtol=1e-4,
                                   atol=1e-4)


# ------------------------------------------------------------ int8 kernels


def test_dropout_matmul_int8_mask_matches_float(key):
    """Same seeds → bit-identical keep mask as the float kernel: the int8
    result must equal the float kernel run on the dequantized operands."""
    from bayestpu.core.config import QuantConfig
    from bayestpu.core.quant import dequantize, quantize_int8
    from bayestpu.kernels.masked_matmul import dropout_matmul_int8

    cfg = QuantConfig(total_bits=8, integer_bits=2)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (24, 48))
    w = jax.random.normal(k2, (48, 16)) * 0.5
    xq, xs = quantize_int8(x, cfg)
    wq, ws = quantize_int8(w, cfg)
    seeds = jnp.asarray([11, 22], jnp.int32)
    rate = 0.35
    y8 = dropout_matmul_int8(xq, wq, seeds, rate, xs, ws, **I)
    yf = dropout_matmul(dequantize(xq, xs), dequantize(wq, ws), seeds, rate,
                        **I)
    np.testing.assert_allclose(np.asarray(y8), np.asarray(yf), rtol=1e-4,
                               atol=1e-4)


def test_dropout_matmul_int8_rate_zero_exact(key):
    """rate=0 → exact int32 arithmetic: equals the integer matmul rescaled."""
    from bayestpu.core.config import QuantConfig
    from bayestpu.core.quant import quantize_int8
    from bayestpu.kernels.masked_matmul import dropout_matmul_int8

    cfg = QuantConfig(total_bits=8, integer_bits=0)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (16, 32)) * 0.3
    w = jax.random.normal(k2, (32, 8)) * 0.3
    xq, xs = quantize_int8(x, cfg)
    wq, ws = quantize_int8(w, cfg)
    y = dropout_matmul_int8(xq, wq, jnp.zeros((2,), jnp.int32), 0.0, xs, ws,
                            **I)
    want = (np.asarray(xq, np.int32) @ np.asarray(wq, np.int32)) * (xs * ws)
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-6, atol=1e-6)


def test_bank_matmul_int8_matches_reference(key):
    from bayestpu.core.config import QuantConfig
    from bayestpu.core.quant import quantize_int8
    from bayestpu.kernels.masked_matmul import bank_matmul_int8

    cfg = QuantConfig(total_bits=8, integer_bits=1)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (12, 64))
    w = jax.random.normal(k2, (64, 24)) * 0.4
    xq, xs = quantize_int8(x, cfg)
    wq, ws = quantize_int8(w, cfg)
    _, bank = mask_bank.generation_wrapper(64, 4, 2.0, rng=0)
    bank = jnp.asarray(bank)
    for i in [0, 2, 6]:
        y = bank_matmul_int8(xq, wq, bank, i, xs, ws, **I)
        want = ((np.asarray(xq, np.int32) * np.asarray(bank[i % 4], np.int32))
                @ np.asarray(wq, np.int32)) * (xs * ws)
        np.testing.assert_allclose(np.asarray(y), want, rtol=1e-5, atol=1e-5)


def test_bayes_dense_int8_fused_runs(key):
    """BayesDense with int8_infer + fused lowers through the int8 kernels."""
    from bayestpu.core.config import BayesConfig, QuantConfig
    from bayestpu.core.rng import BAYES_RNG
    from bayestpu.nn.fused import BayesDense

    for kind_cfg in (BayesConfig(rate=0.3),
                     BayesConfig(kind="mask", num_masks=4, scale=2.0),
                     BayesConfig(rate=0.0)):
        m = BayesDense(16, bayes=kind_cfg,
                       quant=QuantConfig(total_bits=8, integer_bits=0,
                                         int8_infer=True), fused=True)
        x = jax.random.normal(key, (8, 32)) * 0.4
        vs = m.init({"params": key, BAYES_RNG: key}, x)
        y = m.apply(vs, x, sample_idx=1, rngs={BAYES_RNG: key})
        assert y.shape == (8, 16) and jnp.isfinite(y).all()


# ---------------------------------------------------- multi-sample kernel


def test_dropout_matmul_samples_bit_exact_per_sample(key):
    """Row s of the all-samples kernel == dropout_matmul with seeds[s]."""
    from bayestpu.kernels.masked_matmul import dropout_matmul_samples

    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (16, 48))
    w = jax.random.normal(k2, (48, 8))
    seeds = (jnp.arange(10, dtype=jnp.int32).reshape(5, 2) * 17 + 3)
    ys = dropout_matmul_samples(x, w, seeds, 0.3, **I)
    assert ys.shape == (5, 16, 8)
    for s in range(5):
        y1 = dropout_matmul(x, w, seeds[s], 0.3, **I)
        np.testing.assert_allclose(np.asarray(ys[s]), np.asarray(y1),
                                   rtol=1e-5, atol=1e-5)
    # distinct seeds → distinct samples
    assert not np.allclose(np.asarray(ys[0]), np.asarray(ys[1]))


def test_dropout_matmul_samples_rate_zero(key):
    from bayestpu.kernels.masked_matmul import dropout_matmul_samples

    x = jax.random.normal(key, (8, 16))
    w = jnp.eye(16)
    seeds = jnp.zeros((3, 2), jnp.int32)
    ys = dropout_matmul_samples(x, w, seeds, 0.0, **I)
    for s in range(3):
        np.testing.assert_allclose(np.asarray(ys[s]), np.asarray(x),
                                   rtol=1e-5, atol=1e-5)


def test_bank_matmul_samples_matches_per_sample(key):
    from bayestpu.kernels.masked_matmul import (
        bank_matmul_inference,
        bank_matmul_samples,
    )

    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (12, 64))
    w = jax.random.normal(k2, (64, 24))
    _, bank = mask_bank.generation_wrapper(64, 4, 2.0, rng=0)
    bank = jnp.asarray(bank)
    idxs = jnp.asarray([0, 1, 2, 3, 5], jnp.int32)
    ys = bank_matmul_samples(x, w, bank, idxs, **I)
    assert ys.shape == (5, 12, 24)
    for s, i in enumerate([0, 1, 2, 3, 5]):
        want = (x * bank[i % 4]) @ w
        np.testing.assert_allclose(np.asarray(ys[s]), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)
    # the custom_vmap rule produces the same thing from a vmapped call
    yv = jax.vmap(lambda i: bank_matmul_inference(x, w, bank, i, **I))(idxs)
    np.testing.assert_allclose(np.asarray(yv), np.asarray(ys), rtol=1e-5,
                               atol=1e-5)


def test_dropout_matmul_inference_vmap_rule(key):
    """vmap(dropout_matmul_inference) over seeds == per-sample calls."""
    from bayestpu.kernels.masked_matmul import dropout_matmul_inference

    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (16, 32))
    w = jax.random.normal(k2, (32, 8))
    seeds = jnp.arange(8, dtype=jnp.int32).reshape(4, 2) * 31 + 7
    yv = jax.vmap(lambda s: dropout_matmul_inference(x, w, s, 0.3, **I))(seeds)
    for s in range(4):
        y1 = dropout_matmul(x, w, seeds[s], 0.3, **I)
        np.testing.assert_allclose(np.asarray(yv[s]), np.asarray(y1),
                                   rtol=1e-5, atol=1e-5)


def test_int8_matmul_samples_and_vmap_collapse():
    """int8 multi-sample matmul kernels: bit-identical to per-sample int8
    singles; inference wrappers collapse a sample-mapped vmap (the engine's
    spatial sweep at the 8-bit operating point)."""
    from bayestpu.kernels.masked_matmul import (
        bank_matmul_int8, bank_matmul_int8_inference,
        bank_matmul_int8_samples, dropout_matmul_int8,
        dropout_matmul_int8_inference, dropout_matmul_int8_samples)

    rng = np.random.default_rng(21)
    xq = jnp.asarray(rng.integers(-127, 128, (48, 96)), jnp.int8)
    wq = jnp.asarray(rng.integers(-127, 128, (96, 40)), jnp.int8)
    sseeds = jnp.asarray(rng.integers(0, 2**31, (5, 2)), jnp.int32)
    ys = dropout_matmul_int8_samples(xq, wq, sseeds, 0.3, 0.5, 0.25,
                                     interpret=True)
    y1 = jnp.stack([dropout_matmul_int8(xq, wq, sseeds[s], 0.3, 0.5, 0.25,
                                        interpret=True)
                    for s in range(5)])
    assert jnp.array_equal(ys, y1)
    yv = jax.vmap(lambda s: dropout_matmul_int8_inference(
        xq, wq, s, 0.3, 0.5, 0.25, interpret=True))(sseeds)
    assert jnp.array_equal(yv, y1)

    bank = jnp.asarray(rng.integers(0, 2, (4, 96)) * 2.0, jnp.float32)
    idxs = jnp.asarray([0, 1, 2, 3, 1], jnp.int32)
    yb1 = jnp.stack([bank_matmul_int8(xq, wq, bank, i, 0.5, 0.25,
                                      interpret=True) for i in idxs])
    ybs = bank_matmul_int8_samples(xq, wq, bank, idxs, 0.5, 0.25,
                                   interpret=True)
    assert jnp.array_equal(ybs, yb1)
    ybv = jax.vmap(lambda i: bank_matmul_int8_inference(
        xq, wq, bank, i, 0.5, 0.25, interpret=True))(idxs)
    assert jnp.array_equal(ybv, yb1)

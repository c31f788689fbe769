"""Fixed-point quantization: grid, rounding, STE, int8 matmul parity."""

import jax
import jax.numpy as jnp
import numpy as np

from bayestpu.core.config import QuantConfig
from bayestpu.core import quant


CFG = QuantConfig(total_bits=8, integer_bits=0)  # the paper operating point


def test_grid_and_saturation():
    # step = 2^(0-8+1) = 1/128; range [-1, 127/128]
    x = jnp.array([0.0, 1 / 128, 1 / 256, 5.0, -5.0])
    q = np.asarray(quant.fake_quant(x, CFG))
    np.testing.assert_allclose(q[0], 0.0)
    np.testing.assert_allclose(q[1], 1 / 128)
    np.testing.assert_allclose(q[2], 1 / 128)   # AP_RND: .5 rounds away from 0
    np.testing.assert_allclose(q[3], 127 / 128)  # AP_SAT
    np.testing.assert_allclose(q[4], -1.0)


def test_integer_bits_scale():
    cfg = QuantConfig(total_bits=8, integer_bits=4)
    # step = 2^(4-7) = 1/8; range [-16, 15.875]
    q = np.asarray(quant.fake_quant(jnp.array([3.14, 100.0]), cfg))
    np.testing.assert_allclose(q[0], round(3.14 * 8) / 8)
    np.testing.assert_allclose(q[1], 15.875)


def test_straight_through_gradient():
    g = jax.grad(lambda x: quant.fake_quant(x, CFG).sum())(jnp.ones((4,)) * .3)
    np.testing.assert_allclose(np.asarray(g), 1.0)


def test_int8_matmul_matches_fake_quant(key):
    k1, k2 = jax.random.split(key)
    x = jax.random.uniform(k1, (16, 32), minval=-1, maxval=1)
    w = jax.random.uniform(k2, (32, 8), minval=-1, maxval=1) * 0.5
    xq, xs = quant.quantize_int8(x, CFG)
    wq, ws = quant.quantize_int8(w, CFG)
    got = quant.int8_matmul(xq, wq, xs, ws)
    want = quant.fake_quant(x, CFG) @ quant.fake_quant(w, CFG)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)

"""int8 inference path: exact equality with the fake-quant float path.

The int8 MXU contraction computes clip(round(x/s))·clip(round(w/s)) in int32
then rescales once — identical arithmetic to fake_quant(x)·fake_quant(w) in
fp32 for 8-bit grids, so equality is exact (modulo fp32 summation order).
"""

import jax
import jax.numpy as jnp
import numpy as np

from bayestpu.core.config import QuantConfig
from bayestpu.nn.layers import Conv, Dense

CFG = QuantConfig(total_bits=8, integer_bits=2)


def test_dense_int8_matches_fake_quant(key):
    k1, k2 = jax.random.split(key)
    x = jax.random.uniform(k1, (16, 64), minval=-2, maxval=2)
    d_f = Dense(32, quant=CFG)
    d_q = Dense(32, quant=CFG, int8_infer=True)
    vs = d_f.init(k2, x)
    from bayestpu.core.quant import fake_quant
    want = d_f.apply(vs, fake_quant(x, CFG))
    got = d_q.apply(vs, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_conv_int8_matches_fake_quant(key):
    k1, k2 = jax.random.split(key)
    x = jax.random.uniform(k1, (2, 16, 16, 8), minval=-2, maxval=2)
    c_f = Conv(12, (3, 3), quant=CFG)
    c_q = Conv(12, (3, 3), quant=CFG, int8_infer=True)
    vs = c_f.init(k2, x)
    from bayestpu.core.quant import fake_quant
    want = c_f.apply(vs, fake_quant(x, CFG))
    got = c_q.apply(vs, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_int8_requires_8_bits():
    import pytest
    from bayestpu.core.quant import quantize_int8
    with pytest.raises(ValueError):
        quantize_int8(jnp.zeros(4), QuantConfig(total_bits=4))

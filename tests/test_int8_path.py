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


def test_model_level_int8_fused_agrees_with_fake_quant(key):
    """End-to-end: the fully-fused int8 inference path and the fake-quant
    float path agree on predictions (same ap_fixed grid, different
    arithmetic order) — the model-level analogue of the reference's
    keras-vs-HLS accuracy comparison (hls4ml_pred.py:114-119)."""
    import jax
    import numpy as np

    from bayestpu.core.config import BayesConfig
    from bayestpu.core.rng import BAYES_RNG
    from bayestpu.nn.zoo import get_model

    cfg = QuantConfig(total_bits=8, integer_bits=0)
    cfg_i8 = QuantConfig(total_bits=8, integer_bits=0, int8_infer=True)
    bayes = BayesConfig(kind="mask", num_masks=4, scale=2.0)
    x = jax.random.normal(key, (16, 28, 28, 1)) * 0.5

    m_fq = get_model("lenet", bayes=bayes, quant=cfg, fused=False)
    m_i8 = get_model("lenet", bayes=bayes, quant=cfg_i8, fused=True)
    vs = m_fq.init({"params": key, BAYES_RNG: key}, x)

    for i in range(4):
        out_fq = m_fq.apply(vs, x, sample_idx=i, train=False,
                            rngs={BAYES_RNG: key}).logits
        out_i8 = m_i8.apply(vs, x, sample_idx=i, train=False,
                            rngs={BAYES_RNG: key}).logits
        a = np.asarray(out_fq[-1]).argmax(-1)
        b = np.asarray(out_i8[-1]).argmax(-1)
        # same mask bank + same quant grid → identical top-1 on almost all
        # inputs; allow 1/16 flip from accumulation-order ties
        assert (a == b).mean() >= 15 / 16, (a, b)

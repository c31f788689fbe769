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


def test_int8_routing_threshold_is_semantics_preserving(key):
    """QuantConfig.int8_conv_min_ch is a pure execution-routing knob: the
    same weights under threshold 4 (everything on the int8 MXU) and
    threshold 10^9 (everything on bf16-exec over grid values) must agree —
    the guarantee that made the round-5 routing sweep a legal speed-only
    decision."""
    import dataclasses

    import jax
    import numpy as np

    from bayestpu.core.config import BayesConfig
    from bayestpu.core.rng import BAYES_RNG
    from bayestpu.nn.zoo import get_model

    base = QuantConfig(total_bits=8, integer_bits=0, int8_infer=True)
    bayes = BayesConfig(kind="mask", num_masks=4, scale=2.0)
    x = jax.random.normal(key, (8, 32, 32, 3)) * 0.5
    outs = []
    vs = None
    for thresh in (4, 10 ** 9):
        q = dataclasses.replace(base, int8_conv_min_ch=thresh)
        m = get_model("vgg11_me", bayes=bayes, quant=q, fused=True)
        if vs is None:
            vs = m.init({"params": key, BAYES_RNG: key}, x)
        outs.append(np.asarray(m.apply(
            vs, x, sample_idx=0, train=False,
            rngs={BAYES_RNG: key}).logits[-1]))
    # int32 vs f32 accumulation differ only in last-ulp rounding
    np.testing.assert_allclose(outs[0], outs[1], rtol=2e-3, atol=2e-3)
    assert (outs[0].argmax(-1) == outs[1].argmax(-1)).mean() >= 7 / 8


def test_int8_dense_routing_threshold_is_semantics_preserving(key):
    """QuantConfig.int8_dense_min_dim is the DENSE twin of the conv routing
    knob: the same weights with every dense layer on the int8 MXU
    (min_dim=0, the default), only sub-513-wide heads on bf16 (513), and
    all dense on bf16 (10^9) must agree on the same ap_fixed grid — the
    guarantee that made scripts/exp_int8_dense_routing.json a legal
    speed-only sweep (measured a wash in-model; knob retained for other
    chips/shapes)."""
    import dataclasses

    import jax
    import numpy as np

    from bayestpu.core.config import BayesConfig
    from bayestpu.core.rng import BAYES_RNG
    from bayestpu.nn.zoo import get_model

    base = QuantConfig(total_bits=8, integer_bits=0, int8_infer=True)
    bayes = BayesConfig(rate=0.25)
    x = jax.random.normal(key, (8, 32, 32, 3)) * 0.5
    outs = []
    vs = None
    for min_dim in (0, 513, 10 ** 9):
        q = dataclasses.replace(base, int8_dense_min_dim=min_dim)
        m = get_model("vgg11_me", bayes=bayes, quant=q, fused=True)
        if vs is None:
            vs = m.init({"params": key, BAYES_RNG: key}, x)
        outs.append(np.asarray(m.apply(
            vs, x, sample_idx=0, train=False,
            rngs={BAYES_RNG: key}).logits[-1]))
    for other in outs[1:]:
        np.testing.assert_allclose(outs[0], other, rtol=2e-3, atol=2e-3)
        assert (outs[0].argmax(-1) == other.argmax(-1)).mean() >= 7 / 8


def test_vgg_flagship_int8_agrees_with_fake_quant(key):
    """The FLAGSHIP int8 graph — raw-input entry conv (quant_input=False),
    deferred post-pool residency cast (BayesConv.defer_int8), int8 exit
    cascades — against the fake-quant float path on shared weights. All
    three round-5 dataflow changes are bit-exactness-preserving by
    construction (monotonic grid rounding commutes with max); this pins it
    at model level."""
    import jax
    import numpy as np

    from bayestpu.core.config import BayesConfig
    from bayestpu.core.rng import BAYES_RNG
    from bayestpu.nn.zoo import get_model

    cfg = QuantConfig(total_bits=8, integer_bits=0)
    cfg_i8 = QuantConfig(total_bits=8, integer_bits=0, int8_infer=True)
    bayes = BayesConfig(kind="mask", num_masks=4, scale=2.0)
    x = jax.random.normal(key, (8, 32, 32, 3)) * 0.5

    m_fq = get_model("vgg11_me", bayes=bayes, quant=cfg, fused=False)
    m_i8 = get_model("vgg11_me", bayes=bayes, quant=cfg_i8, fused=True)
    vs = m_fq.init({"params": key, BAYES_RNG: key}, x)

    for i in range(2):
        out_fq = m_fq.apply(vs, x, sample_idx=i, train=False,
                            rngs={BAYES_RNG: key}).logits
        out_i8 = m_i8.apply(vs, x, sample_idx=i, train=False,
                            rngs={BAYES_RNG: key}).logits
        a = np.asarray(out_fq[-1]).argmax(-1)
        b = np.asarray(out_i8[-1]).argmax(-1)
        assert (a == b).mean() >= 7 / 8, (a, b)


# ------------------------------------------------------- int8 residency

def _perturb_bn(vs, key):
    """Random BN params/stats so the inference-time fold is non-trivial."""
    import flax
    flat = flax.traverse_util.flatten_dict(vs)
    ks = iter(jax.random.split(key, len(flat)))
    out = {}
    for path, v in flat.items():
        if "bn" in path[-2:][0:1] or (len(path) >= 2 and path[-2] == "bn"):
            kk = next(ks)
            if path[-1] == "var":
                v = jax.random.uniform(kk, v.shape, minval=0.5, maxval=2.0)
            else:
                v = jax.random.normal(kk, v.shape) * 0.3 + (
                    1.0 if path[-1] == "scale" else 0.0)
        out[path] = v
    return flax.traverse_util.unflatten_dict(out)


def _residency_chain(residency: bool, bayes):
    """Two stacked ConvBN(+relu+QuantAct) layers; ``residency=True`` keeps
    the activation int8 layer-to-layer (requant fused in the conv epilogue),
    ``False`` recomputes the reference chain with f32 handoffs. Exact
    equality is the io_stream-residency acceptance criterion
    (≙ ap_fixed<8,0> streaming, hls4ml_build.py:69-71,103-110)."""
    import dataclasses

    import flax.linen as nn

    from bayestpu.core.quant import dequantize_int8, fake_quant
    from bayestpu.nn.layers import ConvBN

    q8 = QuantConfig(total_bits=8, integer_bits=2, int8_infer=True)

    class Chain(nn.Module):
        @nn.compact
        def __call__(self, x, *, sample_idx=0, train: bool = False):
            c1 = ConvBN(8, (3, 3), quant=q8, bayes=bayes, name="c1")
            c2 = ConvBN(8, (3, 3), quant=q8, name="c2")
            if residency:
                y = c1(x, train=train, sample_idx=sample_idx,
                       act="relu", act_quant=True)
                assert y.dtype == jnp.int8          # residency holds
                y = c2(y, train=train, act="relu", act_quant=True)
                assert y.dtype == jnp.int8
                return dequantize_int8(y, q8)
            uq = dataclasses.replace(q8, keep_negative=False)
            y = c1(x, train=train, sample_idx=sample_idx)   # f32 out
            y = fake_quant(nn.relu(y), uq)
            y = c2(y, train=train)
            return fake_quant(nn.relu(y), uq)

    return Chain()


def test_convbn_int8_residency_exact_mask(key):
    """int8 layer-to-layer residency == f32-handoff fake-quant chain,
    bitwise (same kernels, same grid; Masksembles bank is deterministic)."""
    from bayestpu.core.config import BayesConfig

    bayes = BayesConfig(kind="mask", num_masks=4, scale=2.0)
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (8, 12, 12, 8))
    m_res = _residency_chain(True, bayes)
    m_ref = _residency_chain(False, bayes)
    vs = m_ref.init({"params": k2}, x, train=True)
    vs = _perturb_bn(vs, k3)
    for i in range(4):
        a = m_res.apply(vs, x, sample_idx=i)
        b = m_ref.apply(vs, x, sample_idx=i)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_convbn_int8_residency_exact_mc(key):
    """Same, MC dropout: identical rng stream → identical in-kernel masks →
    exact equality incl. the 1/keep rescale folded into the output scalar."""
    from bayestpu.core.config import BayesConfig
    from bayestpu.core.rng import BAYES_RNG

    bayes = BayesConfig(kind="mc", rate=0.25)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x = jax.random.normal(k1, (4, 12, 12, 8))
    m_res = _residency_chain(True, bayes)
    m_ref = _residency_chain(False, bayes)
    vs = m_ref.init({"params": k2, BAYES_RNG: k2}, x, train=True)
    vs = _perturb_bn(vs, k3)
    a = m_res.apply(vs, x, rngs={BAYES_RNG: k4})
    b = m_ref.apply(vs, x, rngs={BAYES_RNG: k4})
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_vgg11_int8_residency_runs_and_agrees(key):
    """vgg11 with int8 residency (fused, act folded) agrees with the
    fake-quant float reference on predictions — the model-level acceptance
    check for VERDICT r2 item 1 (int8 as the fast point, not just a
    capability point)."""
    from bayestpu.core.config import BayesConfig
    from bayestpu.core.rng import BAYES_RNG
    from bayestpu.nn.zoo import get_model

    cfg = QuantConfig(total_bits=8, integer_bits=0)
    cfg_i8 = QuantConfig(total_bits=8, integer_bits=0, int8_infer=True)
    bayes = BayesConfig(kind="mask", num_masks=4, scale=2.0)
    x = jax.random.normal(key, (8, 32, 32, 3)) * 0.4

    m_fq = get_model("vgg11", bayes=bayes, quant=cfg, fused=False)
    m_i8 = get_model("vgg11", bayes=bayes, quant=cfg_i8, fused=True)
    vs = m_fq.init({"params": key, BAYES_RNG: key}, x, train=True)
    out_fq = m_fq.apply(vs, x, sample_idx=1, rngs={BAYES_RNG: key}).logits
    out_i8 = m_i8.apply(vs, x, sample_idx=1, rngs={BAYES_RNG: key}).logits
    a = np.asarray(out_fq[-1])
    b = np.asarray(out_i8[-1])
    # both paths live on the same ap_fixed<8,0> grid (step 2^-7); fused vs
    # unfused differ only in f32 summation order, which can move a value
    # across one rounding boundary per layer — bound the cascade at a few
    # grid steps and require the logits to be essentially the same surface
    step = 2.0 ** -7
    assert np.abs(a - b).max() <= 3 * step, np.abs(a - b).max()
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.98


def test_int8_input_without_quant_raises():
    """An int8-residency tensor reaching a quant=None layer must fail with
    a clear error, not an AttributeError inside int8_step (ADVICE r3)."""
    import pytest

    from bayestpu.nn.fused import BayesDense

    x8 = jnp.zeros((4, 16), jnp.int8)
    with pytest.raises((ValueError, TypeError), match="quant"):
        Dense(8).init(jax.random.key(0), x8)
    with pytest.raises((ValueError, TypeError), match="quant"):
        BayesDense(8).init(jax.random.key(0), x8)
    x8c = jnp.zeros((2, 8, 8, 4), jnp.int8)
    with pytest.raises((ValueError, TypeError), match="quant"):
        Conv(8, (3, 3)).init(jax.random.key(0), x8c)

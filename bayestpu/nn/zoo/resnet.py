"""ResNet family: ResNet-18 multi-exit Bayesian variants + ResNet-20.

Mirrors ``Software_Artifact/software/models/resnet18/resnet18.py``:

- CIFAR stem: 3×3 s1 conv + BN, **no relu before stage 1** (``:144``:
  ``out = self.bn1(self.conv1(x))``).
- 4 stages of BasicBlocks [2,2,2,2] at 64/128/256/512.
- Early exits after stages 1/2/3 with cascades of stride-2 conv+BN bringing
  channels to 512, then ``avg_pool(relu, 4)`` → linear (``:102-118,144-180``).
- Dropout placement options (``ResNet18MC``/``ResNet18MCEarlyExit``,
  ``:212-346``): ``dropout_exit`` puts a Bayesian site right before each
  exit's linear head; ``dropout='block'`` appends a 2D site after stages
  1..3; ``dropout='layer'`` after every BasicBlock except the very last.
- ``mask_type`` MCD vs Masksembles dispatch becomes ``BayesConfig.kind``.

Also ``ResNet20`` — the HW artifact's CIFAR model
(``Hardware_Artifact/bayes_hw/models/qmodels.py:163-230``
``QResNet20ForCIFAR10``): 3 stages × 3 blocks at 16/32/64 with fused
conv+BN (our ``ConvBN`` with ``quant``).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

import dataclasses

from bayestpu.core.config import BayesConfig, DropoutKind, QuantConfig
from bayestpu.core.rng import BAYES_RNG
from bayestpu.nn.bayes import BayesSite
from bayestpu.nn.fused import BayesDense
from bayestpu.nn.layers import ConvBN, Dense, avg_pool
from bayestpu.nn.multiexit import ExitOutputs, stack_exits
from bayestpu.nn.zoo.registry import register_model

# torch Conv2d(k=3, padding=1) pads symmetrically; XLA "SAME" pads (0, 1)
# for stride 2 — explicit padding keeps stride-2 convs aligned with the
# reference's torch models (golden parity, tests/test_reference_golden.py)
_P3 = ((1, 1), (1, 1))


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    quant: QuantConfig | None = None
    dtype: jnp.dtype = jnp.float32
    # Bayesian site on the block INPUT, fused into convbn1's Pallas kernel
    # (set by ResNet18 for 'block'/'layer' sites when fused and single-exit;
    # stride-2 sites ride the kernel's phase decomposition). NOTE: the
    # residual branch must see the SAME masked input, so fusion is only
    # valid when the caller also masks the residual path — ResNet18 keeps
    # bayes_in for blocks whose residual is identity-free (downsample), and
    # passes the same site to the downsample conv.
    bayes_in: "BayesConfig | None" = None

    @nn.compact
    def __call__(self, x: jax.Array, *, sample_idx=0, train: bool = False,
                 site_seeds=None) -> jax.Array:
        residual = x
        # the inter-conv relu folds into convbn1's kernel epilogue at
        # inference (the post-add relus can't — the residual join is the
        # consumer)
        y = ConvBN(self.planes, (3, 3), (self.stride, self.stride),
                   padding=_P3, quant=self.quant, dtype=self.dtype,
                   bayes=self.bayes_in, name="convbn1")(
            x, train=train, sample_idx=sample_idx, act="relu",
            seeds=site_seeds)
        y = ConvBN(self.planes, (3, 3), padding=_P3, quant=self.quant,
                   dtype=self.dtype, name="convbn2")(y, train=train)
        has_projection = self.stride != 1 or x.shape[-1] != self.planes
        if (self.bayes_in is not None
                and self.bayes_in.kind is not DropoutKind.NONE
                and not has_projection):
            # identity residual would bypass the mask — the single-site
            # invariant is structural, not a caller convention (ADVICE r3)
            raise ValueError(
                "bayes_in on an identity BasicBlock: the residual path "
                "would bypass the Bayesian mask; only projection blocks "
                "(stride!=1 or channel change) accept a fused input site")
        if has_projection:
            # same site, same seeds: the projection path sees the identical
            # mask the main path saw (single-site semantics preserved)
            residual = ConvBN(self.planes, (1, 1),
                              (self.stride, self.stride), quant=self.quant,
                              dtype=self.dtype, bayes=self.bayes_in,
                              name="downsample")(
                x, train=train, sample_idx=sample_idx, seeds=site_seeds)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    """1×1 → 3×3 → 1×1 bottleneck (expansion 4) — the reference keeps a
    Bottleneck twin of BasicBlock (``resnet18.py:48-85``) and the autobayes
    zoo builds ResNet50 from it (``autobayes/models/ResNet.py:100-127``)."""

    planes: int
    stride: int = 1
    expansion: int = 4
    quant: QuantConfig | None = None
    dtype: jnp.dtype = jnp.float32
    bayes_in: "BayesConfig | None" = None   # see BasicBlock.bayes_in

    @nn.compact
    def __call__(self, x: jax.Array, *, sample_idx=0, train: bool = False,
                 site_seeds=None) -> jax.Array:
        out_ch = self.planes * self.expansion
        residual = x
        y = ConvBN(self.planes, (1, 1), quant=self.quant, dtype=self.dtype,
                   bayes=self.bayes_in, name="convbn1")(
            x, train=train, sample_idx=sample_idx, act="relu",
            seeds=site_seeds)
        y = ConvBN(self.planes, (3, 3), (self.stride, self.stride),
                   padding=_P3, quant=self.quant, dtype=self.dtype,
                   name="convbn2")(y, train=train, act="relu")
        y = ConvBN(out_ch, (1, 1), quant=self.quant, dtype=self.dtype,
                   name="convbn3")(y, train=train)
        has_projection = self.stride != 1 or x.shape[-1] != out_ch
        if (self.bayes_in is not None
                and self.bayes_in.kind is not DropoutKind.NONE
                and not has_projection):
            raise ValueError(
                "bayes_in on an identity Bottleneck: the residual path "
                "would bypass the Bayesian mask; only projection blocks "
                "accept a fused input site")
        if has_projection:
            residual = ConvBN(out_ch, (1, 1), (self.stride, self.stride),
                              quant=self.quant, dtype=self.dtype,
                              bayes=self.bayes_in, name="downsample")(
                x, train=train, sample_idx=sample_idx, seeds=site_seeds)
        return nn.relu(y + residual)


class _ExitHead(nn.Module):
    """Stride-2 conv cascade to 512ch + avgpool + (site) + linear
    (``resnet18.py:102-118``)."""

    channels: Sequence[int]     # e.g. (128, 256, 512) for exit 1
    num_classes: int
    bayes: BayesConfig | None   # site before linear when dropout_exit
    quant: QuantConfig | None = None
    dtype: jnp.dtype = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, *, sample_idx=0, train: bool = False
                 ) -> tuple[jax.Array, jax.Array]:
        y = nn.relu(x)
        for i, ch in enumerate(self.channels):
            # every cascade conv is followed by relu — fold it (plus the
            # QuantAct grid under quant) into the conv epilogue, exactly
            # like the vgg exit heads (round 5): one HBM store per conv,
            # int8 residency through the cascade. Identical float values
            # (relu position unchanged).
            y = ConvBN(ch, (3, 3), (2, 2), padding=_P3, quant=self.quant,
                       dtype=self.dtype, name=f"convbn{i + 1}")(
                y, train=train, act="relu", act_quant=True)
        if y.dtype == jnp.int8:
            # avg_pool leaves the grid; exact dequant before it
            from bayestpu.core.quant import dequantize_int8
            y = dequantize_int8(y, self.quant)
        y = avg_pool(y, min(4, y.shape[1]))
        feat = y.reshape((y.shape[0], -1))
        head_bayes = self.bayes if self.bayes is not None else BayesConfig(
            kind=DropoutKind.NONE)
        logit = BayesDense(self.num_classes, bayes=head_bayes,
                           fused=self.fused, quant=self.quant,
                           dtype=self.dtype, name="linear")(
            feat, sample_idx=sample_idx, train=train)
        return logit, feat


class ResNet18(nn.Module):
    """ResNet-18 with {1,4} exits and configurable Bayesian sites."""

    bayes: BayesConfig = BayesConfig()
    num_classes: int = 100
    n_exits: int = 4
    dropout_exit: bool = True
    dropout: str | None = None       # None | "block" | "layer"
    stage_blocks: Sequence[int] = (2, 2, 2, 2)
    stage_planes: Sequence[int] = (64, 128, 256, 512)
    block: str = "basic"             # "basic" | "bottleneck"
    quant: QuantConfig | None = None
    dtype: jnp.dtype = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, *, sample_idx=0, train: bool = False
                 ) -> ExitOutputs:
        q, dt = self.quant, self.dtype
        n_stages = len(self.stage_blocks)
        site_kw = dict(sample_idx=sample_idx, train=train)

        # stem consumes the RAW input — the reference's first conv has no
        # input quantizer (see BayesConv.quant_input)
        out = ConvBN(self.stage_planes[0], (3, 3), padding=_P3, quant=q,
                     dtype=dt, quant_input=False, name="stem")(x, train=train)

        exits: list[jax.Array] = []
        feats: list[jax.Array] = []
        # Single-exit fused models defer a stage-boundary site into the NEXT
        # stage's first (projection) block: both its main-path stride-2 conv
        # and its 1×1 projection conv apply the SAME mask in-kernel (shared
        # seeds / shared bank), so the site never materializes in HBM — the
        # strided-site fusion the reference synthesizes on-fabric
        # (``t_qmodels_bayes.py:54-79``). With exits the site output feeds
        # the exit head too and must stay materialized; identity blocks
        # (no projection) would leave the residual unmasked, so in-stage
        # 'layer' sites stay materialized as well.
        can_defer = self.fused and self.n_exits == 1
        pending: BayesConfig | None = None
        for s in range(n_stages):
            block_cls = BasicBlock if self.block == "basic" else Bottleneck
            for b in range(self.stage_blocks[s]):
                stride = 2 if (s > 0 and b == 0) else 1
                seeds = None
                if pending is not None and pending.kind is DropoutKind.MC:
                    k = self.make_rng(BAYES_RNG)
                    seeds = jax.random.key_data(k).astype(
                        jnp.int32).reshape(-1)[:2]
                out = block_cls(self.stage_planes[s], stride, quant=q,
                                dtype=dt, bayes_in=pending,
                                name=f"layer{s + 1}_{b}")(
                    out, sample_idx=sample_idx, train=train,
                    site_seeds=seeds)
                pending = None
                is_very_last = (s == n_stages - 1 and
                                b == self.stage_blocks[s] - 1)
                last_in_stage = b == self.stage_blocks[s] - 1
                if self.dropout == "layer" and not is_very_last:
                    if can_defer and last_in_stage:
                        pending = self.bayes
                    else:
                        out = BayesSite(self.bayes,
                                        name=f"bayes_l{s + 1}_{b}")(
                            out, **site_kw)
            if self.dropout == "block" and s < n_stages - 1:
                if can_defer:
                    pending = self.bayes
                else:
                    out = BayesSite(self.bayes, name=f"bayes_s{s + 1}")(
                        out, **site_kw)
            if self.n_exits > 1 and s < n_stages - 1:
                chans = tuple(self.stage_planes[s + 1:])
                logit, feat = _ExitHead(
                    chans, self.num_classes,
                    self.bayes if self.dropout_exit else None,
                    quant=q, dtype=dt, fused=self.fused,
                    name=f"exit{s + 1}")(out, **site_kw)
                exits.append(logit)
                feats.append(feat)

        out = avg_pool(nn.relu(out), min(4, out.shape[1]))
        feat = out.reshape((out.shape[0], -1))
        final_bayes = self.bayes if self.dropout_exit else dataclasses.replace(
            self.bayes, kind=DropoutKind.NONE)
        final = BayesDense(self.num_classes, bayes=final_bayes,
                           fused=self.fused, quant=q, dtype=dt,
                           name="linear")(
            feat, **site_kw)
        exits.append(final)
        feats.append(feat)
        # feature dims differ per exit only via spatial pooling; they all end
        # at 512 for the default config so stacking is well-defined.
        try:
            return stack_exits(exits, feats)
        except (ValueError, TypeError):
            return stack_exits(exits)


@register_model("resnet18")
def build_resnet18(**kw) -> ResNet18:
    kw.setdefault("n_exits", 1)
    kw.setdefault("dropout_exit", False)
    return ResNet18(**kw)


@register_model("resnet18_me")
def build_resnet18_me(**kw) -> ResNet18:
    kw.setdefault("n_exits", 4)
    return ResNet18(**kw)


@register_model("resnet50")
def build_resnet50(**kw) -> ResNet18:
    """ResNet-50 (Bottleneck [3,4,6,3]; ≙ ``autobayes/models/ResNet.py:107``)."""
    kw.setdefault("block", "bottleneck")
    kw.setdefault("stage_blocks", (3, 4, 6, 3))
    kw.setdefault("n_exits", 1)
    kw.setdefault("dropout_exit", True)
    return ResNet18(**kw)


@register_model("resnet20")
def build_resnet20(**kw) -> ResNet18:
    """CIFAR ResNet-20 (HW artifact family, ``qmodels.py:210-230``)."""
    kw.setdefault("stage_blocks", (3, 3, 3))
    kw.setdefault("stage_planes", (16, 32, 64))
    kw.setdefault("n_exits", 1)
    kw.setdefault("dropout_exit", True)
    kw.setdefault("num_classes", 10)
    return ResNet18(**kw)

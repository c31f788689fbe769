"""VGG family: VGG-11/16/19 with Bayesian and multi-exit variants.

Mirrors both reference zoos:

- SW ``VGG19`` (cfg-E with BN, 5 conv blocks; classifier for 32×32 inputs is
  a single Linear(512, classes) with an optional Bayesian site before it) —
  ``Software_Artifact/software/models/vgg19/vgg19.py:121-192``.
- SW ``VGG19EarlyExit``: exits after blocks 1-4 through stride-2 conv+BN
  cascades to 512 channels, avg_pool(2), classifier; final exit is the full
  backbone (``vgg19.py:256-324``). ``VGG19MCEarlyExit`` adds sites before
  each exit classifier and optionally after every block (``:327-382``).
- HW ``QVGG11``: fused conv+BN blocks [f,2f,4f,4f,8f,8f,8f,8f] with pools
  after blocks 1,2,4,6,8 and a dense(512)+BN+relu → dense(512)+relu →
  dense(10) head (``Hardware_Artifact/bayes_hw/models/qmodels.py:236-354``)
  — reproduced here as ``vgg11`` with ``fused_bn=True`` semantics (our
  ``ConvBN`` always folds at inference).
- HW ``T_QVGG11_bayes_me``: a 2nd exit from a strided conv mid-net
  (``t_qmodels_bayes_me.py:359-375``) — the ``vgg11_me`` builder.

Block configs use the torchvision convention: int = conv channels,
'M' = 2×2 max-pool.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

import dataclasses

from bayestpu.core.config import BayesConfig, DropoutKind, QuantConfig
from bayestpu.nn.bayes import BayesSite
from bayestpu.nn.fused import BayesDense
from bayestpu.nn.layers import ConvBN, Dense, QuantAct, avg_pool, max_pool
from bayestpu.nn.multiexit import ExitOutputs, stack_exits
from bayestpu.nn.zoo.registry import register_model

CFGS: dict[str, list] = {
    # vgg11/16/19 block structure (vgg19.py:187 for E; qmodels.py for 11)
    "vgg11": [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "vgg16": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M"],
    "vgg19": [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"],
}


# batch-chunk size past the XLA conv→pool fusion cliff (see _VGGBlock;
# referenced by the build report so the documented mapping tracks the code)
ENTRY_BATCH_CHUNK = 256


def _blocks_of(cfg: list) -> list[list[int]]:
    blocks, cur = [], []
    for v in cfg:
        if v == "M":
            blocks.append(cur)
            cur = []
        else:
            cur.append(v)
    if cur:
        blocks.append(cur)
    return blocks


class _VGGBlock(nn.Module):
    channels: Sequence[int]
    quant: QuantConfig | None = None
    dtype: jnp.dtype = jnp.float32
    # Bayesian site on the block INPUT, fused into the first conv's Pallas
    # kernel (set by VGG when dropout="block" and fused=True)
    bayes_in: BayesConfig | None = None
    # False on block 0: its first conv is the model ENTRY and consumes the
    # raw input (see BayesConv.quant_input)
    quant_input: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, *, sample_idx=0, train: bool = False
                 ) -> jax.Array:
        n = len(self.channels)
        # construct each submodule ONCE (flax names are single-creation);
        # body() may then call them several times with shared params
        convs = [ConvBN(ch, (3, 3), quant=self.quant, dtype=self.dtype,
                        bayes=self.bayes_in if i == 0 else None,
                        quant_input=self.quant_input if i == 0 else True,
                        name=f"convbn{i}")
                 for i, ch in enumerate(self.channels)]

        def body(xb: jax.Array) -> jax.Array:
            for i, conv in enumerate(convs):
                # relu + QuantAct fold into the conv's fused epilogue at
                # inference (one HBM store per layer; int8 mode emits int8
                # so activations stay on the ap_fixed grid block-to-block —
                # the io_stream residency dataflow). QuantAct held no
                # params, so the param tree is unchanged. The LAST conv
                # defers the int8 cast past the max_pool (bit-exact — max
                # commutes with the grid rounding; BayesConv.defer_int8).
                xb = conv(xb, train=train, sample_idx=sample_idx,
                          act="relu", act_quant=True,
                          defer_int8=(i == n - 1))
            xb = max_pool(xb, 2, 2)
            if (not train and self.quant is not None
                    and self.quant.int8_infer and xb.dtype != jnp.int8):
                # re-enter int8 residency after the pool (exact: the pooled
                # values are already on the grid)
                from bayestpu.core.quant import quantize_int8
                xb = quantize_int8(xb, self.quant)[0]
            return xb

        # XLA's conv→pool fusion falls off a cliff on the 32² entry shapes
        # at batch ≥ 512 (measured: the entry stage scales 2.62×
        # super-linearly from batch 256 to 1024 while every other stage is
        # ~1.0 — scripts/exp_batch_falloff.json; isolated, the fused chain
        # runs 0.46 ms at b1024 vs 0.21 ms as 4 × b256 chunks). Static
        # ≤256-row chunks keep the good fusion; each chunk calls the SAME
        # submodules, so params are shared and values are identical
        # (elementwise + per-row ops). Deterministic blocks only: masked
        # first convs key their in-kernel PRNG on the LOCAL batch
        # coordinate, so chunking would repeat mask rows.
        B, c = x.shape[0], ENTRY_BATCH_CHUNK
        if (not train and B >= 2 * c and B % c == 0 and x.shape[1] >= 32
                and self.bayes_in is None):
            return jnp.concatenate(
                [body(x[i:i + c]) for i in range(0, B, c)], axis=0)
        return body(x)


class _VGGExitHead(nn.Module):
    """Stride-2 ConvBN cascade + avgpool(2) + (site) + linear
    (``vgg19.py:259-291``)."""

    channels: Sequence[int]
    num_classes: int
    bayes: BayesConfig | None
    quant: QuantConfig | None = None
    dtype: jnp.dtype = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, *, sample_idx=0, train: bool = False
                 ) -> tuple[jax.Array, jax.Array]:
        y = nn.relu(x)
        for i, ch in enumerate(self.channels):
            # relu (+ QuantAct grid under quant) folds into each cascade
            # conv's epilogue, exactly like the backbone blocks: one HBM
            # store per conv, int8 residency through the cascade (VERDICT
            # r4 item 1b: the exit cascades were the remaining quant
            # boundary — they ran float with an UNquantized relu, diverging
            # from the reference's quantized_relu-after-every-conv HW
            # models, ``t_qmodels_bayes_me.py:359-375``).
            y = ConvBN(ch, (3, 3), (2, 2), padding=((1, 1), (1, 1)),
                       quant=self.quant,
                       dtype=self.dtype, name=f"convbn{i + 1}")(
                y, train=train, act="relu", act_quant=True)
        if y.dtype == jnp.int8:
            # avg_pool leaves the grid; exact dequant before it
            from bayestpu.core.quant import dequantize_int8
            y = dequantize_int8(y, self.quant)
        if y.shape[1] > 1:
            y = avg_pool(y, 2)
        feat = y.reshape((y.shape[0], -1))
        head_bayes = self.bayes if self.bayes is not None else BayesConfig(
            kind=DropoutKind.NONE)
        logit = BayesDense(self.num_classes, bayes=head_bayes,
                           fused=self.fused, quant=self.quant,
                           dtype=self.dtype, name="linear")(
            feat, sample_idx=sample_idx, train=train)
        return logit, feat


class VGG(nn.Module):
    """Generic multi-exit Bayesian VGG over a block config."""

    cfg_name: str = "vgg19"
    bayes: BayesConfig = BayesConfig()
    num_classes: int = 100
    n_exits: int = 1                 # 1 or (num_blocks) for all-exit
    dropout_exit: bool = False       # site before each exit classifier
    dropout: str | None = None       # None | "block": site after each block
    head_dims: Sequence[int] = ()    # extra dense widths before classifier
    head_sites: bool = False         # Bayesian site after each hidden dense
    #                                  (≙ make_classifier's MCDropout /
    #                                  Masksembles1D between the 4096-wide
    #                                  FCs at image_size 224, vgg19.py:146-170)
    quant: QuantConfig | None = None
    dtype: jnp.dtype = jnp.float32
    fused: bool = False
    # Per-layer-NAME precision overrides — the hls4ml config is per-layer
    # granular (``hls4ml_build.py:74,88-100``: granularity='name' +
    # per-LayerName Precision). Consulted keys (exactly these — ADVICE r4
    # low: other keys are silently ignored): "block{i}" (whole conv block),
    # "fc_{j}", "fc_{j}/bias" (bias grid only — the reference's 2×-bits
    # fc_0 head, ``s_qmodels_bayes.py:294-296``), "fc_relu_{j}",
    # "classifier". Values replace the model-wide ``quant`` for that layer.
    quant_overrides: "dict[str, QuantConfig] | None" = None

    def _q(self, name: str) -> QuantConfig | None:
        if self.quant_overrides is None:
            return self.quant
        return self.quant_overrides.get(name, self.quant)

    @nn.compact
    def __call__(self, x: jax.Array, *, sample_idx=0, train: bool = False
                 ) -> ExitOutputs:
        blocks = _blocks_of(CFGS[self.cfg_name])
        n_blocks = len(blocks)
        q, dt = self.quant, self.dtype
        site_kw = dict(sample_idx=sample_idx, train=train)

        exits: list[jax.Array] = []
        feats: list[jax.Array] = []
        out = x
        # With fused=True and no early exits, a block-site's only consumer is
        # the NEXT block's first conv, so the mask fuses into that conv's
        # Pallas kernel (``BayesConv``). With exits the site output feeds the
        # exit head too, so the site must stay materialized.
        pending_site: BayesConfig | None = None
        for i, chans in enumerate(blocks):
            out = _VGGBlock(chans, quant=self._q(f"block{i}"), dtype=dt,
                            bayes_in=pending_site,
                            quant_input=(i != 0),
                            name=f"block{i}")(
                out, sample_idx=sample_idx, train=train)
            pending_site = None
            if self.dropout == "block" and i < n_blocks - 1:
                if self.fused and self.n_exits == 1:
                    pending_site = self.bayes
                else:
                    if out.dtype == jnp.int8:
                        # a materialized site rescales by 1/keep — off-grid,
                        # so leave residency here (exact dequant)
                        from bayestpu.core.quant import dequantize_int8
                        out = dequantize_int8(out, q)
                    out = BayesSite(self.bayes, name=f"bayes_b{i}")(
                        out, **site_kw)
            if self.n_exits > 1 and i < n_blocks - 1:
                # cascade doubling channels up to 512 (vgg19.py:259-286)
                chain, c = [], blocks[i][-1]
                while c < 512:
                    c *= 2
                    chain.append(min(c, 512))
                logit, feat = _VGGExitHead(
                    chain, self.num_classes,
                    self.bayes if self.dropout_exit else None,
                    quant=q, dtype=dt, fused=self.fused,
                    name=f"exit{i + 1}")(out, **site_kw)
                exits.append(logit)
                feats.append(feat)

        out = out.reshape((out.shape[0], -1))
        if out.dtype == jnp.int8:
            # metrics consume features in f32; the head Dense keeps the int8
            # view (quantize_int8 passes int8 through)
            from bayestpu.core.quant import dequantize_int8
            feat = dequantize_int8(out, q)
        else:
            feat = out
        for j, width in enumerate(self.head_dims):
            # bias_quant only when EXPLICITLY overridden: Dense's
            # ``bias_quant or quant`` precedence means passing the model-wide
            # fallback here would override a whole-layer "fc_{j}" entry for
            # the bias (ADVICE r4 low) — None lets the bias inherit the
            # layer's effective quant.
            bq = (self.quant_overrides.get(f"fc_{j}/bias")
                  if self.quant_overrides
                  and f"fc_{j}/bias" in self.quant_overrides else None)
            out = Dense(width, quant=self._q(f"fc_{j}"),
                        bias_quant=bq,
                        dtype=dt, name=f"fc_{j}")(out)
            if j == 0:
                out = nn.BatchNorm(use_running_average=not train,
                                   name=f"fc_bn_{j}")(out)
            out = QuantAct(quant=self._q(f"fc_relu_{j}"),
                           name=f"fc_relu_{j}")(out)
            if self.head_sites:
                out = BayesSite(self.bayes, name=f"bayes_fc_{j}")(
                    out, **site_kw)
        final_bayes = self.bayes if self.dropout_exit else dataclasses.replace(
            self.bayes, kind=DropoutKind.NONE)
        final = BayesDense(self.num_classes, bayes=final_bayes,
                           fused=self.fused, quant=self._q("classifier"),
                           dtype=dt, name="classifier")(
            out, **site_kw)
        exits.append(final)
        feats.append(feat)
        try:
            return stack_exits(exits, feats)
        except (ValueError, TypeError):
            return stack_exits(exits)


def _mixed_head_overrides(kw: dict) -> None:
    """``mixed_head=True``: reproduce the reference's 2×-bits fc_0 head —
    bias at ``quantized_bits(2*tbit, ibit)`` and the following relu at
    ``quantized_relu(2*tbit)``, kernel at base bits
    (``qmodels.py:327-331`` / ``s_qmodels_bayes.py:294-298``)."""
    if not kw.pop("mixed_head", False):
        return
    q = kw.get("quant")
    if q is None:
        return
    import dataclasses as _dc
    q2 = _dc.replace(q, total_bits=2 * q.total_bits, int8_infer=False)
    ov = dict(kw.get("quant_overrides") or {})
    ov.setdefault("fc_0/bias", q2)
    ov.setdefault("fc_relu_0", q2)
    kw["quant_overrides"] = ov


@register_model("vgg11")
def build_vgg11(**kw) -> VGG:
    kw.setdefault("cfg_name", "vgg11")
    kw.setdefault("num_classes", 10)
    kw.setdefault("head_dims", (512, 512))   # qmodels.py:330-343 dense head
    kw.setdefault("dropout_exit", True)
    _mixed_head_overrides(kw)
    return VGG(**kw)


@register_model("vgg11_me")
def build_vgg11_me(**kw) -> VGG:
    kw.setdefault("cfg_name", "vgg11")
    kw.setdefault("num_classes", 10)
    kw.setdefault("head_dims", (512, 512))
    kw.setdefault("n_exits", 5)
    kw.setdefault("dropout_exit", True)
    _mixed_head_overrides(kw)
    return VGG(**kw)


@register_model("vgg16")
def build_vgg16(**kw) -> VGG:
    kw.setdefault("cfg_name", "vgg16")
    _mixed_head_overrides(kw)   # accepted on every vgg; no-op without fc_0
    return VGG(**kw)


@register_model("vgg19")
def build_vgg19(**kw) -> VGG:
    kw.setdefault("cfg_name", "vgg19")
    _mixed_head_overrides(kw)
    return VGG(**kw)


@register_model("vgg19_me")
def build_vgg19_me(**kw) -> VGG:
    kw.setdefault("cfg_name", "vgg19")
    kw.setdefault("n_exits", 5)
    kw.setdefault("dropout_exit", True)
    _mixed_head_overrides(kw)
    return VGG(**kw)

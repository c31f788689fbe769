"""One typed configuration system.

The reference spreads configuration over four overlapping mechanisms —
argparse CLIs, sacred config injection, ``call``-keyed nested dicts, and
hls4ml config dicts (SURVEY §5.6; e.g. ``Software_Artifact/software/main.py:15-34``,
``Hardware_Artifact/bayes_hw/train_qkeras_mcme.py:196-222``,
``Hardware_Artifact/bayes_hw/hls4ml_build.py:60-110``). Here everything is a
frozen dataclass: hashable (usable as a jit static argument), serializable,
and validated at construction.
"""

from __future__ import annotations

import dataclasses
import enum
import json
from typing import Any


class DropoutKind(str, enum.Enum):
    """Which Bayesian mask family a site uses.

    ``mc``   — Monte-Carlo dropout (ref ``converter/keras/MCDropout.py:10``).
    ``mask`` — Masksembles fixed mask bank (ref ``converter/keras/Masksembles.py:119``).
    ``none`` — deterministic (plain net).
    Mirrors the reference's ``--dropout_type {mc, mask}`` flag
    (``Hardware_Artifact/bayes_hw/train_qkeras_mcme.py:207``).
    """

    MC = "mc"
    MASK = "mask"
    NONE = "none"


class SamplingMode(str, enum.Enum):
    """How MC samples are mapped onto hardware.

    ``temporal`` — one instance re-run per sample (lax.scan); the TPU analogue
    of the reference's ``T_*`` models (``bayes_hw/models/t_qmodels_bayes.py``)
    and the host loop in ``hls4ml_pred.py:102``.
    ``spatial`` — all samples in one pass (vmap over the sample axis); the TPU
    analogue of the ``S_*`` replicated-head models
    (``bayes_hw/models/s_qmodels_bayes.py:68-94``).
    ``sharded`` — spatial, with the sample axis partitioned over a device mesh
    (no reference analogue; this framework's scale-out axis).
    ``auto`` — measure temporal vs spatial for the actual (model, batch, S)
    at compile time and use the winner — the measured analogue of the
    reference's hand-derived per-model Strategy/ReuseFactor tables
    (``Hardware_Artifact/bayes_hw/hls4ml_build.py:23-58,88-100``).
    """

    TEMPORAL = "temporal"
    SPATIAL = "spatial"
    SHARDED = "sharded"
    AUTO = "auto"


class InsertStrategy(str, enum.Enum):
    """Where Bayesian layers are inserted when converting a plain net.

    Mirrors ``strategy_fn = {default, last, full}`` in
    ``Hardware_Artifact/converter/keras/nn2bnn.py:148-150``.
    """

    DEFAULT = "default"  # before the last `num` Dense/Conv layers
    LAST = "last"        # before the first Dense after the last Conv
    FULL = "full"        # after every Dense/Conv


@dataclasses.dataclass(frozen=True)
class QuantConfig:
    """Fixed-point quantization operating point.

    Mirrors QKeras ``quantized_bits(total_bits, integer_bits, alpha=1)`` used
    throughout the reference HW models
    (``Hardware_Artifact/bayes_hw/models/t_qmodels_bayes.py:47-48``) and the
    hls4ml ``AP_RND``/``AP_SAT`` rounding config
    (``Hardware_Artifact/bayes_hw/hls4ml_build.py:69-71``). The paper operating
    point is 8 total bits / 0 integer bits.
    """

    total_bits: int = 8
    integer_bits: int = 0
    keep_negative: bool = True
    # AP_RND (round-half-up) vs round-to-nearest-even; AP_SAT saturation is
    # always applied.
    round_mode: str = "AP_RND"
    # Execute contractions as int8×int8→int32 on the MXU (requires
    # total_bits == 8). Numerically identical to the fake-quant float path.
    int8_infer: bool = False
    # Execution routing for int8-inference convs: in_ch > this threshold →
    # int8 MXU path; else the bf16 path on dequantized grid values
    # (identical ap_fixed-grid semantics — a pure speed knob, the analogue
    # of hls4ml's per-layer Strategy entries). Applies to int8-residency
    # inputs too (residency I/O is independent of execution dtype). An
    # explicit config field so routing sweeps vary a traced model
    # attribute rather than monkeypatch module state (ADVICE r4 medium).
    # Default 64 — measured on the v5e flagship (scripts/
    # exp_int8_routing.json, round 5): in_ch>64 beats in_ch>4 by 1.06×
    # (XLA's int8 conv lowering loses to bf16 below ~64 input channels at
    # these 16²-and-smaller spatial shapes), in_ch>128 gives it back, and
    # all-bf16 execution costs 0.76× — the int8 MXU is worth 1.32× where
    # channels are wide. First-layer image convs stay float regardless
    # (quant_input=False consumes the raw input).
    int8_conv_min_ch: int = 64
    # Route DETERMINISTIC int8 convs to the Pallas fused conv kernel
    # (conv_int8_fused) instead of XLA's int8 conv. Default False — XLA
    # keeps its surrounding fusions; flip per-experiment to measure (the
    # deterministic-bf16 equivalent measured 1.6× SLOWER in-model, see
    # nn.fused._det_conv_pallas — int8 may differ because XLA's int8 conv
    # lowering is weak at small in_ch).
    int8_det_pallas: bool = False
    # Execution routing for int8-inference DENSE layers (plain Dense and
    # BayesDense heads): in_features >= this threshold → int8 MXU path;
    # else bf16 on the same ap_fixed grid (semantics-identical speed knob,
    # same pattern as int8_conv_min_ch). Motivated by the per-stage
    # decomposition's head stage running 0.025 ms int8 vs 0.010 bf16
    # (scripts/exp_int8_decomp.json) — but the in-model sweep
    # (scripts/exp_int8_dense_routing.json, v5e flagship) measures routing
    # the 512-wide heads to bf16 as a WASH (1.000×, pair spread ±4%):
    # the head-stage delta is the masked Pallas matmuls + stage boundary,
    # not the dense int8 brackets. Default 0 = every dense int8.
    int8_dense_min_dim: int = 0

    def __post_init__(self) -> None:
        if self.total_bits < 2 or self.total_bits > 32:
            raise ValueError(f"total_bits out of range: {self.total_bits}")


@dataclasses.dataclass(frozen=True)
class BayesConfig:
    """Configuration of the Bayesian behaviour of a model.

    Collapses the reference's scattered flags: ``--dropout_type``,
    ``--dropout_rate``, ``--num_masks``, ``--scale``, ``--num_bayes_layer``,
    ``--mc_samples`` (``train_qkeras_mcme.py:205-222``) and the SW-side
    ``mc_dropout_passes`` (``software/train/hyperparameters.py:111-114``).
    """

    kind: DropoutKind = DropoutKind.MC
    rate: float = 0.25               # MCD drop probability
    num_masks: int = 4               # Masksembles: number of masks (n)
    scale: float = 2.0               # Masksembles: overlap scale (s)
    num_samples: int = 10            # MC forward passes / samples
    num_bayes_layers: int = 1        # how many Bayesian sites to insert
    strategy: InsertStrategy = InsertStrategy.DEFAULT

    def __post_init__(self) -> None:
        if not 0.0 <= self.rate < 1.0:
            raise ValueError(f"dropout rate must be in [0, 1): {self.rate}")
        if self.kind is DropoutKind.MASK and self.num_masks < 2:
            raise ValueError("Masksembles needs at least 2 masks")

    @property
    def effective_samples(self) -> int:
        """For Masksembles, a 'sample' is a mask index (ref
        ``hls4ml_pred.py:106-110`` loops mask_index 0..num_masks)."""
        return self.num_masks if self.kind is DropoutKind.MASK else self.num_samples


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """How the engine executes MC inference."""

    mode: SamplingMode = SamplingMode.SPATIAL
    # mesh axis names: data-parallel over batch, sample-parallel over MC axis
    data_axis: str = "data"
    sample_axis: str = "sample"
    # compute dtype on the MXU; params are kept fp32 and cast on use
    compute_dtype: str = "bfloat16"
    quant: QuantConfig | None = None


def to_json(cfg: Any) -> str:
    """Serialize any of the dataclass configs to JSON."""
    def default(o: Any):
        if dataclasses.is_dataclass(o):
            return dataclasses.asdict(o)
        if isinstance(o, enum.Enum):
            return o.value
        raise TypeError(type(o))
    return json.dumps(cfg, default=default, indent=2)

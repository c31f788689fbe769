"""Fixed-point quantization ops mirroring the QKeras/ap_fixed operating point.

The reference quantizes with QKeras ``quantized_bits(tbit, ibit, alpha=1)``
(``Hardware_Artifact/bayes_hw/models/t_qmodels_bayes.py:47-48``) and lowers to
``ap_fixed`` with ``AP_RND`` rounding + ``AP_SAT`` saturation
(``Hardware_Artifact/bayes_hw/hls4ml_build.py:69-71``). The paper operating
point is 8 total bits, 0 integer bits (``scripts/train_pred_eval/
train_pred_mnist_lenet_mcme.sh:1-2``).

Semantics implemented here (matching QKeras ``quantized_bits`` with
``alpha=1``, ``keep_negative=1``, ``symmetric=0``):

    step  = 2^(integer_bits - total_bits + 1)        # LSB weight
    q(x)  = clip(round(x / step), -2^(b-1), 2^(b-1)-1) * step

``AP_RND`` is round-half-away-from-zero toward +inf for positives (we use
round-half-away, the ap_fixed default behaviour observable at the 8-bit
operating point); ``AP_SAT`` is the clip. The straight-through estimator makes
the fake-quant differentiable for QAT, matching QKeras's STE.

The int8 *inference* path keeps weights/activations as int8 and contracts with
``lax.dot_general(..., preferred_element_type=int32)`` so XLA places the
matmul on the MXU's int8 path, rescaling once per output tile.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bayestpu.core.config import QuantConfig


def _round_ap_rnd(x: jax.Array) -> jax.Array:
    """AP_RND: round to nearest, ties away from zero (ap_fixed default RND)."""
    return jnp.trunc(x + jnp.where(x >= 0, 0.5, -0.5))


def fake_quant(x: jax.Array, cfg: QuantConfig) -> jax.Array:
    """Fake-quantize to the ``quantized_bits`` grid with a straight-through
    estimator (identity gradient), for quantization-aware training."""
    step = 2.0 ** (cfg.integer_bits - cfg.total_bits + 1)
    lo = -(2.0 ** (cfg.total_bits - 1)) if cfg.keep_negative else 0.0
    hi = 2.0 ** (cfg.total_bits - 1) - 1.0
    scaled = x / step
    r = _round_ap_rnd(scaled) if cfg.round_mode == "AP_RND" else jnp.round(scaled)
    q = jnp.clip(r, lo, hi) * step
    # straight-through estimator
    return x + jax.lax.stop_gradient(q - x)


def int8_step(cfg: QuantConfig) -> float:
    """The static LSB weight of the int8 ap_fixed grid (2^(ibits-7)).

    One step serves every activation/weight tensor in a model because the
    reference's quantizers are static ``quantized_bits(tbit, ibit, alpha=1)``
    grids, not data-dependent scales — which is what makes layer-to-layer
    int8 residency a pure dataflow change (``hls4ml_build.py:69-71``)."""
    if cfg.total_bits != 8:
        raise ValueError("int8 path requires total_bits == 8")
    return 2.0 ** (cfg.integer_bits - 7)


def quantize_int8(x: jax.Array, cfg: QuantConfig) -> tuple[jax.Array, float]:
    """Quantize to an int8 tensor + static scale on the ap_fixed grid.

    Returns ``(values_int8, step)`` with ``x ≈ values * step``. Requires
    ``total_bits == 8``. An already-int8 input is passed through (it is by
    construction on the grid — the residency fast path).
    """
    step = int8_step(cfg)
    if x.dtype == jnp.int8:
        return x, step
    q = jnp.clip(_round_ap_rnd(x / step), -128, 127).astype(jnp.int8)
    return q, step


def dequantize_int8(x: jax.Array, cfg: QuantConfig,
                    dtype=jnp.float32) -> jax.Array:
    """int8-on-grid → float (exact; every grid point is f32-representable)."""
    return x.astype(dtype) * int8_step(cfg)


def int8_matmul(x_q: jax.Array, w_q: jax.Array, x_step: float, w_step: float,
                out_dtype=jnp.float32) -> jax.Array:
    """int8 × int8 → int32 matmul with a single output rescale.

    TPU-native replacement for the reference's per-layer ap_fixed MAC arrays
    (Strategy/ReuseFactor tables in ``hls4ml_build.py:23-58``): the MXU does
    the int8 contraction at full rate; the rescale fuses into the epilogue.
    """
    acc = jax.lax.dot_general(
        x_q, w_q,
        dimension_numbers=(((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(out_dtype)) * (x_step * w_step)


def dequantize(x_q: jax.Array, step: float, dtype=jnp.float32) -> jax.Array:
    return x_q.astype(dtype) * step

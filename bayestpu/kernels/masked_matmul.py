"""Pallas TPU kernels: matmul with fused dropout-mask generation.

The reference's hls4ml fork implements dropout as an HLS layer with an
on-fabric RNG applied at inference (SURVEY §2.9: dropout layers survive into
the HLS graph; latency/LUTs scale with their count). The TPU-native
equivalent built here: the Bernoulli mask is generated *inside* the matmul
kernel from the on-core PRNG and applied to the activation tile in VMEM
registers — the mask never exists in HBM and costs no extra memory
bandwidth. This is the BASELINE.json north-star kernel ("dropout-mask
generation fused into Pallas matmul/conv kernels — on-the-fly PRNG masking,
no HBM mask tensors").

Two mask sources, one kernel family (the unification noted in
``bayestpu.nn.bayes``):

- ``dropout_matmul(x, w, seeds, rate)`` — per-element Bernoulli keep mask
  from ``pltpu.prng_random_bits``, seeded per (m, k) grid tile so every
  output-column tile j sees the *same* mask for a given x element
  (correctness requirement: the mask is a property of x, not of the output
  tile).
- ``bank_matmul(x, w, bank, sample_idx)`` — Masksembles: the mask is row
  ``sample_idx`` of a fixed bank over the K (channel) axis, selected via
  scalar prefetch (``PrefetchScalarGridSpec``) — the analogue of the fork's
  ``predict(x, mask_index=i)`` (``Hardware_Artifact/bayes_hw/
  hls4ml_pred.py:109``).

Both carry a custom VJP that **regenerates** the mask from the same seeds in
the backward pass instead of saving it — the memory the HLS flow never
spends on masks, we don't spend either.

PRNG design: a counter-based integer hash (murmur3-style finalizer over the
global element index and a per-(seed, tile) stream constant) computed with
plain VPU ops — not ``pltpu.prng_random_bits``. Three reasons: (a) the mask
for element (r, c) is a pure function of (seeds, tile, r, c), so the VJP can
regenerate it exactly and any execution mapping (temporal, spatial, sharded,
re-tiled) reproduces it bit-for-bit; (b) the kernel runs identically in the
Pallas interpreter on CPU (the csim analogue — the TPU-side
``prng_random_bits`` has no CPU interpretation); (c) it costs ~10 integer
VPU ops per element, overlapped with the MXU dot. The keep decision is
``bits < keep_prob·2³²`` — Bernoulli(keep) exactly, bitwise different from
jax.random's threefry, so engine-vs-kernel parity tests are statistical +
structural (see ``tests/test_pallas_kernels.py``).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad_to(x: jax.Array, mults: Sequence[int]) -> jax.Array:
    pads = [(0, (-d) % m) for d, m in zip(x.shape, mults)]
    if any(p[1] for p in pads):
        return jnp.pad(x, pads)
    return x


def _keep_threshold(rate: float) -> int:
    # keep iff bits < keep_prob * 2^32  (uint32 compare)
    return min(int(round((1.0 - rate) * 2.0 ** 32)), 2 ** 32 - 1)


def _mix(x: jax.Array) -> jax.Array:
    """murmur3/triple32-style avalanche finalizer on uint32 lanes."""
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def _seed_stream(s0, s1) -> jax.Array:
    """Per-(seed pair) stream constant mixed into every element's counter."""
    return _mix(jnp.uint32(s0).astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
                ^ jnp.uint32(s1).astype(jnp.uint32) * jnp.uint32(0x85EBCA77)
                ^ jnp.uint32(0xC2B2AE35))


def _coord_bits(grow: jax.Array, gcol: jax.Array, stream: jax.Array
                ) -> jax.Array:
    """Uniform uint32 bits as a pure function of (stream, global row, global
    col) — the single PRNG used by every masked kernel (matmul and conv), so
    an element's mask is identical no matter which kernel family or tiling
    touches it."""
    x = _mix(grow * jnp.uint32(0x27D4EB2F) ^ gcol ^ stream)
    return _mix(x ^ (gcol * jnp.uint32(0x165667B1)))


def _tile_bits(shape: tuple[int, int], s0, s1, ti, tk,
               block_m: int, block_k: int) -> jax.Array:
    """Counter-based uniform uint32 bits for one (block_m, block_k) tile.

    The counter is the GLOBAL element position (tile ids × block sizes +
    in-tile iota), so the bit for an element does not depend on the tiling —
    re-blocking the kernel cannot change the mask.
    """
    rows = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    grow = jnp.uint32(ti) * jnp.uint32(block_m) + rows
    gcol = jnp.uint32(tk) * jnp.uint32(block_k) + cols
    return _coord_bits(grow, gcol, _seed_stream(s0, s1))


# ---------------------------------------------------------------- MC dropout


def _dropout_matmul_kernel(seed_ref, x_ref, w_ref, o_ref, acc_ref, *,
                           rate: float, nk: int, block_m: int, block_k: int):
    i, k = pl.program_id(0), pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Bits depend on (seeds, global element position) — independent of j so
    # the x mask is consistent across all output-column tiles.
    bits = _tile_bits(x_ref.shape, seed_ref[0, 0], seed_ref[0, 1], i, k,
                      block_m, block_k)
    keep = bits < jnp.uint32(_keep_threshold(rate))
    scale = 1.0 / (1.0 - rate)
    xm = jnp.where(keep, x_ref[:] * scale, 0.0)
    acc_ref[:] += jnp.dot(xm, w_ref[:], preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:]


def _dropout_mask_kernel(seed_ref, g_ref, o_ref, *, rate: float,
                         block_m: int, block_k: int):
    """Apply the SAME global mask to an (M, K) tensor — used by the VJP for
    dx = (g @ wᵀ) ⊙ mask / keep, regenerated instead of saved."""
    i, k = pl.program_id(0), pl.program_id(1)
    bits = _tile_bits(g_ref.shape, seed_ref[0, 0], seed_ref[0, 1], i, k,
                      block_m, block_k)
    keep = bits < jnp.uint32(_keep_threshold(rate))
    # f32 store regardless of input dtype: the out ref is f32, and a bf16
    # input (bf16 training path) would otherwise produce a bf16 value and
    # fail the VMEM swap with a dtype mismatch on TPU
    o_ref[:] = jnp.where(keep,
                         g_ref[:].astype(jnp.float32) * (1.0 / (1.0 - rate)),
                         0.0)


def _dropout_apply(x: jax.Array, seeds: jax.Array, rate: float,
                   block_m: int, block_k: int,
                   interpret: bool = False) -> jax.Array:
    """dropout(x) alone, via the same per-tile PRNG stream as the fused
    matmul (shared by the VJP and by consumers that need the masked
    activation itself, e.g. dw)."""
    m, k_dim = x.shape
    xp = _pad_to(x, (block_m, block_k))
    mp, kp = xp.shape
    # (1, 2) so that vmap-batched seeds keep a TPU-legal SMEM block shape
    seeds = jnp.reshape(seeds, (1, 2)).astype(jnp.int32)
    out = pl.pallas_call(
        functools.partial(_dropout_mask_kernel, rate=rate,
                          block_m=block_m, block_k=block_k),
        grid=(mp // block_m, kp // block_k),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_m, block_k), lambda i, k: (i, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_k), lambda i, k: (i, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, kp), jnp.float32),
        interpret=interpret,
    )(seeds, xp)
    return out[:m, :k_dim]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def dropout_matmul(x: jax.Array, w: jax.Array, seeds: jax.Array,
                   rate: float, block_m: int = 128, block_n: int = 128,
                   block_k: int = 128, interpret: bool = False) -> jax.Array:
    """``dropout(x) @ w`` with the Bernoulli mask fused into the kernel.

    x: (M, K) float32/bf16; w: (K, N); seeds: (2,) int32 (from
    ``bayestpu.core.rng.key_to_seeds``); rate: static drop probability.
    """
    return _dropout_matmul_fwd(x, w, seeds, rate, block_m, block_n, block_k,
                               interpret)[0]


def _align(v: int, mult: int) -> int:
    return -(-v // mult) * mult


def _auto_block_m(m: int, num_samples: int, block_n: int) -> int:
    """Row-block auto-sizing — the per-shape ReuseFactor analogue
    (``hls4ml_build.py:23-58`` derives per-layer ReuseFactors from layer
    dims; here the knob is the M tile of the masked matmul). Measured on
    v5e (``scripts/exp_small_tuning.json``): tall-skinny multi-sample
    matmuls (M=2560, N≤128) run 1.28× faster at block_m 512 than the old
    fixed 128 — fewer grid steps over the same mask stream (mask bits are
    keyed on GLOBAL coordinates, so block size never changes values).
    Capped so the (S, block_m, block_n) f32 accumulator + output block
    stay ≤ ~4 MiB of VMEM."""
    budget_rows = (4 << 20) // max(1, num_samples * block_n * 8)
    cap = max(128, min(512, (budget_rows // 128) * 128))
    return max(128, min(_align(m, 128), cap))


def _dropout_matmul_fwd(x, w, seeds, rate, block_m, block_n, block_k,
                        interpret):
    if rate == 0.0:
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
        return y, (x, w, seeds)
    m, k_dim = x.shape
    block_m = block_m or _auto_block_m(m, 1, block_n)
    k2, n = w.shape
    assert k_dim == k2, (x.shape, w.shape)
    xp = _pad_to(x, (block_m, block_k))
    wp = _pad_to(w, (block_k, block_n))
    mp, kp = xp.shape
    np_ = wp.shape[1]
    nk = kp // block_k
    seeds = jnp.reshape(seeds, (1, 2)).astype(jnp.int32)
    y = pl.pallas_call(
        functools.partial(_dropout_matmul_kernel, rate=rate, nk=nk,
                          block_m=block_m, block_k=block_k),
        grid=(mp // block_m, np_ // block_n, nk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=4 * (mp * kp + kp * np_ + mp * np_),
            transcendentals=0),
        interpret=interpret,
    )(seeds, xp, wp)
    return y[:m, :n], (x, w, seeds)


def _dropout_matmul_bwd(rate, block_m, block_n, block_k, interpret,
                        res, g):
    x, w, seeds = res
    # auto (0) resolves identically to the fwd: mask bits are keyed on
    # GLOBAL coordinates, so regeneration is block-size-independent anyway
    block_m = block_m or _auto_block_m(x.shape[0], 1, block_n)
    if rate == 0.0:
        return (g @ w.T, x.T @ g, None)
    # dx = (g @ wᵀ) ⊙ mask/keep — mask regenerated from the same seeds
    gx = jnp.dot(g, w.T, preferred_element_type=jnp.float32)
    dx = _dropout_apply(gx, seeds, rate, block_m, block_k, interpret)
    # dw = dropout(x)ᵀ @ g
    xm = _dropout_apply(x, seeds, rate, block_m, block_k, interpret)
    dw = jnp.dot(xm.T, g, preferred_element_type=jnp.float32)
    return dx.astype(x.dtype), dw.astype(w.dtype), None


dropout_matmul.defvjp(_dropout_matmul_fwd, _dropout_matmul_bwd)


# ---------------------------------------------------- multi-sample MC head
#
# The reference's spatial mapping replicates the post-dropout head
# ``mc_samples-1`` times on fabric so one pass yields every MC sample
# (``s_qmodels_bayes.py:86-94``) — all replicas read the SAME cached
# backbone activation. ``vmap`` gives the math but not the memory
# behaviour: each mapped instance re-reads x from HBM. This kernel is the
# true spatial analogue: one launch computes all S samples with each x
# tile fetched ONCE (x HBM traffic equal to a single matmul, S× less than
# vmap), looping samples in-registers against the resident tile. Seeds are
# per-sample, so output s is bit-identical to ``dropout_matmul(x, w,
# seeds[s], rate)`` — exact-parity-testable against the vmap path.


def _dropout_matmul_samples_kernel(seed_ref, x_ref, w_ref, o_ref, acc_ref, *,
                                   rate: float, num_samples: int, nk: int,
                                   block_m: int, block_k: int):
    i, k = pl.program_id(0), pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    w = w_ref[:]
    thresh = jnp.uint32(_keep_threshold(rate))
    scale = 1.0 / (1.0 - rate)

    def body(s, _):
        bits = _tile_bits(x.shape, seed_ref[s, 0], seed_ref[s, 1], i, k,
                          block_m, block_k)
        xm = jnp.where(bits < thresh, x * scale, 0.0)
        acc_ref[s] += jnp.dot(xm, w, preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, num_samples, body, 0, unroll=True)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:]


def dropout_matmul_samples(x: jax.Array, w: jax.Array, seeds: jax.Array,
                           rate: float, block_m: int = 0,
                           block_n: int = 128, block_k: int = 128,
                           interpret: bool = False) -> jax.Array:
    """All-samples fused MC head: ``stack([dropout_s(x) @ w for s in S])``.

    x: (M, K); w: (K, N); seeds: (S, 2) int32 — one PRNG stream per MC
    sample. Returns (S, M, N) float32 with row s bit-identical to
    ``dropout_matmul(x, w, seeds[s], rate)``. Inference path (no VJP) —
    training always draws one sample per step.

    VMEM: the accumulator is (S, block_m, block_n) f32 — S·64 KiB at the
    default blocks; keep S ≲ 32 per call (the ``*_inference`` vmap rules
    chunk at ``_SAMPLE_CHUNK`` and concatenate).
    """
    m, k_dim = x.shape
    n = w.shape[1]
    num_samples = seeds.shape[0]
    if rate == 0.0:
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
        return jnp.broadcast_to(y[None], (num_samples, m, n))
    block_m = block_m or _auto_block_m(m, num_samples, block_n)
    xp = _pad_to(x, (block_m, block_k))
    wp = _pad_to(w, (block_k, block_n))
    mp, kp = xp.shape
    np_ = wp.shape[1]
    nk = kp // block_k
    seeds = seeds.astype(jnp.int32)
    y = pl.pallas_call(
        functools.partial(_dropout_matmul_samples_kernel, rate=rate,
                          num_samples=num_samples, nk=nk,
                          block_m=block_m, block_k=block_k),
        grid=(mp // block_m, np_ // block_n, nk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((num_samples, block_m, block_n),
                               lambda i, j, k: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_samples, mp, np_), jnp.float32),
        scratch_shapes=[pltpu.VMEM((num_samples, block_m, block_n),
                                   jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * num_samples * mp * np_ * kp,
            bytes_accessed=4 * (mp * kp + kp * np_ + num_samples * mp * np_),
            transcendentals=0),
        interpret=interpret,
    )(seeds, xp, wp)
    return y[:, :m, :n]


# The engine's spatial mapping is ``vmap`` over per-sample keys
# (``engine/sampler.py``). A vmapped ``dropout_matmul`` becomes one Pallas
# call with a leading sample grid axis — correct, but each tiny head tile
# pays grid-step overhead per sample and x is re-streamed. This wrapper
# gives the inference path a custom batching rule: when ONLY the seeds
# carry the mapped axis (the engine's exact pattern — x and w are shared),
# ``vmap(dropout_matmul_inference)`` lowers to a single
# ``dropout_matmul_samples`` launch. Gradients don't flow through
# inference, so the custom_vjp path stays separate (custom_vmap does not
# compose with reverse-mode AD).


# Samples per multi-sample launch: bounds the (S, block_m, block_n) f32
# accumulator + output block at ~2·2 MiB of VMEM (32·64 KiB each).
_SAMPLE_CHUNK = 32


@functools.lru_cache(maxsize=None)
def _inference_vmapped(rate: float, block_m: int, block_n: int,
                       block_k: int, interpret: bool):
    @jax.custom_batching.custom_vmap
    def f(x, w, seeds):
        return dropout_matmul(x, w, seeds, rate, block_m, block_n, block_k,
                              interpret)

    @f.def_vmap
    def _rule(axis_size, in_batched, x, w, seeds):
        xb, wb, sb = in_batched
        if sb and not xb and not wb:
            seeds2 = seeds.reshape(axis_size, 2)
            outs = [dropout_matmul_samples(x, w, seeds2[i:i + _SAMPLE_CHUNK],
                                           rate, block_m, block_n, block_k,
                                           interpret)
                    for i in range(0, axis_size, _SAMPLE_CHUNK)]
            out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, 0)
            return out, True
        # generic fallback (e.g. batched activations): per-example map
        def one(i):
            return f(x[i] if xb else x, w[i] if wb else w,
                     seeds[i] if sb else seeds)
        return jax.lax.map(one, jnp.arange(axis_size)), True

    return f


def dropout_matmul_inference(x: jax.Array, w: jax.Array, seeds: jax.Array,
                             rate: float, block_m: int = 0,
                             block_n: int = 128, block_k: int = 128,
                             interpret: bool = False) -> jax.Array:
    """``dropout_matmul`` for the no-grad inference path: identical values,
    plus a vmap rule that collapses a sample-mapped call into one
    ``dropout_matmul_samples`` kernel launch. ``block_m=0`` auto-sizes the
    row tile per shape (``_auto_block_m``)."""
    if rate == 0.0:
        return jnp.dot(x, w, preferred_element_type=jnp.float32)
    return _inference_vmapped(rate, block_m, block_n, block_k, interpret)(
        x, w, seeds)


# ------------------------------------------------------- int8 MC dropout
#
# The paper's operating point is ap_fixed<8,0> arithmetic (BASELINE.md:
# ``--quant_tbit 8``); the FPGA does every masked MAC in 8-bit fabric
# logic. The TPU analogue is the MXU's int8 mode: keep x and w as int8
# in VMEM, mask the int8 activation tile in registers with the SAME
# counter-based PRNG stream as the float kernel (bit-identical keep
# decisions for equal seeds), accumulate int8×int8→int32 on the MXU, and
# fold dequantization *and* the 1/keep dropout rescale into one static
# scalar applied to the int32 accumulator at the final K step. Inference
# path only (PTQ — the reference also quantizes post/at training and
# never backprops through ap_fixed inference).


def _dropout_matmul_int8_kernel(seed_ref, x_ref, w_ref, o_ref, acc_ref, *,
                                rate: float, out_scale: float, nk: int,
                                block_m: int, block_k: int):
    i, k = pl.program_id(0), pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xm = x_ref[:]
    if rate > 0.0:
        bits = _tile_bits(x_ref.shape, seed_ref[0, 0], seed_ref[0, 1], i, k,
                          block_m, block_k)
        keep = bits < jnp.uint32(_keep_threshold(rate))
        xm = jnp.where(keep, xm, 0)
    acc_ref[:] += jax.lax.dot_general(
        xm, w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(jnp.float32) * out_scale


def dropout_matmul_int8(x_q: jax.Array, w_q: jax.Array, seeds: jax.Array,
                        rate: float, x_step: float, w_step: float,
                        block_m: int = 128, block_n: int = 128,
                        block_k: int = 128,
                        interpret: bool = False) -> jax.Array:
    """``dequant(dropout(x_q) @ w_q)`` fully in int8 on the MXU.

    x_q: (M, K) int8; w_q: (K, N) int8 (from ``core.quant.quantize_int8``);
    the Bernoulli keep mask is generated in-kernel from the same PRNG
    stream as ``dropout_matmul`` (bit-identical masks for equal seeds), so
    int8-vs-float parity is testable mask-exactly. Returns float32 (M, N)
    already rescaled by ``x_step·w_step/(1-rate)``.
    """
    m, k_dim = x_q.shape
    n = w_q.shape[1]
    assert x_q.dtype == jnp.int8 and w_q.dtype == jnp.int8
    # int8 VMEM tiles are (32, 128): block_m/block_k already multiples.
    xp = _pad_to(x_q, (block_m, block_k))
    wp = _pad_to(w_q, (block_k, block_n))
    mp, kp = xp.shape
    np_ = wp.shape[1]
    nk = kp // block_k
    out_scale = float(x_step) * float(w_step) / (1.0 - rate)
    seeds = jnp.reshape(seeds, (1, 2)).astype(jnp.int32)
    y = pl.pallas_call(
        functools.partial(_dropout_matmul_int8_kernel, rate=rate,
                          out_scale=out_scale, nk=nk,
                          block_m=block_m, block_k=block_k),
        grid=(mp // block_m, np_ // block_n, nk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp + kp * np_ + 4 * mp * np_,
            transcendentals=0),
        interpret=interpret,
    )(seeds, xp, wp)
    return y[:m, :n]


def _dropout_matmul_int8_samples_kernel(seed_ref, x_ref, w_ref, o_ref,
                                        acc_ref, *, rate: float,
                                        out_scale: float, num_samples: int,
                                        nk: int, block_m: int, block_k: int):
    i, k = pl.program_id(0), pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    w = w_ref[:]
    thresh = jnp.uint32(_keep_threshold(rate))

    def body(s, _):
        bits = _tile_bits(x.shape, seed_ref[s, 0], seed_ref[s, 1], i, k,
                          block_m, block_k)
        xm = jnp.where(bits < thresh, x, 0)
        acc_ref[s] += jax.lax.dot_general(
            xm, w, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return 0

    jax.lax.fori_loop(0, num_samples, body, 0, unroll=True)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(jnp.float32) * out_scale


def dropout_matmul_int8_samples(x_q: jax.Array, w_q: jax.Array,
                                seeds: jax.Array, rate: float,
                                x_step: float, w_step: float,
                                block_m: int = 128, block_n: int = 128,
                                block_k: int = 128,
                                interpret: bool = False) -> jax.Array:
    """All-samples int8 fused MC head: row s bit-identical to
    ``dropout_matmul_int8(x_q, w_q, seeds[s], ...)`` with the int8 x tile
    fetched once for all S samples (the 8-bit twin of
    ``dropout_matmul_samples``)."""
    m, _ = x_q.shape
    n = w_q.shape[1]
    num_samples = seeds.shape[0]
    xp = _pad_to(x_q, (block_m, block_k))
    wp = _pad_to(w_q, (block_k, block_n))
    mp, kp = xp.shape
    np_ = wp.shape[1]
    nk = kp // block_k
    out_scale = float(x_step) * float(w_step) / (1.0 - rate)
    y = pl.pallas_call(
        functools.partial(_dropout_matmul_int8_samples_kernel, rate=rate,
                          out_scale=out_scale, num_samples=num_samples,
                          nk=nk, block_m=block_m, block_k=block_k),
        grid=(mp // block_m, np_ // block_n, nk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((num_samples, block_m, block_n),
                               lambda i, j, k: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_samples, mp, np_), jnp.float32),
        scratch_shapes=[pltpu.VMEM((num_samples, block_m, block_n),
                                   jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * num_samples * mp * np_ * kp,
            bytes_accessed=mp * kp + kp * np_
            + 4 * num_samples * mp * np_,
            transcendentals=0),
        interpret=interpret,
    )(seeds.astype(jnp.int32), xp, wp)
    return y[:, :m, :n]


@functools.lru_cache(maxsize=None)
def _int8_inference_vmapped(rate: float, x_step: float, w_step: float,
                            block_m: int, block_n: int, block_k: int,
                            interpret: bool):
    @jax.custom_batching.custom_vmap
    def f(x_q, w_q, seeds):
        return dropout_matmul_int8(x_q, w_q, seeds, rate, x_step, w_step,
                                   block_m, block_n, block_k, interpret)

    @f.def_vmap
    def _rule(axis_size, in_batched, x_q, w_q, seeds):
        xb, wb, sb = in_batched
        if sb and not xb and not wb:
            seeds2 = seeds.reshape(axis_size, 2)
            outs = [dropout_matmul_int8_samples(
                x_q, w_q, seeds2[i:i + _SAMPLE_CHUNK], rate, x_step, w_step,
                block_m, block_n, block_k, interpret)
                for i in range(0, axis_size, _SAMPLE_CHUNK)]
            out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, 0)
            return out, True

        def one(i):
            return f(x_q[i] if xb else x_q, w_q[i] if wb else w_q,
                     seeds[i] if sb else seeds)
        return jax.lax.map(one, jnp.arange(axis_size)), True

    return f


def dropout_matmul_int8_inference(x_q: jax.Array, w_q: jax.Array,
                                  seeds: jax.Array, rate: float,
                                  x_step: float, w_step: float,
                                  block_m: int = 128, block_n: int = 128,
                                  block_k: int = 128,
                                  interpret: bool = False) -> jax.Array:
    """``dropout_matmul_int8`` with a vmap rule collapsing a seeds-mapped
    call into ``dropout_matmul_int8_samples`` launches."""
    return _int8_inference_vmapped(rate, float(x_step), float(w_step),
                                   block_m, block_n, block_k, interpret)(
        x_q, w_q, seeds)


def _bank_matmul_int8_samples_kernel(idx_ref, x_ref, w_ref, bank_ref, o_ref,
                                     acc_ref, *, out_scale: float,
                                     num_samples: int, nk: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    w = w_ref[:]
    rows = jax.lax.broadcasted_iota(jnp.int32, bank_ref.shape, 0)

    def body(s, _):
        sel = jnp.where(rows == idx_ref[s], bank_ref[:].astype(jnp.int32), 0)
        row = jnp.max(sel, axis=0, keepdims=True)
        xm = jnp.where(row > 0, x, 0)
        acc_ref[s] += jax.lax.dot_general(
            xm, w, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return 0

    jax.lax.fori_loop(0, num_samples, body, 0, unroll=True)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(jnp.float32) * out_scale


def bank_matmul_int8_samples(x_q: jax.Array, w_q: jax.Array,
                             bank: jax.Array, sample_idxs: jax.Array,
                             x_step: float, w_step: float,
                             block_m: int = 128, block_n: int = 128,
                             block_k: int = 128,
                             interpret: bool = False) -> jax.Array:
    """All-masks int8 fused Masksembles head (one launch per S mask
    indices, x fetched once)."""
    m, _ = x_q.shape
    n = w_q.shape[1]
    num_samples = sample_idxs.shape[0]
    xp = _pad_to(x_q, (block_m, block_k))
    wp = _pad_to(w_q, (block_k, block_n))
    bank_i8 = (bank > 0.5).astype(jnp.int8) if bank.dtype != jnp.int8 else bank
    bankp = _pad_to(bank_i8, (1, block_k))
    mp, kp = xp.shape
    np_ = wp.shape[1]
    nk = kp // block_k
    out_scale = float(x_step) * float(w_step)
    idxs = jnp.asarray(sample_idxs, jnp.int32) % bank.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(mp // block_m, np_ // block_n, nk),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, k, idx: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda i, j, k, idx: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bank.shape[0], block_k),
                         lambda i, j, k, idx: (0, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((num_samples, block_m, block_n),
                               lambda i, j, k, idx: (0, i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((num_samples, block_m, block_n),
                                   jnp.int32)],
    )
    y = pl.pallas_call(
        functools.partial(_bank_matmul_int8_samples_kernel,
                          out_scale=out_scale, num_samples=num_samples,
                          nk=nk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_samples, mp, np_), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(idxs, xp, wp, bankp)
    return y[:, :m, :n]


@functools.lru_cache(maxsize=None)
def _bank_int8_inference_vmapped(x_step: float, w_step: float, block_m: int,
                                 block_n: int, block_k: int,
                                 interpret: bool):
    @jax.custom_batching.custom_vmap
    def f(x_q, w_q, bank, sample_idx):
        return bank_matmul_int8(x_q, w_q, bank, sample_idx, x_step, w_step,
                                block_m, block_n, block_k, interpret)

    @f.def_vmap
    def _rule(axis_size, in_batched, x_q, w_q, bank, sample_idx):
        xb, wb, bb, ib = in_batched
        if ib and not (xb or wb or bb):
            idxs = sample_idx.reshape(axis_size)
            outs = [bank_matmul_int8_samples(
                x_q, w_q, bank, idxs[i:i + _SAMPLE_CHUNK], x_step, w_step,
                block_m, block_n, block_k, interpret)
                for i in range(0, axis_size, _SAMPLE_CHUNK)]
            out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, 0)
            return out, True

        def one(i):
            return f(x_q[i] if xb else x_q, w_q[i] if wb else w_q,
                     bank[i] if bb else bank,
                     sample_idx[i] if ib else sample_idx)
        return jax.lax.map(one, jnp.arange(axis_size)), True

    return f


def bank_matmul_int8_inference(x_q: jax.Array, w_q: jax.Array,
                               bank: jax.Array, sample_idx: jax.Array,
                               x_step: float, w_step: float,
                               block_m: int = 128, block_n: int = 128,
                               block_k: int = 128,
                               interpret: bool = False) -> jax.Array:
    """``bank_matmul_int8`` with the sample-index vmap collapse rule."""
    return _bank_int8_inference_vmapped(float(x_step), float(w_step),
                                        block_m, block_n, block_k,
                                        interpret)(x_q, w_q, bank, sample_idx)


def _bank_matmul_int8_kernel(idx_ref, x_ref, w_ref, bank_ref, o_ref,
                             acc_ref, *, out_scale: float, nk: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # int8 dynamic row slices need 4-row (sublane-packing) alignment on TPU;
    # select the bank row branchlessly instead: rows are {0,1} so a masked
    # max over the (tiny) mask axis extracts row idx exactly.
    rows = jax.lax.broadcasted_iota(jnp.int32, bank_ref.shape, 0)
    # int8 reductions aren't lowerable — widen the (tiny) bank to int32
    sel = jnp.where(rows == idx_ref[0], bank_ref[:].astype(jnp.int32), 0)
    row = jnp.max(sel, axis=0, keepdims=True)  # (1, block_k) int32 {0,1}
    xm = jnp.where(row > 0, x_ref[:], 0)
    acc_ref[:] += jax.lax.dot_general(
        xm, w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(jnp.float32) * out_scale


def bank_matmul_int8(x_q: jax.Array, w_q: jax.Array, bank: jax.Array,
                     sample_idx: jax.Array, x_step: float, w_step: float,
                     block_m: int = 128, block_n: int = 128,
                     block_k: int = 128,
                     interpret: bool = False) -> jax.Array:
    """Masksembles fused matmul on the int8 MXU path.

    ``dequant((x_q ⊙ bank[sample_idx]) @ w_q)`` — the binary mask bank is
    carried as int8 and the row picked by scalar prefetch, matching
    ``bank_matmul`` semantics at the 8-bit operating point.
    """
    m, k_dim = x_q.shape
    n = w_q.shape[1]
    xp = _pad_to(x_q, (block_m, block_k))
    wp = _pad_to(w_q, (block_k, block_n))
    bank_i8 = (bank > 0.5).astype(jnp.int8) if bank.dtype != jnp.int8 else bank
    bankp = _pad_to(bank_i8, (1, block_k))
    mp, kp = xp.shape
    np_ = wp.shape[1]
    nk = kp // block_k
    out_scale = float(x_step) * float(w_step)
    idx = jnp.asarray(sample_idx, jnp.int32).reshape((1,)) % bank.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(mp // block_m, np_ // block_n, nk),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, k, idx: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda i, j, k, idx: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bank.shape[0], block_k),
                         lambda i, j, k, idx: (0, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n),
                               lambda i, j, k, idx: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.int32)],
    )
    y = pl.pallas_call(
        functools.partial(_bank_matmul_int8_kernel, out_scale=out_scale,
                          nk=nk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(idx, xp, wp, bankp)
    return y[:m, :n]


# --------------------------------------------------------------- Masksembles


def _bank_matmul_kernel(idx_ref, x_ref, w_ref, bank_ref, o_ref, acc_ref, *,
                        nk: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # bank_ref block is (num_masks, block_k) — the whole (small) bank's k-th
    # chunk; the scalar-prefetched sample index selects the row in-kernel
    # (a (1, bk) VMEM block per row is not a legal TPU tile).
    row = bank_ref[pl.ds(idx_ref[0], 1), :]
    xm = x_ref[:] * row
    acc_ref[:] += jnp.dot(xm, w_ref[:], preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:]


def _bank_matmul_samples_kernel(idx_ref, x_ref, w_ref, bank_ref, o_ref,
                                acc_ref, *, num_samples: int, nk: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    w = w_ref[:]
    rows = jax.lax.broadcasted_iota(jnp.int32, bank_ref.shape, 0)

    def body(s, _):
        sel = jnp.where(rows == idx_ref[s], bank_ref[:], 0.0)
        row = jnp.max(sel, axis=0, keepdims=True)  # (1, block_k)
        acc_ref[s] += jnp.dot(x * row, w, preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, num_samples, body, 0, unroll=True)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:]


def bank_matmul_samples(x: jax.Array, w: jax.Array, bank: jax.Array,
                        sample_idxs: jax.Array, block_m: int = 128,
                        block_n: int = 128, block_k: int = 128,
                        interpret: bool = False) -> jax.Array:
    """All-masks fused Masksembles head: one launch computes
    ``(x ⊙ bank[idx_s]) @ w`` for every sample index, x tiles fetched once.
    Returns (S, M, N) float32 — row s equals ``bank_matmul(x, w, bank,
    sample_idxs[s])``."""
    m, _ = x.shape
    n = w.shape[1]
    num_samples = sample_idxs.shape[0]
    xp = _pad_to(x, (block_m, block_k))
    wp = _pad_to(w, (block_k, block_n))
    bankp = _pad_to(bank, (1, block_k))
    mp, kp = xp.shape
    np_ = wp.shape[1]
    nk = kp // block_k
    idxs = jnp.asarray(sample_idxs, jnp.int32) % bank.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(mp // block_m, np_ // block_n, nk),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, k, idx: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda i, j, k, idx: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bank.shape[0], block_k),
                         lambda i, j, k, idx: (0, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((num_samples, block_m, block_n),
                               lambda i, j, k, idx: (0, i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((num_samples, block_m, block_n),
                                   jnp.float32)],
    )
    y = pl.pallas_call(
        functools.partial(_bank_matmul_samples_kernel,
                          num_samples=num_samples, nk=nk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_samples, mp, np_), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(idxs, xp, wp, bankp)
    return y[:, :m, :n]


@functools.lru_cache(maxsize=None)
def _bank_inference_vmapped(block_m: int, block_n: int, block_k: int,
                            interpret: bool):
    @jax.custom_batching.custom_vmap
    def f(x, w, bank, sample_idx):
        return bank_matmul(x, w, bank, sample_idx, block_m, block_n, block_k,
                           interpret)

    @f.def_vmap
    def _rule(axis_size, in_batched, x, w, bank, sample_idx):
        xb, wb, bb, ib = in_batched
        if ib and not (xb or wb or bb):
            idxs = sample_idx.reshape(axis_size)
            outs = [bank_matmul_samples(x, w, bank,
                                        idxs[i:i + _SAMPLE_CHUNK],
                                        block_m, block_n, block_k, interpret)
                    for i in range(0, axis_size, _SAMPLE_CHUNK)]
            out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, 0)
            return out, True
        def one(i):
            return f(x[i] if xb else x, w[i] if wb else w,
                     bank[i] if bb else bank,
                     sample_idx[i] if ib else sample_idx)
        return jax.lax.map(one, jnp.arange(axis_size)), True

    return f


def bank_matmul_inference(x: jax.Array, w: jax.Array, bank: jax.Array,
                          sample_idx: jax.Array, block_m: int = 128,
                          block_n: int = 128, block_k: int = 128,
                          interpret: bool = False) -> jax.Array:
    """``bank_matmul`` with a vmap rule collapsing a sample-index-mapped call
    (the engine's per-mask spatial sweep) into one ``bank_matmul_samples``
    launch."""
    return _bank_inference_vmapped(block_m, block_n, block_k, interpret)(
        x, w, bank, sample_idx)


def bank_matmul(x: jax.Array, w: jax.Array, bank: jax.Array,
                sample_idx: jax.Array, block_m: int = 128,
                block_n: int = 128, block_k: int = 128,
                interpret: bool = False) -> jax.Array:
    """``(x ⊙ bank[sample_idx]) @ w`` — Masksembles fused matmul.

    The mask row is chosen by a scalar-prefetch argument, so one compiled
    kernel serves every mask index (the fork's ``mask_index`` predict arg).
    bank: (num_masks, K) float32.
    """
    m, k_dim = x.shape
    n = w.shape[1]
    xp = _pad_to(x, (block_m, block_k))
    wp = _pad_to(w, (block_k, block_n))
    bankp = _pad_to(bank, (1, block_k))
    mp, kp = xp.shape
    np_ = wp.shape[1]
    nk = kp // block_k
    idx = jnp.asarray(sample_idx, jnp.int32).reshape((1,)) % bank.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(mp // block_m, np_ // block_n, nk),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, k, idx: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda i, j, k, idx: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bank.shape[0], block_k),
                         lambda i, j, k, idx: (0, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n),
                               lambda i, j, k, idx: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
    )
    y = pl.pallas_call(
        functools.partial(_bank_matmul_kernel, nk=nk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(idx, xp, wp, bankp)
    return y[:m, :n]

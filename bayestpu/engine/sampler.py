"""Monte-Carlo sampling engine: temporal (scan) and spatial (vmap) mapping.

The reference realizes the MC sample dimension in hardware structure:

- *Temporal* ``T_*`` models re-run the post-dropout sub-graph per sample
  (``Hardware_Artifact/bayes_hw/models/t_qmodels_bayes.py:38-95``; host loop
  ``[hls_model.predict(x) for _ in range(mc_samples)]`` in
  ``hls4ml_pred.py:102``).
- *Spatial* ``S_*`` models bake ``mc_samples-1`` replica heads into the graph
  (``s_qmodels_bayes.py:68-94``) with post-training weight tying
  (``train_qkeras_mcme.py:256-260``).

On TPU both collapse into functional transforms over ONE model definition —
no replica heads, no weight tying, no graph surgery:

- ``temporal`` → ``lax.scan`` over per-sample keys (constant memory;
  streaming Welford moments available via ``mc_moments``).
- ``spatial``  → ``vmap`` over per-sample keys; XLA batches the whole
  network over the sample axis (the backbone is closed over → computed per
  sample only where it depends on the mask; for last-layer-dropout models use
  ``split_apply`` below to hoist the shared backbone, the analogue of the
  reference's intermediate-layer caching, ``s_qmodels_bayes.py:68-79``).
- sharded spatial → the same vmapped function under ``jit`` with the sample
  axis sharded over the mesh (``bayestpu.engine.sharding``).

Masksembles: sample ``i`` uses mask ``i % num_masks`` — the round-robin of
``Software_Artifact/software/utils.py:166-168`` — and for MCD the index is
ignored by the layers.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from bayestpu.core.config import BayesConfig, DropoutKind, SamplingMode
from bayestpu.core.rng import BAYES_RNG, sample_keys
from bayestpu.nn.multiexit import ExitOutputs

Variables = Any


def _apply_one(model, variables: Variables, x: jax.Array, key: jax.Array,
               idx: jax.Array) -> jax.Array:
    out: ExitOutputs = model.apply(
        variables, x, sample_idx=idx, train=False, rngs={BAYES_RNG: key})
    return out.logits  # (E, B, C)


def mc_logits(model, variables: Variables, x: jax.Array, key: jax.Array,
              num_samples: int,
              mode: SamplingMode = SamplingMode.SPATIAL) -> jax.Array:
    """All per-sample, per-exit logits: shape (S, E, B, C).

    ``mode`` picks the hardware mapping (P1 temporal / P2 spatial); results
    are bit-identical across modes because sample ``i``'s key is derived by
    folding ``i`` into ``key`` (see ``bayestpu.core.rng.sample_keys``).
    """
    keys = sample_keys(key, num_samples)
    idxs = jnp.arange(num_samples, dtype=jnp.int32)

    if mode is SamplingMode.TEMPORAL:
        def step(_, ki):
            k, i = ki
            return None, _apply_one(model, variables, x, k, i)
        _, logits = jax.lax.scan(step, None, (keys, idxs))
        return logits
    # spatial / sharded
    return jax.vmap(lambda k, i: _apply_one(model, variables, x, k, i))(
        keys, idxs)


class Predictive(NamedTuple):
    """Predictive distribution summary per exit.

    probs:     (E, B, C) mean softmax probability over MC samples — the
               quantity the reference averages (``MCDropout.py:57-68``,
               ``results_analyzer.py:236-270``).
    var:       (E, B, C) per-class variance over samples (epistemic spread).
    entropy:   (E, B) predictive entropy of the mean distribution — the aPE
               metric base (``Hardware_Artifact/bayes_hw/metric_utils.py:3-6``).
    num_samples: python int.
    """

    probs: jax.Array
    var: jax.Array
    entropy: jax.Array
    num_samples: int


def _entropy(p: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    return -jnp.sum(p * jnp.log(p + eps), axis=axis)


def predictive(model, variables: Variables, x: jax.Array, key: jax.Array,
               num_samples: int,
               mode: SamplingMode = SamplingMode.SPATIAL) -> Predictive:
    """MC-averaged predictive distribution (materializes all samples)."""
    logits = mc_logits(model, variables, x, key, num_samples, mode)  # (S,E,B,C)
    probs = jax.nn.softmax(logits, axis=-1)
    mean = jnp.mean(probs, axis=0)
    var = jnp.var(probs, axis=0)
    return Predictive(mean, var, _entropy(mean), num_samples)


def mc_moments(model, variables: Variables, x: jax.Array, key: jax.Array,
               num_samples: int) -> Predictive:
    """Streaming (constant-memory) predictive moments via a scan.

    The temporal analogue for large S: accumulates sum and sum-of-squares of
    softmax probs instead of materializing the (S, E, B, C) tensor.
    """
    keys = sample_keys(key, num_samples)
    idxs = jnp.arange(num_samples, dtype=jnp.int32)

    def step(carry, ki):
        s1, s2 = carry
        k, i = ki
        p = jax.nn.softmax(_apply_one(model, variables, x, k, i), axis=-1)
        return (s1 + p, s2 + p * p), None

    shape = jax.eval_shape(
        lambda: _apply_one(model, variables, x, keys[0], idxs[0]))
    zero = jnp.zeros(shape.shape, jnp.float32)
    (s1, s2), _ = jax.lax.scan(step, (zero, zero), (keys, idxs))
    mean = s1 / num_samples
    var = jnp.maximum(s2 / num_samples - mean * mean, 0.0)
    return Predictive(mean, var, _entropy(mean), num_samples)


def num_effective_samples(bayes: BayesConfig, num_samples: int | None = None
                          ) -> int:
    """Masksembles enumerates its masks; MCD draws ``num_samples`` masks
    (ref ``hls4ml_pred.py:97-110``: mc → repeat predicts, mask → one predict
    per ``mask_index``)."""
    if bayes.kind is DropoutKind.MASK:
        return bayes.num_masks
    return num_samples if num_samples is not None else bayes.num_samples


def split_apply(backbone_fn: Callable, head_fn: Callable,
                x: jax.Array, key: jax.Array, num_samples: int) -> jax.Array:
    """Intermediate-layer caching (P3): run the shared deterministic backbone
    once, vmap only the stochastic head over samples.

    The functional analogue of the reference's clone-tree caching workaround
    (``s_qmodels_bayes.py:68-79``): XLA hoists ``backbone_fn(x)`` out of the
    sample axis because it does not depend on the sample key.
    """
    cached = backbone_fn(x)
    keys = sample_keys(key, num_samples)
    idxs = jnp.arange(num_samples, dtype=jnp.int32)
    return jax.vmap(lambda k, i: head_fn(cached, k, i))(keys, idxs)

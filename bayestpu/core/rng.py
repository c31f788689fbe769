"""Deterministic PRNG key plumbing for Monte-Carlo sampling.

The reference obtains stochasticity from TF/torch global RNG state
(``Hardware_Artifact/converter/keras/MCDropout.py:23-31`` seeds a keras
``Dropout``; ``Software_Artifact/software/models/resnet18/resnet18.py:207-210``
uses ``F.dropout`` with ``training=True``). On TPU we instead derive every
dropout mask from a counter-based threefry key so that

- a (seed, step, sample, layer) tuple fully determines every mask,
- samples can be computed in any order / on any shard and still reproduce,
- in-kernel PRNG (Pallas ``prng_seed``) can consume the same 32-bit seeds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Collection name used by all Bayesian layers when calling ``self.make_rng``.
BAYES_RNG = "bayes"


def sample_keys(key: jax.Array, num_samples: int) -> jax.Array:
    """Split a base key into one key per MC sample.

    The per-sample key is folded (not split) so that sample ``i`` has the same
    key regardless of how many total samples are drawn — letting temporal
    (lax.scan) and spatial (vmap) execution, and any sharding of the sample
    axis, produce bit-identical masks per sample index.
    """
    idx = jnp.arange(num_samples, dtype=jnp.uint32)
    return jax.vmap(lambda i: jax.random.fold_in(key, i))(idx)


def step_key(key: jax.Array, step: jax.Array | int) -> jax.Array:
    """Key for one training step (folds the step counter into the run key)."""
    return jax.random.fold_in(key, step)


def key_to_seeds(key: jax.Array) -> jax.Array:
    """Expose a key's raw uint32 words, for seeding in-kernel Pallas PRNG."""
    return jax.random.key_data(key).astype(jnp.uint32).reshape(-1)

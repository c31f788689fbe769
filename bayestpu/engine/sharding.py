"""Device-mesh sharding of the MC sample and batch axes.

The reference has no distribution at all (SURVEY §2.10, §5.8: single process,
FPGA driven through csim/bitstream; multi-GPU only via ``CUDA_VISIBLE_DEVICES``
passthrough in ``train_qkeras*.py:227-228``). Scale-out is this framework's
addition, and the axis that scales is the MC *sample* dimension — the
structural analogue of the reference's spatial replication of dropout heads
on fabric (``s_qmodels_bayes.py:86-94``), except replicas land on chips
instead of LUTs.

Design (the standard pjit recipe): pick a ``Mesh`` with axes
``(data, sample)``; place the batch over ``data`` and the per-sample keys
over ``sample``; jit the vmapped forward; XLA's SPMD partitioner inserts the
ICI collectives (the mean over samples becomes an all-reduce over the
``sample`` axis, ECE bin partials psum over both axes).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bayestpu.core.rng import sample_keys
from bayestpu.engine import sampler
from bayestpu.engine.sampler import Predictive, _entropy

DATA_AXIS = "data"
SAMPLE_AXIS = "sample"


def make_mesh(num_data: int | None = None, num_sample: int | None = None,
              devices=None) -> Mesh:
    """Build a (data, sample) mesh over the given (default: all) devices.

    With only a device count given, the sample axis gets the larger factor —
    MC samples are embarrassingly parallel with zero cross-sample traffic
    until the final moment reduction, so they are the cheap axis to scale.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if num_data is None and num_sample is None:
        num_data = 1
        num_sample = n
    elif num_data is None:
        num_data = n // num_sample
    elif num_sample is None:
        num_sample = n // num_data
    if num_data * num_sample != n:
        raise ValueError(
            f"mesh {num_data}x{num_sample} != {n} devices")
    return Mesh(devices.reshape(num_data, num_sample),
                (DATA_AXIS, SAMPLE_AXIS))


def sharded_predictive(model, variables: Any, x: jax.Array, key: jax.Array,
                       num_samples: int, mesh: Mesh) -> Predictive:
    """MC predictive moments with the sample axis sharded over the mesh.

    Samples are padded up to a multiple of the sample-axis size (extra
    samples only sharpen the estimate; the count reported is the padded one).
    Batch shards over ``data``. The final softmax-mean over the sample axis
    lowers to an ICI all-reduce.
    """
    n_sample = mesh.shape[SAMPLE_AXIS]
    padded = math.ceil(num_samples / n_sample) * n_sample
    keys = sample_keys(key, padded)
    idxs = jnp.arange(padded, dtype=jnp.int32)

    keys = jax.device_put(keys, NamedSharding(mesh, P(SAMPLE_AXIS)))
    idxs = jax.device_put(idxs, NamedSharding(mesh, P(SAMPLE_AXIS)))
    x = jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS)))
    variables = jax.device_put(variables, NamedSharding(mesh, P()))

    @jax.jit
    def run(vs, xb, ks, ids):
        logits = jax.vmap(
            lambda k, i: sampler._apply_one(model, vs, xb, k, i))(ks, ids)
        probs = jax.nn.softmax(logits, axis=-1)
        mean = jnp.mean(probs, axis=0)       # all-reduce over `sample`
        var = jnp.var(probs, axis=0)
        return mean, var

    mean, var = run(variables, x, keys, idxs)
    return Predictive(mean, var, _entropy(mean), padded)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (params) over the mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Shard leading (batch) axis over the data axis."""
    return jax.device_put(batch, NamedSharding(mesh, P(DATA_AXIS)))

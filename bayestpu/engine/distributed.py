"""Multi-host runtime: initialization + cross-host metric reductions.

The reference has no distributed backend at all (SURVEY §5.8 — no
NCCL/MPI/Gloo; multi-GPU only via ``CUDA_VISIBLE_DEVICES`` passthrough,
``Hardware_Artifact/bayes_hw/train_qkeras.py:227-228``). This module is the
framework's addition: ``jax.distributed`` initialization, a (data, sample)
mesh spanning hosts, and psum-able metric partials so predictive moments,
accuracy counts and ECE histogram bins reduce over ICI (KDE-ECE stays a
host-side finalizer over gathered bins — SURVEY §5.8).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bayestpu.engine.sharding import DATA_AXIS, SAMPLE_AXIS, make_mesh
from bayestpu.metrics.ece import ece_bins, ece_from_bins


def initialize(coordinator: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Bring up the multi-host runtime (one JAX process per host).

    With no args, reads the standard env (TPU pod metadata /
    ``JAX_COORDINATOR_ADDRESS`` etc.). Safe to call on a single host — a
    no-op when there is nothing to coordinate.
    """
    if num_processes is None and coordinator is None and \
            "JAX_COORDINATOR_ADDRESS" not in os.environ and \
            jax.process_count() == 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def pod_mesh(num_sample: int | None = None) -> Mesh:
    """Global (data, sample) mesh over all devices of all hosts. Sample
    axis defaults to the per-host device count so sample traffic stays on
    ICI within a host and the data axis crosses hosts (DCN-aware layout)."""
    if num_sample is None:
        num_sample = max(jax.local_device_count(), 1)
        while jax.device_count() % num_sample:
            num_sample //= 2
    return make_mesh(jax.device_count() // num_sample, num_sample)


def eval_step_metrics(probs: jax.Array, labels: jax.Array, n_bins: int = 10
                      ) -> dict[str, jax.Array]:
    """Per-shard metric PARTIALS, all linear → safe to ``psum``/sum across
    shards, then finalize with ``finalize_metrics``."""
    pred = jnp.argmax(probs, axis=-1)
    cnt, conf_sum, acc_sum = ece_bins(probs, labels, n_bins)
    return {
        "n": jnp.asarray(labels.shape[0], jnp.float32),
        "correct": jnp.sum((pred == labels).astype(jnp.float32)),
        "nll_sum": -jnp.sum(jnp.log(jnp.clip(
            jnp.take_along_axis(probs, labels[:, None], -1)[:, 0],
            1e-12, 1.0))),
        "ece_cnt": cnt, "ece_conf": conf_sum, "ece_acc": acc_sum,
    }


def finalize_metrics(parts: dict[str, jax.Array]) -> dict[str, jax.Array]:
    return {
        "acc": parts["correct"] / parts["n"],
        "nll": parts["nll_sum"] / parts["n"],
        "ece": ece_from_bins(parts["ece_cnt"], parts["ece_conf"],
                             parts["ece_acc"]),
        "n": parts["n"],
    }


def put_global(tree: Any, mesh: Mesh, spec: P) -> Any:
    """Shard host-resident arrays onto a (possibly multi-process) global
    mesh. ``jax.device_put`` rejects shardings with non-addressable devices;
    ``make_array_from_callback`` builds each process's addressable shards
    from the same host copy — correct as long as every process holds
    identical data (our workers derive everything from shared seeds)."""
    sharding = NamedSharding(mesh, spec)

    def put(a):
        a = jnp.asarray(a)
        return jax.make_array_from_callback(a.shape, sharding,
                                            lambda idx: a[idx])

    return jax.tree.map(put, tree)


def distributed_evaluate(model, variables: Any, x, y, num_samples: int,
                         mesh: Mesh, key: jax.Array | None = None) -> dict:
    """Sharded MC evaluation: batch over ``data`` × samples over ``sample``;
    the metric reduction lowers to ICI all-reduces inside one jit. Works
    unchanged on a single-process virtual mesh and a multi-process
    ``jax.distributed`` runtime (tests/test_multiprocess.py)."""
    from bayestpu.core.rng import sample_keys
    from bayestpu.engine import sampler

    key = key if key is not None else jax.random.key(0)
    n_sample = mesh.shape[SAMPLE_AXIS]
    padded = -(-num_samples // n_sample) * n_sample
    # typed PRNG keys don't round-trip make_array_from_callback: ship raw
    # key data and re-wrap inside the jit
    kd = put_global(jax.random.key_data(sample_keys(key, padded)), mesh,
                    P(SAMPLE_AXIS))
    impl = jax.random.key_impl(key)
    idxs = put_global(jnp.arange(padded, dtype=jnp.int32), mesh,
                      P(SAMPLE_AXIS))
    xs = put_global(x, mesh, P(DATA_AXIS))
    ys = put_global(y, mesh, P(DATA_AXIS))
    vs = put_global(variables, mesh, P())

    @jax.jit
    def run(vs, xs, ys, kd, idxs):
        keys = jax.random.wrap_key_data(kd, impl=impl)
        logits = jax.vmap(
            lambda k, i: sampler._apply_one(model, vs, xs, k, i))(keys, idxs)
        probs = jnp.mean(jax.nn.softmax(logits, axis=-1), axis=0)  # sample AR
        parts = eval_step_metrics(probs[-1], ys)
        return finalize_metrics(parts)

    return {k: float(v) for k, v in run(vs, xs, ys, kd, idxs).items()}

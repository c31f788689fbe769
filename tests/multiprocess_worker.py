"""Worker for the true multi-process distributed test (SURVEY §4.6/§5.8).

Launched as ``python multiprocess_worker.py <coordinator> <nprocs> <pid>``
with 4 virtual CPU devices per process; brings up ``jax.distributed`` (the
no-cluster analogue of a multi-host TPU pod), runs a sharded MC evaluation
whose ECE/acc/NLL reduce across processes via psum-able bins
(``bayestpu/engine/distributed.py``), plus one data-parallel train step, and
prints one JSON line for the parent test to compare against the
single-process result.
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
jax.config.update("jax_cpu_collectives_implementation", "gloo")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402


def main() -> None:
    coordinator, nprocs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    from bayestpu.engine import distributed

    distributed.initialize(coordinator, nprocs, pid)
    assert jax.process_count() == nprocs, jax.process_count()
    assert jax.device_count() == 4 * nprocs

    from bayestpu.core.config import BayesConfig
    from bayestpu.core.rng import BAYES_RNG
    from bayestpu.nn.zoo import get_model

    key = jax.random.key(0)
    model = get_model("lenet", bayes=BayesConfig(rate=0.3))
    x = jax.random.normal(key, (32, 28, 28, 1))
    y = jax.random.randint(jax.random.fold_in(key, 1), (32,), 0, 10)
    vs = model.init({"params": key, BAYES_RNG: key}, x)

    mesh = distributed.pod_mesh()          # (data=2, sample=4) over 8 devices
    mets = distributed.distributed_evaluate(model, vs, x, y, 8, mesh, key)

    # one data-parallel train step: batch sharded over ALL devices (crossing
    # the process boundary), grads psum'd by jit's SPMD partitioner
    dp = distributed.pod_mesh(1)           # (data=8, sample=1)
    xs = distributed.put_global(x, dp, P("data"))
    ys = distributed.put_global(y, dp, P("data"))
    vr = distributed.put_global(vs, dp, P())

    @jax.jit
    def grad_norm(params, xb, yb):
        def loss(p):
            out = model.apply({**vr, "params": p}, xb, train=True,
                              rngs={BAYES_RNG: jax.random.key(7)})
            lp = jax.nn.log_softmax(out.logits[-1])
            return -jnp.mean(jnp.take_along_axis(lp, yb[:, None], -1))
        g = jax.grad(loss)(params)
        return jnp.sqrt(sum(jnp.sum(t * t) for t in jax.tree.leaves(g)))

    gn = float(grad_norm(vr["params"], xs, ys))

    # Fused-kernel predictive under the multi-process runtime (VERDICT r2
    # item 6): Masksembles lenet with fused=True (interpret-mode Pallas bank
    # kernels on CPU) evaluated on a mesh whose SAMPLE axis spans both
    # processes — mask/bank kernels run inside the sharded jit and the
    # metrics psum across the process boundary.
    model_f = get_model("lenet",
                        bayes=BayesConfig(kind="mask", num_masks=4,
                                          scale=2.0), fused=True)
    vs_f = model_f.init({"params": key, BAYES_RNG: key}, x)
    mesh_s = distributed.pod_mesh(4 * nprocs)   # (data=1, sample=8)
    mets_f = distributed.distributed_evaluate(model_f, vs_f, x, y, 8,
                                              mesh_s, key)

    print("RESULT " + json.dumps({"pid": pid, "metrics": mets,
                                  "metrics_fused": mets_f,
                                  "grad_norm": gn}), flush=True)


if __name__ == "__main__":
    main()

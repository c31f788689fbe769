"""MC-samples/s scaling efficiency across the (data, sample) mesh.

BASELINE.json target: ≥80% MC-samples/s scaling efficiency from 1 chip to N
hosts. This harness measures samples/s of the sharded MC predictive at mesh
sizes 1, 2, 4, … N over the sample axis and reports efficiency
``sps_N / (N · sps_1)``.

On real multi-chip hardware the numbers are honest scaling; on the virtual
CPU mesh (``--xla_force_host_platform_device_count``) devices share the same
cores, so the run validates the sharded path's mechanics and collective
layout, not wall-clock scaling — the harness labels which case it measured.

Usage: ``python -m bench.scaling [--samples 32] [--batch 64]``
(force the CPU mesh with ``JAX_PLATFORMS=cpu`` + ``XLA_FLAGS=...=8``).
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

from bayestpu.core.config import BayesConfig
from bayestpu.core.rng import BAYES_RNG
from bayestpu.engine import sharding
from bayestpu.nn.zoo import get_model


def measure_at(model, variables, x, num_samples: int, n_dev: int,
               iters: int = 5) -> float:
    from bench.timing import pipelined_s

    mesh = sharding.make_mesh(1, n_dev, devices=jax.devices()[:n_dev])
    key = jax.random.key(0)

    def run(vs, xb, k):
        return sharding.sharded_predictive(model, vs, xb, k, num_samples,
                                           mesh).probs

    dt = pipelined_s(run, variables, x, key, iters=iters, repeats=2)
    return x.shape[0] * num_samples / dt


def main(argv=None) -> dict:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="vgg11_me")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--samples", type=int, default=32)
    p.add_argument("--image", type=int, default=32)
    p.add_argument("--channels", type=int, default=3)
    p.add_argument("--out", default=None,
                   help="also write the JSON result to this path")
    p.add_argument("--iters", type=int, default=5,
                   help="calls per timing window (lower for slow CPU runs)")
    p.add_argument("--cpu", type=int, default=0, metavar="N",
                   help="force an N-device virtual CPU mesh (the TPU plugin "
                        "in this image overrides JAX_PLATFORMS from the "
                        "environment; jax.config wins)")
    a = p.parse_args(argv)
    if a.cpu:
        import os
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={a.cpu}"
            ).strip()
        jax.config.update("jax_platforms", "cpu")
        assert len(jax.devices()) >= a.cpu, jax.devices()

    model = get_model(a.model, bayes=BayesConfig(rate=0.25),
                      dtype=jnp.bfloat16)
    key = jax.random.key(0)
    x = jax.random.normal(key, (a.batch, a.image, a.image, a.channels))
    variables = model.init({"params": key, BAYES_RNG: key}, x)

    n_total = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_total]
    rows = []
    sps1 = None
    for n in sizes:
        sps = measure_at(model, variables, x, a.samples, n, iters=a.iters)
        if sps1 is None:
            sps1 = sps
        rows.append({"devices": n, "samples_per_s": round(sps, 1),
                     "efficiency": round(sps / (n * sps1), 3)})

    virtual = jax.devices()[0].platform == "cpu"
    out = {
        "model": a.model, "batch": a.batch, "mc_samples": a.samples,
        "platform": jax.devices()[0].platform,
        "virtual_mesh": virtual,
        # honest labeling (docstring above): on the virtual CPU mesh the
        # devices share the same physical cores, so these numbers validate
        # the sharded path's MECHANICS and collective layout only — they
        # are NOT wall-clock scaling efficiency. On real multi-chip
        # hardware the identical harness reports honest efficiency.
        "label": ("virtual mesh — mechanics only (shared cores; not "
                  "wall-clock scaling)") if virtual
                 else "real multi-device scaling",
        "scaling": rows,
    }
    print(json.dumps(out, indent=2))
    if a.out:
        with open(a.out, "w") as fp:
            json.dump(out, fp, indent=2)
    return out


if __name__ == "__main__":
    main()

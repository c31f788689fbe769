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


def analytic_ici_efficiency(flops_total: float, payload_bytes: float,
                            n: int, achieved_fraction: float = 0.61,
                            peak_flops: float = 197e12,
                            ici_bw: float = 200e9,
                            hop_latency_s: float = 1e-6) -> dict:
    """Predicted real-hardware scaling efficiency from the comm/compute
    ratio (the scaling-book recipe: pick the sharding, count the collective
    bytes, divide by ICI bandwidth).

    The sample-axis predictive is embarrassingly parallel except for ONE
    collective: the mean/var reduction over ``sample``, an all-reduce of
    the two (exits, batch, classes) f32 moment tensors
    (``engine/sharding.sharded_predictive``). Ring all-reduce moves
    ~2×payload over ICI regardless of N; per-device compute shrinks as 1/N.

    * ``achieved_fraction`` — the measured single-chip compute fraction
      (RESULTS.md headline, 0.61), so the prediction is anchored to the
      real kernel efficiency, not the theoretical peak.
    * ``ici_bw`` — TPU v5e public spec: 1600 Gbps ICI per chip = 200 GB/s.
    * ``hop_latency_s`` — per-hop collective latency, log2(N) hops.
    """
    import math as _m

    t_comp = (flops_total / n) / (achieved_fraction * peak_flops)
    t_comm = 2.0 * payload_bytes / ici_bw + hop_latency_s * _m.log2(max(n, 2))
    return {"devices": n,
            "t_compute_us": round(t_comp * 1e6, 2),
            "t_allreduce_us": round(t_comm * 1e6, 2),
            "efficiency": round(t_comp / (t_comp + t_comm), 4)}


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

    # Analytic ICI prediction for REAL hardware (virtual-mesh runs cannot
    # measure wall-clock scaling; this is the quantitative backing for the
    # BASELINE >=80% target). FLOPs from XLA's cost model on the actual
    # predictive executable; payload = the mean+var all-reduce tensors.
    try:
        from bayestpu.engine import sampler as _sampler
        from bayestpu.core.config import SamplingMode as _SM

        compiled = jax.jit(
            lambda vs, xb, k: _sampler.predictive(
                model, vs, xb, k, a.samples, _SM.SPATIAL).probs
        ).lower(variables, x, key).compile()
        cost = compiled.cost_analysis() or {}
        flops_total = float(cost.get("flops") or 0.0)
        probs_shape = compiled(variables, x, key).shape  # (E?, B, C)
        payload = 2 * 4 * int(jnp.prod(jnp.asarray(probs_shape)))
        if flops_total > 0:
            # sample axis caps at S devices; beyond that the data axis
            # takes over (same all-reduce payload, batch-sharded compute)
            out["analytic_ici_model"] = {
                "note": ("predicted REAL-hardware efficiency from the "
                         "comm/compute ratio: the only collective is the "
                         "mean/var all-reduce over `sample` "
                         "(2 f32 (exits,batch,classes) tensors); compute "
                         "anchored to the measured single-chip fraction"),
                "flops_per_step": flops_total,
                "allreduce_payload_bytes": payload,
                "achieved_fraction_anchor": 0.61,
                "ici_bw_gbytes_s": 200.0,
                # STRONG scaling: fixed problem; compute shrinks 1/N while
                # the all-reduce (and its log2(N) hop latency) does not, so
                # a 0.3 ms step goes latency-bound past ~16 devices.
                "rows": [analytic_ici_efficiency(flops_total, payload, n)
                         for n in (2, 4, 8, 16, 64, 256)],
                # WEAK scaling (the serving regime): batch grows with the
                # data axis, per-device compute is constant, and the
                # sample-axis all-reduce stays per-data-shard-group — its
                # payload does NOT grow with the mesh.
                "rows_weak": [
                    analytic_ici_efficiency(flops_total * n, payload, n)
                    for n in (2, 4, 8, 16, 64, 256)],
            }
    except Exception as e:   # cost model is best-effort; never fail the run
        out["analytic_ici_model"] = {"error": repr(e)}
    print(json.dumps(out, indent=2))
    if a.out:
        with open(a.out, "w") as fp:
            json.dump(out, fp, indent=2)
    return out


if __name__ == "__main__":
    main()

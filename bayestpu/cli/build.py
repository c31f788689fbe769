"""Build CLI — ≙ ``Hardware_Artifact/bayes_hw/hls4ml_build.py``.

The reference's build stage loads a trained ``.h5``, derives per-layer
ReuseFactor tables from ``--mem_limit`` (``hls4ml_build.py:23-58,88-100``),
emits HLS with ``Bayes=True`` (``:103-110``), compiles the csim library
(``:113``) and launches Vivado synthesis (``:114``), whose reports are later
scraped for LUT/FF/BRAM/latency.

TPU-native equivalent: load a checkpoint, AOT-compile the MC predict
executable for the requested batch/sample count, and write a build report
with the XLA cost model (FLOPs, bytes) and memory analysis (temp/argument/
output/code bytes) — the report the Vivado scrape provided, in TPU terms.

Strategy mapping (≙ ``--strategy {latency,resource}``):

- ``latency``  → spatial mapping (all MC samples materialized in one
  executable, the ``S_*`` replicated-head layout) — minimum latency,
  maximum live memory.
- ``resource`` → temporal mapping (``lax.scan`` re-runs one set of head
  "hardware" per sample ≙ ReuseFactor time-multiplexing of MACs) —
  minimum live memory.

``--mem_limit`` plays the reference role of the knob that selects the reuse
tables: if the latency build's temp memory exceeds it, the build degrades to
the resource mapping automatically and records that in the report.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp

from bayestpu.cli import common
from bayestpu.core.config import EngineConfig, SamplingMode
from bayestpu.core.rng import BAYES_RNG
from bayestpu.data.datasets import get_dataset
from bayestpu.engine.engine import BayesEngine
from bayestpu.train.checkpoint import restore_variables


def _build_one(model, variables, bayes, mode: SamplingMode, x) -> dict:
    eng = BayesEngine(model, bayes, EngineConfig(mode=mode))
    eng.attach(variables)
    stats = eng.compile(x)
    cost = eng.cost_analysis(x)
    return {"strategy_mode": mode.value, **stats, **cost}


def main(argv=None) -> dict:
    p = argparse.ArgumentParser(description=__doc__)
    common.add_model_args(p)
    p.add_argument("--load_model", required=True,
                   help="checkpoint dir from bayestpu.cli.train "
                        "(≙ --load_model m.h5)")
    p.add_argument("--output_dir", default="build_prj",
                   help="report directory (≙ the HLS project dir)")
    p.add_argument("--build_strategy", default="latency",
                   choices=["latency", "resource", "auto"],
                   help="≙ hls4ml Strategy: latency=spatial, "
                        "resource=temporal time-multiplexing, auto=measure "
                        "both and keep the winner (the measured analogue of "
                        "the reference's per-model ReuseFactor tables)")
    p.add_argument("--mem_limit", type=int, default=0,
                   help="max executable temp bytes; 0 = unlimited "
                        "(≙ --mem_limit driving the ReuseFactor tables)")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--bench", action="store_true",
                   help="also measure wall-clock latency of the executable")
    a = p.parse_args(argv)

    key = jax.random.key(a.seed)
    ds = get_dataset(a.dataset, a.data_dir)
    model = common.build_model(a)
    bayes = common.bayes_from_args(a)

    x = jnp.asarray(ds.x_test[:a.batch])
    template = jax.jit(lambda k, xb: model.init(
        {"params": k, BAYES_RNG: k}, xb))(key, x[:8])
    variables = restore_variables(a.load_model, template)

    if a.build_strategy == "auto":
        # measured selection (VERDICT r2 item 3): time both mappings for the
        # actual (model, batch, S), keep the winner, record the evidence
        eng = BayesEngine(model, bayes,
                          EngineConfig(mode=SamplingMode.AUTO))
        eng.attach(variables)
        tuned = eng.autotune(x)
        mode = SamplingMode(tuned["mode"])
        report = _build_one(model, variables, bayes, mode, x)
        report["autotune"] = tuned
    else:
        mode = (SamplingMode.SPATIAL if a.build_strategy == "latency"
                else SamplingMode.TEMPORAL)
        report = _build_one(model, variables, bayes, mode, x)
    report["degraded_to_resource"] = False
    temp = report.get("temp_size_in_bytes") or 0
    if a.mem_limit and mode is SamplingMode.SPATIAL and temp > a.mem_limit:
        # over budget: re-build time-multiplexed, as the reference's reuse
        # tables do when mem_limit shrinks (hls4ml_build.py:23-58)
        report = _build_one(model, variables, bayes,
                            SamplingMode.TEMPORAL, x)
        report["degraded_to_resource"] = True
        report["latency_build_temp_bytes"] = int(temp)
    report["mem_limit"] = a.mem_limit
    report["requested_strategy"] = a.build_strategy
    # the measured per-shape kernel-mapping rules baked into this build —
    # the analogue of the reference's hand-derived per-layer ReuseFactor
    # table (hls4ml_build.py:23-58), recorded so a report reader can see
    # which mapping produced the numbers (VERDICT r4 next #5)
    from bayestpu.nn.fused import MASKED_CONV_FUSE_MIN_CH
    from bayestpu.nn.zoo.vgg import ENTRY_BATCH_CHUNK
    q = getattr(model, "quant", None)
    report["kernel_mapping"] = {
        "masked_matmul_block_m": ("auto: min(512, VMEM-capped, M) — "
                                  "kernels.masked_matmul._auto_block_m"),
        "masked_conv_fused_min_in_ch": MASKED_CONV_FUSE_MIN_CH,
        "int8_conv_min_ch": getattr(q, "int8_conv_min_ch", None),
        "int8_det_pallas": getattr(q, "int8_det_pallas", None),
        "entry_block_batch_chunk": ENTRY_BATCH_CHUNK,
        "evidence": ["scripts/exp_small_tuning.json",
                     "scripts/exp_int8_routing.json",
                     "scripts/exp_batch_falloff.json"],
    }

    if a.bench:
        eng = BayesEngine(
            model, bayes,
            EngineConfig(mode=SamplingMode(report["strategy_mode"]))
            ).attach(variables)
        report["benchmark"] = eng.benchmark(x)

    os.makedirs(a.output_dir, exist_ok=True)
    out_path = os.path.join(a.output_dir, "build_report.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2, default=str)
    print(json.dumps(report, indent=2, default=str))
    return report


if __name__ == "__main__":
    main()

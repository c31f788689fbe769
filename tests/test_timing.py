"""Fenced-timing helper sanity (bayestpu/utils/timing.py).

The methodology exists because ``block_until_ready`` does not fence
execution over the axon TPU tunnel (RESULTS.md measurement-integrity
note); these tests pin the host-side contract so regressions in the
differencing/auto-scaling logic can't silently publish garbage again.
"""

import jax
import jax.numpy as jnp
import numpy as np

from bayestpu.utils.timing import (
    blocking_latencies_s,
    fenced_window_s,
    measure_windows,
    paired_compare,
    pipelined_s,
    pipelined_windows_s,
    scan_compare,
    scan_time_s,
)


def _work_fn():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(256, 256)),
                    jnp.float32)

    @jax.jit
    def f(a):
        return jnp.sum(jax.nn.relu(a @ a.T))

    return f, x


def test_pipelined_windows_positive_and_sorted():
    f, x = _work_fn()
    w = pipelined_windows_s(f, x, iters=4, repeats=3, min_diff_s=0.0)
    assert all(v > 0 for v in w)
    assert w == sorted(w)
    assert pipelined_s(f, x, iters=4) > 0


def test_window_autoscale_never_publishes_nonpositive():
    # a near-zero-cost fn: differences are jitter-dominated; the helper must
    # auto-scale and still return only positive estimates (or the labeled
    # whole-window fallback)
    @jax.jit
    def f(a):
        return a

    x = jnp.zeros((8, 8))
    w = pipelined_windows_s(f, x, iters=2, repeats=3, min_diff_s=1e-4,
                            max_iters=64)
    assert all(v > 0 for v in w)


def test_fenced_window_monotone_in_iters():
    f, x = _work_fn()
    t1 = fenced_window_s(f, x, iters=1)
    t64 = fenced_window_s(f, x, iters=256)
    assert t64 > 0 and t1 > 0


def test_blocking_latencies_shape():
    f, x = _work_fn()
    ts = blocking_latencies_s(f, x, iters=3, warmup=1)
    assert len(ts) == 3 and all(t > 0 for t in ts)


def test_measure_windows_carries_fallback_flag():
    """The rtt-fallback flag lives on the result object, not global mutable
    state (ADVICE r3): two interleaved measurements keep their own flags."""
    f, x = _work_fn()
    r = measure_windows(f, x, iters=4, repeats=2, min_diff_s=0.0)
    assert hasattr(r, "rtt_fallback") and isinstance(r.rtt_fallback, bool)
    assert r.median_s > 0 and r.best_s > 0 and r.best_s <= r.median_s
    assert r.windows == tuple(sorted(r.windows))


def test_scan_time_positive_and_stable():
    """Device-side scan timing returns positive per-call times; the scan
    body must not be DCE-sliced (full-reduction carry)."""
    a = jnp.asarray(np.random.default_rng(1).normal(size=(128, 128)),
                    jnp.float32)

    def step(c):
        return (a + c) @ a

    r = scan_time_s(step, iters=8, repeats=3, min_diff_s=0.0)
    assert r.median_s > 0
    # a 128x128 matmul cannot take less than ~1e-8 s even on fast hardware;
    # a DCE'd body reads ~0 — guard the slicing regression
    assert r.median_s > 1e-8


def test_scan_compare_detects_2x_work():
    a = jnp.asarray(np.random.default_rng(2).normal(size=(196, 196)),
                    jnp.float32)

    def one(c):
        return (a + c) @ a

    def two(c):
        y = (a + c) @ a
        return y @ a

    # wall-clock ranking on a shared 2-core box can be perturbed by a
    # concurrent xdist worker — sizeable windows + retries so only a
    # systematic ranking failure trips (same treatment as paired_compare)
    for attempt in range(3):
        out = scan_compare(one, two, iters=8, repeats=3, min_diff_s=0.2,
                           labels=("one", "two"))
        if out["winner"] == "one" or attempt == 2:
            break
    assert out["winner"] == "one"
    assert out["median_ratio_a_over_b"] < 1.0
    assert len(out["pairs"]) == 3


def test_paired_compare_detects_2x_work():
    """paired_compare must rank 2× the work as slower with a sane ratio.

    Wall-clock ranking on a shared 2-core box can be perturbed by a
    concurrent pytest-xdist worker (one side's window absorbs the
    neighbor's load spike) — use ≥50 ms windows and allow one retry so
    only a systematic ranking failure trips the assert."""
    f, x = _work_fn()

    @jax.jit
    def f2(a):
        return f(a) + f(a.T)

    _ = f2(x)  # warm
    for attempt in range(3):
        out = paired_compare(lambda: f(x), lambda: f2(x),
                             pairs=3, iters=8, min_diff_s=0.2,
                             labels=("one", "two"))
        if out["winner"] == "one" or attempt == 2:
            break
    assert out["winner"] == "one"
    assert out["median_ratio_a_over_b"] < 1.0
    assert len(out["pairs"]) == 3
    for p in out["pairs"]:
        assert p["one_s"] > 0 and p["two_s"] > 0
        assert p["ratio_a_over_b"] == p["one_s"] / p["two_s"]

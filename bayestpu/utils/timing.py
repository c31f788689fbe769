"""Shared device-timing helpers for the benchmark harnesses.

MEASUREMENT INTEGRITY on a remote/tunneled chip: ``block_until_ready`` over
this environment's TPU tunnel acknowledges *dispatch*, not *execution* — a
chained-matmul probe "completes" at tens of PF/s under block_until_ready,
while the marginal per-matmul time measured through an actual value fetch is
~0.70 ms for a 4096³ bf16 matmul = 196 TF/s, i.e. exactly the v5e's bf16
peak. Only a device→host **value fetch** is a true execution fence here.

So every window is value-fetch fenced, and the per-call figure comes from
**differencing two window sizes** — ``(T(2k) − T(k)) / k`` — which cancels
the fetch RTT (~30 ms) and any fixed dispatch overhead. TPU programs execute
in dispatch order on the device stream, so fetching one element of the last
output fences the whole window.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def _fence(out) -> None:
    """True execution fence: device→host fetch of one element of ``out``."""
    leaf = jax.tree.leaves(out)[0]
    jax.device_get(jnp.ravel(leaf)[:1])


def fenced_window_s(fn, *args, iters: int) -> float:
    """Wall time of ``iters`` back-to-back calls, fenced by a value fetch of
    the last output (includes one fetch RTT — difference two of these)."""
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _fence(out)
    return time.perf_counter() - t0


def pipelined_windows_s(fn, *args, iters: int = 50, warmup: int = 1,
                        repeats: int = 3, min_diff_s: float = 0.3,
                        max_iters: int = 25600) -> list[float]:
    """Per-call device time estimates (seconds), sorted ascending.

    Each estimate is ``(T(2k) − T(k)) / k`` over fetch-fenced windows: the
    RTT and fixed costs cancel, leaving steady-state per-call time (device
    work or host dispatch, whichever actually bottlenecks). The window size
    auto-scales until the k-call difference is ~10× the fetch-RTT jitter
    (tens of ms) — without this, fast calls produce near-zero or negative
    differences and garbage throughput. Report the MEDIAN
    (``pipelined_median_s``): the min of noisy differences systematically
    selects maximum jitter and inflates throughput."""
    for _ in range(max(warmup, 1)):
        _fence(fn(*args))
    k = max(iters, 1)
    while True:
        t1 = fenced_window_s(fn, *args, iters=k)
        t2 = fenced_window_s(fn, *args, iters=2 * k)
        if t2 - t1 >= min_diff_s or k >= max_iters:
            break
        k *= 4
    windows = [(t2 - t1) / k]
    for _ in range(max(repeats, 1) - 1):
        t1 = fenced_window_s(fn, *args, iters=k)
        t2 = fenced_window_s(fn, *args, iters=2 * k)
        windows.append((t2 - t1) / k)
    valid = sorted(w for w in windows if w > 0)
    if not valid:
        # Even max_iters-call windows are jitter-dominated: report the
        # conservative whole-window mean (includes one RTT — upper bound)
        # and TAG it so mixed sweeps can tell this point apart from the
        # RTT-cancelled window-differenced ones (ADVICE r2 #4).
        pipelined_windows_s.last_was_fallback = True
        valid = [t2 / (2 * k)]
    else:
        pipelined_windows_s.last_was_fallback = False
    return valid


pipelined_windows_s.last_was_fallback = False


def pipelined_s(fn, *args, iters: int = 50, warmup: int = 1,
                repeats: int = 3, min_diff_s: float = 0.3,
                max_iters: int = 25600) -> float:
    """Median-window per-call device time (seconds) — the robust default
    (the best window under-reads by whatever the RTT jitter gave back).
    ``min_diff_s``/``max_iters`` bound the auto-scaling (a fast function can
    otherwise run ~1e5 calls per point — ADVICE r2 #4)."""
    w = pipelined_windows_s(fn, *args, iters=iters, warmup=warmup,
                            repeats=repeats, min_diff_s=min_diff_s,
                            max_iters=max_iters)
    return w[len(w) // 2]


def pipelined_best_s(fn, *args, iters: int = 50, warmup: int = 1,
                     repeats: int = 3, min_diff_s: float = 0.3,
                     max_iters: int = 25600) -> float:
    """Best-window per-call time — optimistic; prefer ``pipelined_s``."""
    return pipelined_windows_s(fn, *args, iters=iters, warmup=warmup,
                               repeats=repeats, min_diff_s=min_diff_s,
                               max_iters=max_iters)[0]


def blocking_latencies_s(fn, *args, iters: int = 50,
                         warmup: int = 3) -> list[float]:
    """Per-call fetch-fenced latencies (seconds) — includes the tunnel's
    value-fetch RTT; the p50/p90 user-experience numbers next to
    ``pipelined_s``."""
    for _ in range(warmup):
        _fence(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _fence(fn(*args))
        ts.append(time.perf_counter() - t0)
    return ts

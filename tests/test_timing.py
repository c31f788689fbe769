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
    pipelined_s,
    pipelined_windows_s,
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

"""Re-export of the fenced timing helpers (the canonical implementation
lives in the package: ``bayestpu.utils.timing``)."""

from bayestpu.utils.timing import (  # noqa: F401
    blocking_latencies_s,
    fenced_window_s,
    pipelined_best_s,
    pipelined_s,
    pipelined_windows_s,
)

"""Re-export of the fenced timing helpers (the canonical implementation
lives in the package: ``bayestpu.utils.timing``)."""

from bayestpu.utils.timing import (  # noqa: F401
    WindowResult,
    blocking_latencies_s,
    fenced_window_s,
    measure_windows,
    paired_compare,
    pipelined_best_s,
    pipelined_s,
    pipelined_windows_s,
    scan_compare,
    scan_time_s,
)

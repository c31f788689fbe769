from bayestpu.utils import profiler, rundb  # noqa: F401

from bayestpu.core import config, quant, rng  # noqa: F401

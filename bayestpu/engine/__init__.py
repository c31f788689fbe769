from bayestpu.engine import sampler  # noqa: F401
from bayestpu.engine.sampler import mc_logits, mc_moments, predictive  # noqa: F401

from bayestpu.engine import sampler  # noqa: F401
from bayestpu.engine.sampler import mc_logits, mc_moments, predictive  # noqa: F401


def __getattr__(name):
    # lazy to avoid circular imports (engine.engine imports metrics);
    # importlib avoids re-entering this __getattr__ via `from X import Y`.
    import importlib
    if name == "BayesEngine":
        return importlib.import_module("bayestpu.engine.engine").BayesEngine
    if name in ("sharding", "inference", "engine"):
        return importlib.import_module(f"bayestpu.engine.{name}")
    raise AttributeError(name)

"""bayestpu — a TPU-native engine for dropout-based Bayesian neural networks.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of the
os-hxfan/BayesNN_FPGA DAC'23/TCAD'23 artifact (Monte-Carlo Dropout and
Masksembles combined with multi-exit architectures), built for TPU:

- Dropout masks generated on the fly (threefry / in-kernel PRNG) — never
  materialized in HBM (ref: HLS dropout layers in the hls4ml fork, enabled by
  ``cfg['Bayes']=True`` in ``Hardware_Artifact/bayes_hw/hls4ml_build.py:109``).
- Masksembles fixed-mask banks with on-device bank selection
  (ref: ``Hardware_Artifact/converter/keras/Masksembles.py``).
- Multi-exit networks emitting per-exit logits, exit-ensembling and
  confidence-gated early exit (ref: ``Software_Artifact/software/models``).
- The MC sample dimension as the primary parallel axis: vmap on chip
  ("spatial" mapping), lax.scan ("temporal" mapping), pjit-sharded across a
  device mesh (ref: S_*/T_* models in ``Hardware_Artifact/bayes_hw/models``).
- An int8 quantized inference path mirroring the QKeras
  ``quantized_bits(8, 0, alpha=1)`` operating point.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent XLA compilation cache: every CLI stage (train → predict →
# analyze) is its own process; without this each one re-pays ~60 s per jit
# compile of the same executables. ≙ the reference's on-disk hls4ml project
# dirs (generated C++ reused across runs). Opt out: BAYESTPU_NO_XLA_CACHE=1.
if (_jax.config.jax_compilation_cache_dir is None
        and not _os.environ.get("BAYESTPU_NO_XLA_CACHE")):
    # One cache dir per platform setting: under the axon plugin even CPU
    # helper executables may be compiled on the REMOTE host (different CPU
    # features) — sharing a dir with local-CPU test runs risks SIGILL.
    _plat = _jax.config.jax_platforms or "default"
    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get("JAX_COMPILATION_CACHE_DIR",
                        _os.path.expanduser(f"~/.cache/bayestpu_xla_{_plat}")))
    # Threshold 0: on a tunneled TPU even sub-second eager-op compiles cost
    # an RPC each; caching them all is what makes re-running a CLI fast.
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from bayestpu.core import rng, quant  # noqa: F401
from bayestpu.core.config import (  # noqa: F401
    BayesConfig,
    DropoutKind,
    EngineConfig,
    SamplingMode,
)

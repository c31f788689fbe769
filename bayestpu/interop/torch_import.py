"""Import PyTorch weights into bayestpu models.

The BASELINE north star requires the engine to "consume the repo's
PyTorch/Keras model definitions". The reference's own bridging is manual
(README: "Better automation between pytorch and qkeras" is a listed
limitation, ``Hardware_Artifact/README.md:30``); this module automates the
torch side:

- layout conversion torch→TPU: conv ``(O, I, kh, kw)`` → ``(kh, kw, I, O)``
  (OIHW → HWIO), linear ``(out, in)`` → ``(in, out)``;
- the flatten-order fix: torch flattens NCHW (index ``c·H·W + h·W + w``),
  channels-last flattens NHWC (``h·W·C + w·C + c``) — the first dense layer
  after a flatten needs its input rows permuted accordingly;
- BatchNorm mapping (weight/bias/running_mean/running_var → scale/bias/
  mean/var in flax's ``batch_stats``);
- key re-mapping mirrors the reference's own porting helper
  (``vgg_pytorch_to_new_vgg`` + ``check_weight_load``,
  ``Software_Artifact/software/models/vgg19/vgg19.py:53-84``).

Everything takes plain numpy state dicts, so torch is only needed by the
caller, not by this module.
"""

from __future__ import annotations

import numpy as np


def conv_weight(w: np.ndarray) -> np.ndarray:
    """torch conv (O, I, kh, kw) → flax/TPU (kh, kw, I, O)."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def linear_weight(w: np.ndarray) -> np.ndarray:
    """torch linear (out, in) → (in, out)."""
    return np.transpose(np.asarray(w), (1, 0))


def flatten_permutation(c: int, h: int, w: int) -> np.ndarray:
    """Row permutation for the first dense after a flatten.

    Returns ``perm`` with ``perm[nhwc_index] = nchw_index`` so that
    ``kernel_tpu = linear_weight(w_torch)[perm]`` consumes channels-last
    flattened activations.
    """
    idx = np.arange(c * h * w).reshape(c, h, w)       # nchw flat index grid
    return idx.transpose(1, 2, 0).reshape(-1)          # walk in nhwc order


def linear_weight_after_flatten(w: np.ndarray, c: int, h: int, wdim: int
                                ) -> np.ndarray:
    return linear_weight(w)[flatten_permutation(c, h, wdim)]


def batchnorm_params(prefix: str, sd: dict) -> tuple[dict, dict]:
    """(params, batch_stats) entries for one torch BatchNorm layer."""
    params = {"scale": np.asarray(sd[f"{prefix}.weight"]),
              "bias": np.asarray(sd[f"{prefix}.bias"])}
    stats = {"mean": np.asarray(sd[f"{prefix}.running_mean"]),
             "var": np.asarray(sd[f"{prefix}.running_var"])}
    return params, stats


def check_weight_load(expected: np.ndarray, loaded: np.ndarray,
                      atol: float = 0.0) -> None:
    """Assert a known weight survived the port (≙ ``check_weight_load``,
    ``vgg19.py:53-64``)."""
    if not np.allclose(expected, loaded, atol=atol):
        raise ValueError("weight port mismatch: max abs diff "
                         f"{np.abs(np.asarray(expected) - np.asarray(loaded)).max()}")

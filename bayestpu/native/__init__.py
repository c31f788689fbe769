"""Native (C++) host-side components, built on demand with g++.

The reference's native layer is the hls4ml fork's generated C++ (csim libs
compiled per model, ``hls_model.compile()``). Here the native layer serves
the host side of the TPU flow: the KDE-ECE finalizer (``kde_ece.cc``) and
the fused data-pipeline batch assembler (``data_pipeline.cc``). The library
builds lazily on first use (mirroring the reference's compile-on-demand
csim), is cached next to the source, and every native entry point has a
pure-Python reference implementation — ``bayestpu.metrics.kde``,
``bayestpu.data.pipeline`` — that tests compare against bit-for-bit(-ish
for float KDE, exact for the pipeline PRNG).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRCS = [os.path.join(_DIR, "kde_ece.cc"),
         os.path.join(_DIR, "data_pipeline.cc")]
_LIB = os.path.join(_DIR, "_bayestpu_native.so")
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_build_error: str | None = None


def _build() -> str | None:
    """Compile the shared library; returns an error string or None."""
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-fopenmp", *_SRCS, "-o", _LIB]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        return f"g++ unavailable: {e}"
    if proc.returncode != 0:
        return f"g++ failed: {proc.stderr[-500:]}"
    return None


def load() -> ctypes.CDLL | None:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        if not os.path.exists(_LIB) or any(
                os.path.getmtime(_LIB) < os.path.getmtime(s) for s in _SRCS):
            _build_error = _build()
            if _build_error is not None:
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError as e:
            _build_error = str(e)
            return None
        lib.bayestpu_kde_ece.restype = ctypes.c_double
        lib.bayestpu_kde_ece.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64, ctypes.c_int]
        lib.bayestpu_augment_gather.restype = None
        lib.bayestpu_augment_gather.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_uint64, ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def augment_gather(src: np.ndarray, idx: np.ndarray,
                   mean: np.ndarray, std: np.ndarray,
                   pad: int, seed: int, train: bool) -> np.ndarray:
    """Fused gather+crop+flip+normalize batch assembly (native).

    Same contract as ``bayestpu.data.pipeline.augment_gather_ref``; raises
    RuntimeError if the library can't be built.
    """
    lib = load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_build_error}")
    src = np.ascontiguousarray(src, np.float32)
    idx = np.ascontiguousarray(idx, np.int64)
    b = idx.shape[0]
    _, h, w, c = src.shape
    mean = np.ascontiguousarray(mean, np.float32).reshape(c)
    std = np.ascontiguousarray(std, np.float32).reshape(c)
    out = np.empty((b, h, w, c), np.float32)
    lib.bayestpu_augment_gather(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        b, h, w, c,
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pad, ctypes.c_uint64(seed & 0xFFFFFFFFFFFFFFFF), int(train))
    return out


def kde_ece(probs: np.ndarray, labels: np.ndarray, order: int = 1
            ) -> float:
    """Native KDE ECE; same contract as ``bayestpu.metrics.kde.ece_kde``.

    Raises RuntimeError if the native library cannot be built — callers
    that want the automatic fallback should use ``metrics.kde.ece_kde``.
    """
    lib = load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_build_error}")
    probs = np.asarray(probs, np.float64)
    labels = np.asarray(labels)
    if labels.ndim == 2:
        labels = labels.argmax(-1)
    probs = np.clip(probs, 1e-256, 1 - 1e-256)
    pred = probs.argmax(-1)
    conf = np.ascontiguousarray(
        probs[np.arange(len(probs)), pred] / probs.sum(-1))
    correct = np.ascontiguousarray(
        (pred == labels).astype(np.uint8))
    return float(lib.bayestpu_kde_ece(
        conf.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        correct.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(conf), order))

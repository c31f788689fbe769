"""Host-side batch pipeline: fused gather + augment + normalize.

The reference assembles training batches through per-image Python transform
stacks — torchvision ``RandomCrop(32, padding=4)`` +
``RandomHorizontalFlip`` + ``Normalize`` inside torch ``DataLoader`` workers
(``Software_Artifact/software/datasets/dataset_loader.py:103-108,160-172``)
and Keras ``ImageDataGenerator`` (``Hardware_Artifact/bayes_hw/
train_qkeras.py:152-160``). Here the whole batch is assembled by ONE native
call (``bayestpu/native/data_pipeline.cc``): gather of the shuffled rows,
zero-pad random crop, horizontal flip, and channel normalization fused in a
single threaded pass — so the host never bottlenecks the TPU step and no
intermediate padded/unnormalized copies exist.

Augmentation decisions come from splitmix64(seed, row) — reproduced exactly
by the numpy fallback in this module, so native and fallback paths are
bit-identical and tested against each other (the same native↔reference twin
rule the KDE-ECE component follows).

``random_crop_flip`` in ``bayestpu.data.augment`` remains the on-device
(TPU) alternative; this module is the host-native one. Use the host path
when the model step is short (small CNNs — exactly this framework's zoo) and
the device path when spare TPU cycles are free.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

_M64 = np.uint64(0xFFFFFFFFFFFFFFFF)
_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 — must match ``data_pipeline.cc`` exactly."""
    with np.errstate(over="ignore"):
        x = (x + _GOLD).astype(np.uint64)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def _draws(seed: int, n: int, pad: int
           ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-row (oy, ox, flip) decisions, identical to the C++ derivation."""
    i = np.arange(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        r = _splitmix64(np.uint64(seed & 0xFFFFFFFFFFFFFFFF) ^ (i * _GOLD))
    span = np.uint64(2 * pad + 1)
    oy = (r % span).astype(np.int64)
    r2 = _splitmix64(r)
    ox = (r2 % span).astype(np.int64)
    flip = (_splitmix64(r2) & np.uint64(1)).astype(bool)
    return oy, ox, flip


def augment_gather_ref(src: np.ndarray, idx: np.ndarray,
                       mean: np.ndarray, std: np.ndarray,
                       pad: int, seed: int, train: bool) -> np.ndarray:
    """Pure-numpy reference twin of ``native.augment_gather``."""
    src = np.asarray(src, np.float32)
    batch = src[np.asarray(idx, np.int64)]
    b, h, w, c = batch.shape
    mean = np.asarray(mean, np.float32).reshape(c)
    std = np.asarray(std, np.float32).reshape(c)
    if train and pad > 0:
        oy, ox, flip = _draws(seed, b, pad)
        padded = np.pad(batch,
                        ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        out = np.empty_like(batch)
        for i in range(b):
            img = padded[i, oy[i]:oy[i] + h, ox[i]:ox[i] + w]
            out[i] = img[:, ::-1] if flip[i] else img
        batch = out
    return ((batch - mean) / std).astype(np.float32)


def augment_gather(src: np.ndarray, idx: np.ndarray,
                   mean: np.ndarray | None = None,
                   std: np.ndarray | None = None,
                   pad: int = 4, seed: int = 0, train: bool = True,
                   use_native: bool | None = None) -> np.ndarray:
    """Assemble one batch; native fast path with automatic numpy fallback."""
    c = src.shape[-1]
    mean = np.zeros(c, np.float32) if mean is None else mean
    std = np.ones(c, np.float32) if std is None else std
    if use_native is not False:
        try:
            from bayestpu import native
            if native.available():
                return native.augment_gather(src, idx, mean, std, pad, seed,
                                             train)
        except Exception:
            if use_native:  # explicitly requested → surface the failure
                raise
    return augment_gather_ref(src, idx, mean, std, pad, seed, train)


class BatchPipeline:
    """Epoch iterator over (x, y) with fused native batch assembly.

    Drop-in replacement for ``datasets.iterate_batches`` + on-device
    ``random_crop_flip``: shuffles per epoch, drops the remainder (static
    shapes for jit; Masksembles batch-divisibility), assembles each batch
    with one native call.
    """

    def __init__(self, x: np.ndarray, y: np.ndarray, batch_size: int,
                 mean=None, std=None, pad: int = 4, train: bool = True,
                 seed: int = 0, use_native: bool | None = None):
        self.x = np.ascontiguousarray(x, np.float32)
        self.y = np.asarray(y)
        self.batch_size = batch_size
        self.mean, self.std = mean, std
        self.pad, self.train = pad, train
        self.seed = seed
        self.use_native = use_native
        self._epoch = 0

    def seek(self, epoch: int) -> None:
        """Position the epoch counter (shuffle/augment seeds are a pure
        function of it) — resumed training replays the right orders."""
        self._epoch = epoch

    def __iter__(self) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        n = self.x.shape[0]
        rng = np.random.default_rng(self.seed + self._epoch)
        order = rng.permutation(n) if self.train else np.arange(n)
        bs = self.batch_size
        for start in range(0, n - n % bs, bs):
            idx = order[start:start + bs]
            xb = augment_gather(self.x, idx, self.mean, self.std, self.pad,
                                seed=self.seed * 1_000_003 + self._epoch
                                * 131 + start,
                                train=self.train,
                                use_native=self.use_native)
            yield xb, self.y[idx]
        self._epoch += 1


class PrefetchIterator:
    """Overlap host batch assembly + H2D transfer with device compute.

    Wraps any (x, y) batch iterator: a worker thread runs the underlying
    iterator (native gather/augment) and eagerly ``jax.device_put``s the
    next ``depth`` batches while the device is busy with the current step —
    the host never sits on the critical path. The reference gets this from
    torch ``DataLoader(num_workers=…)`` prefetching
    (``dataset_loader.py:160-172``); this is the JAX-native equivalent.
    """

    def __init__(self, it, depth: int = 2, device=None):
        import queue
        import threading

        self._q = queue.Queue(maxsize=depth)
        self._sentinel = object()
        self._err = None

        def work():
            import jax
            try:
                for x, y in it:
                    self._q.put((jax.device_put(x, device),
                                 jax.device_put(y, device)))
            except BaseException as e:  # surfaced on the consumer side
                self._err = e
            finally:
                self._q.put(self._sentinel)

        self._thread = threading.Thread(target=work, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._sentinel:
            self._thread.join()
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item

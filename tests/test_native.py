"""Native C++ KDE-ECE vs the pure-Python reference implementation."""

import numpy as np
import pytest

from bayestpu import native
from bayestpu.metrics.kde import ece_kde

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="g++ toolchain unavailable")


def _case(seed, n=4000, c=10):
    rng = np.random.default_rng(seed)
    logits = 3 * rng.normal(size=(n, c))
    labels = np.argmax(logits + rng.normal(size=(n, c)), -1)
    probs = np.exp(logits)
    probs /= probs.sum(1, keepdims=True)
    return probs, labels


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_matches_python(seed):
    probs, labels = _case(seed)
    py = ece_kde(probs, labels, native=False)
    cc = native.kde_ece(probs, labels)
    np.testing.assert_allclose(cc, py, rtol=1e-9, atol=1e-12)


def test_binary_case():
    rng = np.random.default_rng(3)
    n = 2000
    labels = rng.integers(0, 2, n)
    pred = np.where(rng.random(n) < 0.8, labels, 1 - labels)
    probs = np.zeros((n, 2))
    probs[np.arange(n), pred] = 0.8 + rng.normal(0, 0.02, n)
    probs[:, 0] = np.clip(probs[:, 0], 0.01, 0.99)
    probs[:, 1] = 1 - probs[:, 0]
    py = ece_kde(probs, labels, native=False)
    cc = native.kde_ece(probs, labels)
    np.testing.assert_allclose(cc, py, rtol=1e-9, atol=1e-12)


def test_default_dispatch_prefers_native():
    probs, labels = _case(5)
    auto = ece_kde(probs, labels)          # default dispatch
    cc = native.kde_ece(probs, labels)
    assert auto == cc


# ---------------------------------------------------------- data pipeline

def test_augment_gather_native_matches_reference():
    """The C++ pipeline and the numpy twin share the splitmix64 PRNG →
    bit-identical batches."""
    from bayestpu.data import pipeline
    rng = np.random.default_rng(7)
    src = rng.random((512, 32, 32, 3), dtype=np.float32)
    idx = rng.integers(0, 512, 64)
    mean = np.array([0.49, 0.48, 0.45], np.float32)
    std = np.array([0.25, 0.24, 0.26], np.float32)
    for train in (True, False):
        a = native.augment_gather(src, idx, mean, std, 4, 99, train)
        b = pipeline.augment_gather_ref(src, idx, mean, std, 4, 99, train)
        assert np.array_equal(a, b)


def test_augment_gather_semantics():
    from bayestpu.data import pipeline
    src = np.random.default_rng(0).random((32, 28, 28, 1), dtype=np.float32)
    idx = np.arange(8)
    # eval path = plain gather + normalize
    out = pipeline.augment_gather(src, idx, pad=4, train=False)
    assert np.array_equal(out, src[:8])
    # train path: every output pixel either 0 (pad) or present in source
    out = pipeline.augment_gather(src, idx, pad=4, train=True, seed=3)
    assert out.shape == (8, 28, 28, 1)
    assert not np.array_equal(out, src[:8])  # some crop/flip happened


def test_batch_pipeline_iterates():
    from bayestpu.data.pipeline import BatchPipeline
    x = np.random.default_rng(0).random((100, 28, 28, 1), dtype=np.float32)
    y = np.arange(100) % 10
    pipe = BatchPipeline(x, y, batch_size=32, pad=4, train=True, seed=0)
    batches = list(pipe)
    assert len(batches) == 3 and batches[0][0].shape == (32, 28, 28, 1)
    first_epoch = batches[0][0].copy()
    batches2 = list(pipe)           # epoch 2 reshuffles + fresh augment
    assert not np.array_equal(first_epoch, batches2[0][0])

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

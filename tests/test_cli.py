"""End-to-end CLI smoke tests (CPU, synthetic data).

≙ the reference's executable-script verification culture (SURVEY §4): every
CLI runs the whole pipeline on tiny settings. Uses ``main(argv)`` entry
points directly so coverage/tracebacks stay in-process.
"""

import json
import os

import pytest

from bayestpu.cli import analyze as cli_analyze
from bayestpu.cli import predict as cli_predict
from bayestpu.cli import sweep as cli_sweep
from bayestpu.cli import time_cost as cli_time_cost
from bayestpu.cli import train as cli_train


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("run") / "ckpt")
    res = cli_train.main([
        "--model", "lenet_me", "--dataset", "mnist",
        "--dropout_type", "mc", "--mc_samples", "3",
        "--epochs", "1", "--batch_size", "64", "--out", out,
        "--data_dir", "/nonexistent"])
    return out, res


def test_train_cli(trained):
    out, res = trained
    assert res["synthetic"] is True
    assert os.path.isdir(res["checkpoint"])
    assert 0.0 <= res["acc"] <= 1.0 and "aPE_ood" in res


@pytest.mark.slow  # heavy; full tier runs it (pytest -m "")
def test_train_cli_host_pipeline(tmp_path):
    out = str(tmp_path / "ckpt")
    res = cli_train.main([
        "--model", "lenet", "--dataset", "mnist", "--dropout_type", "mc",
        "--mc_samples", "2", "--epochs", "1", "--batch_size", "64",
        "--augment", "--pipeline", "host", "--accum_steps", "2",
        "--val_mode", "ce", "--out", out, "--data_dir", "/nonexistent"])
    assert 0.0 <= res["acc"] <= 1.0


def test_predict_cli(trained):
    out, _ = trained
    res = cli_predict.main([
        "--model", "lenet_me", "--dataset", "mnist",
        "--dropout_type", "mc", "--mc_samples", "3",
        "--load_model", out, "--eval_images", "64",
        "--data_dir", "/nonexistent"])
    assert "temporal" in res and "spatial" in res
    assert abs(res["temporal"]["acc"] - res["spatial"]["acc"]) < 0.2


def test_predict_cli_repeated(trained, tmp_path):
    out, _ = trained
    log = str(tmp_path / "log_0.txt")
    res = cli_predict.main([
        "--model", "lenet_me", "--dataset", "mnist",
        "--dropout_type", "mc", "--mc_samples", "2",
        "--load_model", out, "--eval_images", "32", "--passes", "2",
        "--log", log, "--data_dir", "/nonexistent"])
    assert res["spatial"]["passes"] == 2 and "acc_std" in res["spatial"]
    assert os.path.exists(log + ".spatial")


def test_analyze_cli(trained, tmp_path):
    out, _ = trained
    res = cli_analyze.main([
        "--model", "lenet_me", "--dataset", "mnist",
        "--dropout_type", "mc", "--mc_samples", "2",
        "--load_model", out, "--eval_images", "64",
        "--out", str(tmp_path / "an"), "--data_dir", "/nonexistent"])
    assert os.path.exists(res["log"])


def test_sweep_cli(tmp_path):
    res = cli_sweep.main(["dropouts", "--max_n", "2", "--mc_samples", "2",
                          "--out", str(tmp_path)])
    assert len(res["rows"]) == 2
    assert all(r["samples_per_s"] > 0 for r in res["rows"])
    with open(tmp_path / "dropouts.json") as f:
        assert json.load(f)["sweep"] == "dropouts"


def test_sweep_cli_samples(tmp_path):
    res = cli_sweep.main(["samples", "--model", "lenet", "--values", "2",
                          "--batch", "8", "--out", str(tmp_path)])
    modes = {r["mode"] for r in res["rows"]}
    assert modes == {"spatial", "temporal"}


def test_time_cost_cli(tmp_path):
    res = cli_time_cost.main(["lenet", "--loops", "2",
                              "--out_dir", str(tmp_path)])
    assert os.path.exists(os.path.join(str(tmp_path), "lenet.txt"))
    assert res["convert_s"] >= 0


def test_figures_cli(tmp_path):
    from bayestpu.cli import figures as cli_figures
    sw = cli_sweep.main(["masks", "--max_n", "3", "--out", str(tmp_path)])
    assert sw["rows"]
    out = cli_figures.main([str(tmp_path / "masks.json"),
                            "--out", str(tmp_path / "figs")])
    figs = out["figures"] if isinstance(out, dict) else out
    assert any(str(p).endswith(".png") for p in figs)


@pytest.mark.slow  # heavy; full tier runs it (pytest -m "")
def test_train_cli_rundb(tmp_path):
    res = cli_train.main([
        "--model", "lenet_me", "--dataset", "mnist", "--dropout_type", "mc",
        "--mc_samples", "2", "--epochs", "1", "--batch_size", "64",
        "--out", str(tmp_path / "ckpt"), "--runs_db", str(tmp_path / "runs"),
        "--data_dir", "/nonexistent"])
    rd = tmp_path / "runs" / str(res["run_id"])
    cfg = json.loads((rd / "config.json").read_text())
    assert cfg["name"].startswith("me_mc_droprate")
    assert (rd / "metrics.jsonl").exists() and (rd / "log.txt").exists()


@pytest.mark.slow  # heavy; full tier runs it (pytest -m "")
def test_train_cli_sharded_and_resume(tmp_path):
    """Data-parallel training over the 8-device virtual mesh through the CLI
    surface (P8), then --resume continues from the rolling checkpoint."""
    out = str(tmp_path / "ckpt")
    res = cli_train.main([
        "--model", "lenet", "--dataset", "mnist", "--dropout_type", "mc",
        "--mc_samples", "2", "--epochs", "1", "--batch_size", "64",
        "--opt_mode", "sharded", "--out", out,
        "--data_dir", "/nonexistent"])
    assert 0.0 <= res["acc"] <= 1.0
    assert os.path.isdir(out + "_last"), "rolling checkpoint missing"
    res2 = cli_train.main([
        "--model", "lenet", "--dataset", "mnist", "--dropout_type", "mc",
        "--mc_samples", "2", "--epochs", "2", "--batch_size", "64",
        "--opt_mode", "sharded", "--out", out, "--resume",
        "--data_dir", "/nonexistent"])
    assert 0.0 <= res2["acc"] <= 1.0


def test_build_cli(trained, tmp_path):
    from bayestpu.cli import build as cli_build
    out, _ = trained
    prj = str(tmp_path / "prj")
    res = cli_build.main([
        "--model", "lenet_me", "--dataset", "mnist",
        "--dropout_type", "mc", "--mc_samples", "3",
        "--load_model", out, "--batch", "32",
        "--build_strategy", "latency", "--output_dir", prj,
        "--data_dir", "/nonexistent"])
    assert res["strategy_mode"] == "spatial"
    assert res["compile_seconds"] > 0 and res["flops"]
    assert os.path.exists(os.path.join(prj, "build_report.json"))


def test_build_cli_mem_limit_degrades(trained, tmp_path):
    from bayestpu.cli import build as cli_build
    out, _ = trained
    res = cli_build.main([
        "--model", "lenet_me", "--dataset", "mnist",
        "--dropout_type", "mc", "--mc_samples", "3",
        "--load_model", out, "--batch", "32",
        "--build_strategy", "latency", "--mem_limit", "1",
        "--output_dir", str(tmp_path / "prj2"),
        "--data_dir", "/nonexistent"])
    # 1-byte budget forces the temporal (resource) rebuild
    assert res["degraded_to_resource"] is True
    assert res["strategy_mode"] == "temporal"


def test_driver_scripts_parse():
    # every experiment driver must at least be valid bash (≙ the reference's
    # ~60 script tree, SURVEY §2.8)
    import glob
    import subprocess
    scripts = glob.glob("scripts/**/*.sh", recursive=True)
    assert len(scripts) >= 30
    for s in scripts:
        subprocess.run(["bash", "-n", s], check=True)

"""Profiler cost reports + run-db logging."""

import json
import os

import jax.numpy as jnp
import numpy as np

from bayestpu.utils import profiler, rundb


def test_cost_report_matmul():
    a = jnp.zeros((256, 256))
    rep = profiler.cost_report(lambda x: x @ x, a)
    # 2*M*N*K = 33.5 MFLOP
    assert rep["flops"] is not None
    np.testing.assert_allclose(rep["flops"], 2 * 256 ** 3, rtol=0.1)


def test_roofline_fields():
    a = jnp.zeros((256, 256))
    r = profiler.roofline(lambda x: x @ x, a, iters=3)
    assert r["bound"] in ("compute", "memory")
    assert r["seconds"] > 0
    assert 0 <= r["fraction_of_peak"]


def test_measure_positive():
    a = jnp.ones((64, 64))
    assert profiler.measure(lambda x: x * 2, a, iters=3) > 0


def test_rundb_roundtrip(tmp_path):
    run = rundb.Run(str(tmp_path), config={"lr": 0.1, "model": "lenet"},
                    name="t")
    run.log_metrics(0, loss=1.5, acc=0.2)
    run.log_metrics(1, loss=1.2, acc=0.4)
    with run.capture_stdout():
        print("hello from the run")
    run.close()
    d = tmp_path / str(run.run_id)
    cfg = json.loads((d / "config.json").read_text())
    assert cfg["config"]["lr"] == 0.1
    lines = (d / "metrics.jsonl").read_text().strip().splitlines()
    assert len(lines) == 2 and json.loads(lines[1])["loss"] == 1.2
    assert "hello from the run" in (d / "log.txt").read_text()


def test_rundb_increments_ids(tmp_path):
    r1 = rundb.Run(str(tmp_path))
    r2 = rundb.Run(str(tmp_path))
    assert r2.run_id == r1.run_id + 1
    r1.close(); r2.close()

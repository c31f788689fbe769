"""True multi-process distributed runtime test (VERDICT r1 item 3).

Launches 2 OS processes × 4 virtual CPU devices each, connected through
``jax.distributed.initialize`` over a local coordinator — the no-cluster
analogue of a 2-host TPU pod (SURVEY §4.6/§5.8). Asserts the cross-process
psum'd metrics (acc / NLL / ECE bins) and the data-parallel gradient norm
equal the single-process 8-device values.
"""

import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

from bayestpu.core.config import BayesConfig
from bayestpu.core.rng import BAYES_RNG
from bayestpu.engine import distributed, sharding
from bayestpu.nn.zoo import get_model

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 virtual devices")

# spawns real OS processes over jax.distributed + gloo (minutes) — excluded
# from the default suite; run with `pytest -m ""` (VERDICT r4 next #7)
pytestmark = pytest.mark.slow

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "multiprocess_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _single_process_reference():
    """Same computation as the worker, on this process's 8-device mesh."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    key = jax.random.key(0)
    model = get_model("lenet", bayes=BayesConfig(rate=0.3))
    x = jax.random.normal(key, (32, 28, 28, 1))
    y = jax.random.randint(jax.random.fold_in(key, 1), (32,), 0, 10)
    vs = model.init({"params": key, BAYES_RNG: key}, x)
    mesh = sharding.make_mesh(2, 4)
    mets = distributed.distributed_evaluate(model, vs, x, y, 8, mesh, key)

    # fused-kernel twin: sample axis over all 8 devices (the worker runs
    # the identical computation with the sample axis crossing processes)
    model_f = get_model("lenet",
                        bayes=BayesConfig(kind="mask", num_masks=4,
                                          scale=2.0), fused=True)
    vs_f = model_f.init({"params": key, BAYES_RNG: key}, x)
    mets_f = distributed.distributed_evaluate(
        model_f, vs_f, x, y, 8, sharding.make_mesh(1, 8), key)

    dp = sharding.make_mesh(8, 1)
    xs = distributed.put_global(x, dp, P("data"))
    ys = distributed.put_global(y, dp, P("data"))

    @jax.jit
    def grad_norm(params, xb, yb):
        def loss(p):
            out = model.apply({**vs, "params": p}, xb, train=True,
                              rngs={BAYES_RNG: jax.random.key(7)})
            lp = jax.nn.log_softmax(out.logits[-1])
            return -jnp.mean(jnp.take_along_axis(lp, yb[:, None], -1))
        g = jax.grad(loss)(params)
        return jnp.sqrt(sum(jnp.sum(t * t) for t in jax.tree.leaves(g)))

    return mets, mets_f, float(grad_norm(vs["params"], xs, ys))


@needs_8
def test_two_process_psum_matches_single_process():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(_WORKER)),
         env.get("PYTHONPATH", "")])
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, coord, "2", str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert line, f"no RESULT line in worker output:\n{out[-2000:]}"
        outs.append(json.loads(line[-1][len("RESULT "):]))

    # both processes see identical psum'd global metrics
    for k in ("acc", "nll", "ece", "n"):
        assert outs[0]["metrics"][k] == pytest.approx(
            outs[1]["metrics"][k], abs=1e-6), k
        assert outs[0]["metrics_fused"][k] == pytest.approx(
            outs[1]["metrics_fused"][k], abs=1e-6), k
    assert outs[0]["grad_norm"] == pytest.approx(outs[1]["grad_norm"],
                                                 abs=1e-5)

    ref_mets, ref_fused, ref_gn = _single_process_reference()
    assert outs[0]["metrics"]["n"] == ref_mets["n"] == 32.0
    for k in ("acc", "nll", "ece"):
        assert outs[0]["metrics"][k] == pytest.approx(ref_mets[k], abs=2e-4), k
        # fused Pallas path: sample axis crossed the process boundary in the
        # workers; same bank + same keys → same metrics as single-process
        assert outs[0]["metrics_fused"][k] == pytest.approx(
            ref_fused[k], abs=2e-4), k
    assert outs[0]["grad_norm"] == pytest.approx(ref_gn, rel=2e-4)

"""Distributed evaluation on the 8-device virtual CPU mesh (SURVEY §4.6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayestpu.core.config import BayesConfig
from bayestpu.core.rng import BAYES_RNG
from bayestpu.engine import distributed, sharding
from bayestpu.metrics.ece import ece_equal_width
from bayestpu.nn.zoo import get_model

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 virtual devices")


@needs_8
def test_make_mesh_shapes():
    mesh = sharding.make_mesh(4, 2)
    assert mesh.shape == {"data": 4, "sample": 2}
    mesh2 = sharding.make_mesh()  # defaults to all-sample
    assert mesh2.shape["sample"] == 8


@needs_8
def test_sharded_predictive_matches_local(key):
    model = get_model("lenet", bayes=BayesConfig(rate=0.3))
    x = jax.random.normal(key, (16, 28, 28, 1))
    vs = model.init({"params": key, BAYES_RNG: key}, x)
    mesh = sharding.make_mesh(2, 4)
    from bayestpu.engine import sampler
    k = jax.random.key(5)
    local = sampler.predictive(model, vs, x, k, 8)
    shard = sharding.sharded_predictive(model, vs, x, k, 8, mesh)
    # same per-sample keys (fold_in by index) → same mean up to float assoc
    np.testing.assert_allclose(np.asarray(shard.probs),
                               np.asarray(local.probs), rtol=1e-4, atol=1e-5)


@needs_8
def test_sample_padding_to_mesh():
    model = get_model("lenet", bayes=BayesConfig(rate=0.3))
    key = jax.random.key(0)
    x = jnp.zeros((8, 28, 28, 1))
    vs = model.init({"params": key, BAYES_RNG: key}, x)
    mesh = sharding.make_mesh(2, 4)
    pred = sharding.sharded_predictive(model, vs, x, key, 6, mesh)
    assert pred.num_samples == 8  # padded up to sample-axis multiple


@needs_8
def test_distributed_evaluate_matches_unsharded(key):
    model = get_model("lenet", bayes=BayesConfig(rate=0.0))
    x = jax.random.normal(key, (32, 28, 28, 1))
    y = jax.random.randint(jax.random.fold_in(key, 1), (32,), 0, 10)
    vs = model.init({"params": key, BAYES_RNG: key}, x)
    mesh = sharding.make_mesh(4, 2)
    mets = distributed.distributed_evaluate(model, vs, x, y, 2, mesh)
    # rate 0 → deterministic; compare against plain forward
    out = model.apply(vs, x, rngs={BAYES_RNG: key})
    probs = jax.nn.softmax(out.logits[-1], axis=-1)
    want_acc = float((jnp.argmax(probs, -1) == y).mean())
    np.testing.assert_allclose(mets["acc"], want_acc, atol=1e-6)
    np.testing.assert_allclose(mets["ece"],
                               float(ece_equal_width(probs, y)), atol=1e-5)
    assert mets["n"] == 32


def test_initialize_single_host_noop():
    distributed.initialize()  # must not raise on one host


def test_data_parallel_train_loop(key):
    """train_loop(mesh=...) — params replicated, batches sharded over
    `data`, loss decreases (P8; SURVEY §2.10)."""
    import numpy as np
    import optax
    from bayestpu.core.config import BayesConfig
    from bayestpu.engine import sharding
    from bayestpu.nn.zoo import get_model
    from bayestpu.train.loop import create_state, train_loop

    mesh = sharding.make_mesh(4, 2)
    model = get_model("lenet", bayes=BayesConfig(rate=0.1))
    xs = np.random.default_rng(0).random((3, 16, 28, 28, 1), np.float32)
    ys = (np.arange(3 * 16) % 10).astype(np.int32).reshape(3, 16)

    def batches():
        return [(xs[i], ys[i]) for i in range(3)]

    losses = []
    tx = optax.sgd(0.1)
    state = create_state(model, tx, key, jnp.asarray(xs[0]))
    state = train_loop(model, state, tx, batches, key, num_epochs=3,
                       mesh=mesh,
                       log_fn=lambda s: losses.append(
                           float(s.split("loss ")[1].split()[0])))
    assert losses[-1] < losses[0]
    # params stayed replicated across the mesh
    leaf = jax.tree.leaves(state.params)[0]
    assert len(leaf.sharding.device_set) == 8


@needs_8
def test_sharded_predictive_fused_kernels(key):
    """The fused Pallas masked kernels compile and run under the sharded
    (data x sample) mesh, bit-identical to the local spatial path — the
    sample-sharded analogue of the fabric's replicated masked heads."""
    from bayestpu.core.config import DropoutKind
    from bayestpu.engine import sampler

    for kind, kw in ((DropoutKind.MC, dict(rate=0.3)),
                     (DropoutKind.MASK, dict(num_masks=4, scale=2.0))):
        model = get_model("lenet", bayes=BayesConfig(kind=kind, **kw),
                          fused=True)
        x = jax.random.normal(key, (16, 28, 28, 1))
        vs = model.init({"params": key, BAYES_RNG: key}, x)
        mesh = sharding.make_mesh(2, 4)
        k = jax.random.key(5)
        local = sampler.predictive(model, vs, x, k, 8)
        shard = sharding.sharded_predictive(model, vs, x, k, 8, mesh)
        np.testing.assert_allclose(np.asarray(shard.probs),
                                   np.asarray(local.probs),
                                   rtol=1e-4, atol=1e-5)


@needs_8
@pytest.mark.slow  # heavy; full tier runs it (pytest -m "")
def test_sharded_predictive_int8_flagship(key):
    """BASELINE config 5 under sharding (VERDICT r4 next #3): the int8
    resnet18_me (CIFAR-100 shapes) — int8 Pallas kernels (interpret mode on
    CPU devices) plus the layer-to-layer int8 residency handoffs — must
    compile under the sharded jit and agree with the single-device spatial
    path."""
    from bayestpu.core.config import QuantConfig
    from bayestpu.engine import sampler

    model = get_model(
        "resnet18_me", bayes=BayesConfig(rate=0.25), fused=True,
        quant=QuantConfig(total_bits=8, integer_bits=0, int8_infer=True),
        num_classes=100)
    x = jax.random.normal(key, (8, 32, 32, 3))
    vs = model.init({"params": key, BAYES_RNG: key}, x)
    mesh = sharding.make_mesh(2, 4)
    k = jax.random.key(5)
    local = sampler.predictive(model, vs, x, k, 4)
    shard = sharding.sharded_predictive(model, vs, x, k, 4, mesh)
    np.testing.assert_allclose(np.asarray(shard.probs),
                               np.asarray(local.probs),
                               rtol=1e-4, atol=1e-5)


@needs_8
def test_fused_data_parallel_train_step(key):
    """One data-parallel train step through the fused dropout_matmul /
    dropout_conv VJPs with the batch sharded over all 8 devices."""
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from bayestpu.train.loop import create_state, make_train_step

    model = get_model("lenet_me", bayes=BayesConfig(rate=0.25), fused=True)
    x = jnp.zeros((32, 28, 28, 1))
    y = jnp.zeros((32,), jnp.int32)
    tx = optax.sgd(0.1, 0.9)
    state = create_state(model, tx, key, x)
    mesh = sharding.make_mesh(8, 1)
    params = sharding.replicate(state.params, mesh)
    extra = sharding.replicate(state.extra, mesh)
    opt_state = sharding.replicate(state.opt_state, mesh)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    ys = jax.device_put(y, NamedSharding(mesh, P("data")))
    step = make_train_step(model, tx)
    p2, e2, o2, metrics = step(params, extra, opt_state, xs, ys, key)
    assert jnp.isfinite(metrics["loss"])

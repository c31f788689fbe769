"""Optimizer recipes, checkpoint round-trip, augmentation."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from bayestpu.core.config import BayesConfig
from bayestpu.data.augment import random_crop_flip
from bayestpu.nn.zoo import get_model
from bayestpu.train.checkpoint import (
    load_best,
    restore_checkpoint,
    save_best,
    save_checkpoint,
)
from bayestpu.train.loop import create_state, make_train_step
from bayestpu.train.optim import RECIPES, get_optimizer, get_recipe, get_schedule


def test_recipes_match_reference():
    r = RECIPES["resnet18"]
    # hyperparameters.py:203-220
    assert (r.optimizer, r.lr, r.momentum, r.weight_decay) == \
        ("sgd", 0.1, 0.9, 5e-4)
    assert r.milestones == (75, 130, 180)
    assert RECIPES["vgg19"].scheduler == "cosine"
    assert (r.batch_size, r.test_batch_size) == (128, 250)


def test_multistep_schedule_decays():
    r = get_recipe("resnet18")
    sched = get_schedule(r, steps_per_epoch=10)
    np.testing.assert_allclose(float(sched(0)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(sched(76 * 10)), 0.01, rtol=1e-5)
    np.testing.assert_allclose(float(sched(190 * 10)), 1e-4, rtol=1e-4)


def test_optimizer_trains(key):
    r = get_recipe("lenet")
    tx = get_optimizer(r, steps_per_epoch=1)
    model = get_model("lenet", bayes=BayesConfig(rate=0.25))
    x = jax.random.normal(key, (8, 28, 28, 1))
    y = jnp.arange(8) % 10
    state = create_state(model, tx, key, x)
    step = make_train_step(model, tx)
    losses = []
    for i in range(5):
        state.params, state.extra, state.opt_state, m = step(
            state.params, state.extra, state.opt_state, x, y,
            jax.random.fold_in(key, i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_checkpoint_roundtrip(tmp_path, key):
    model = get_model("lenet")
    tx = optax.sgd(0.1)
    x = jnp.zeros((4, 28, 28, 1))
    state = create_state(model, tx, key, x)
    state.step = 42
    path = save_checkpoint(str(tmp_path / "ckpt"), state, key)
    blank = create_state(model, tx, jax.random.key(7), x)
    restored, rkey = restore_checkpoint(path, blank, jax.random.key(7))
    assert restored.step == 42
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x1, x2 in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    np.testing.assert_array_equal(np.asarray(jax.random.key_data(rkey)),
                                  np.asarray(jax.random.key_data(key)))


def test_best_snapshot_roundtrip(tmp_path, key):
    model = get_model("lenet")
    x = jnp.zeros((2, 28, 28, 1))
    from bayestpu.core.rng import BAYES_RNG
    vs = model.init({"params": key, BAYES_RNG: key}, x)
    p = save_best(str(tmp_path / "best"), vs["params"])
    loaded = load_best(p, vs["params"])
    for a, b in zip(jax.tree_util.tree_leaves(vs["params"]),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_augment_shapes_and_flip(key):
    x = jax.random.uniform(key, (16, 32, 32, 3))
    out = random_crop_flip(key, x)
    assert out.shape == x.shape
    assert float(out.min()) >= 0.0
    # determinism
    out2 = random_crop_flip(key, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    # different key → different augment
    out3 = random_crop_flip(jax.random.key(9), x)
    assert not np.array_equal(np.asarray(out), np.asarray(out3))


def test_grad_accumulation_multisteps(key):
    """accum_steps>1 → optax.MultiSteps: params update only every k micro
    steps, and the accumulated update equals one big-batch step
    (train_base.py:28-34 semantics)."""
    r = get_recipe("lenet", accum_steps=2, grad_clip=0.0)
    tx = get_optimizer(r, steps_per_epoch=1)
    model = get_model("lenet", bayes=BayesConfig(rate=0.0))
    x = jax.random.normal(key, (8, 28, 28, 1))
    y = jnp.arange(8) % 10
    state = create_state(model, tx, key, x)
    step = make_train_step(model, tx)
    p0 = state.params
    # first micro-batch: gradients accumulate, params unchanged
    state.params, state.extra, state.opt_state, _ = step(
        state.params, state.extra, state.opt_state, x, y, key)
    leaves0 = jax.tree.leaves(p0)
    leaves1 = jax.tree.leaves(state.params)
    assert all(np.allclose(a, b) for a, b in zip(leaves0, leaves1))
    # second micro-batch: the update fires
    state.params, state.extra, state.opt_state, _ = step(
        state.params, state.extra, state.opt_state, x, y, key)
    leaves2 = jax.tree.leaves(state.params)
    assert any(not np.allclose(a, b) for a, b in zip(leaves0, leaves2))


def test_val_mode_losses(key):
    from bayestpu.train.loop import make_eval_step
    model = get_model("lenet_me", bayes=BayesConfig(rate=0.1))
    x = jax.random.normal(key, (8, 28, 28, 1))
    y = jnp.arange(8) % 10
    tx = optax.sgd(0.1)
    state = create_state(model, tx, key, x)
    m = make_eval_step(model)(state.params, state.extra, x, y, key)
    assert float(m["val_eed"]) > 0 and float(m["val_ce"]) > 0
    # CE of the final exit only is smaller than the summed multi-exit EED
    assert float(m["val_ce"]) < float(m["val_eed"])


def test_epoch_scan_matches_per_step(key):
    """One-dispatch epoch scan (make_train_epoch) must reproduce the
    per-step path bit-for-bit: same key folding, same update order."""
    import numpy as np
    from bayestpu.train.loop import TrainState, train_loop

    model = get_model("lenet", bayes=BayesConfig(rate=0.25))
    xs = np.random.default_rng(0).random((4, 16, 28, 28, 1)).astype("float32")
    ys = (np.arange(4 * 16) % 10).astype("int32").reshape(4, 16)

    def batches():
        return [(xs[i], ys[i]) for i in range(4)]

    results = []
    for scan in (True, False):
        tx = optax.sgd(0.05)
        state = create_state(model, tx, key, jnp.asarray(xs[0]))
        state = train_loop(model, state, tx, batches, key, num_epochs=2,
                           epoch_scan=scan, log_fn=lambda s: None)
        results.append(state.params)
    a, b = (jax.tree.leaves(r) for r in results)
    for la, lb in zip(a, b):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-6, atol=1e-6)


def test_checkpoint_resume_bit_identical(tmp_path, key):
    """Interrupt-and-resume equals an uninterrupted run exactly: the rolling
    checkpoint carries params + opt state + PRNG key + step, and per-step
    key folding is a pure function of step (SURVEY §5.3-5.4 upgrade)."""
    import numpy as np
    import optax

    from bayestpu.core.config import BayesConfig
    from bayestpu.nn.zoo import get_model
    from bayestpu.train.checkpoint import restore_checkpoint
    from bayestpu.train.loop import create_state, train_loop

    model = get_model("lenet", bayes=BayesConfig(rate=0.25))
    rng = np.random.default_rng(0)
    xs = rng.normal(size=(4, 8, 28, 28, 1)).astype(np.float32)
    ys = rng.integers(0, 10, size=(4, 8)).astype(np.int32)
    batches = lambda: [(xs[i], ys[i]) for i in range(4)]
    tx = optax.sgd(0.05)

    def fresh():
        return create_state(model, tx, key, jnp.asarray(xs[0]))

    # uninterrupted 4 epochs
    s_full = train_loop(model, fresh(), tx, batches, key, 4,
                        log_fn=lambda m: None)

    # 2 epochs + rolling checkpoint, then restore and run epochs 2..4
    ckpt = str(tmp_path / "roll")
    s_half = train_loop(model, fresh(), tx, batches, key, 2,
                        checkpoint_dir=ckpt, log_fn=lambda m: None)
    s_restored, rkey = restore_checkpoint(ckpt, fresh(), key)
    assert s_restored.step == s_half.step == 8
    s_resumed = train_loop(model, s_restored, tx, batches, rkey, 4,
                           start_epoch=2, log_fn=lambda m: None)

    flat_a = jax.tree.leaves(s_full.params)
    flat_b = jax.tree.leaves(s_resumed.params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert s_resumed.step == s_full.step


def test_plateau_lr_reduction(key):
    """ReduceLROnPlateau semantics (train_base.py:79-82): when val stops
    improving for plateau_patience epochs the effective LR shrinks by
    plateau_factor — verified by update magnitudes collapsing."""
    import numpy as np
    import optax

    from bayestpu.core.config import BayesConfig
    from bayestpu.nn.zoo import get_model
    from bayestpu.train.loop import create_state, train_loop

    model = get_model("lenet", bayes=BayesConfig(rate=0.0))
    rng = np.random.default_rng(1)
    xs = rng.normal(size=(2, 8, 28, 28, 1)).astype(np.float32)
    # labels chosen so val accuracy is stuck (random labels, tiny data)
    ys = rng.integers(0, 10, size=(2, 8)).astype(np.int32)
    batches = lambda: [(xs[i], ys[i]) for i in range(2)]
    val = lambda: [(xs[0], (ys[0] + 1) % 10)]   # never-improving val
    tx = optax.sgd(0.5)

    logs = []
    state = train_loop(model, create_state(model, tx, key, jnp.asarray(xs[0])),
                       tx, batches, key, 8, val_batches=val,
                       patience=100, plateau_factor=0.1, plateau_patience=2,
                       log_fn=logs.append)
    assert any("plateau" in m for m in logs), logs


def test_history_and_device_cache_reshuffle(key):
    """history collects per-epoch losses; reshuffle=True trains on a fresh
    device-side permutation per epoch and still learns."""
    import optax

    from bayestpu.core.config import BayesConfig
    from bayestpu.nn.zoo import get_model
    from bayestpu.train.loop import create_state, train_loop

    model = get_model("lenet", bayes=BayesConfig(rate=0.25))
    rng = np.random.default_rng(0)
    xs = rng.normal(size=(4, 8, 28, 28, 1)).astype(np.float32)
    ys = rng.integers(0, 10, size=(4, 8)).astype(np.int32)
    calls = {"n": 0}

    def batches():
        calls["n"] += 1
        return [(xs[i], ys[i]) for i in range(4)]

    tx = optax.sgd(0.05)
    state = create_state(model, tx, key, jnp.asarray(xs[0]))
    hist = {}
    train_loop(model, state, tx, batches, key, num_epochs=3,
               reshuffle=True, history=hist, log_fn=lambda m: None)
    assert calls["n"] == 1          # dataset uploaded once, reused
    assert len(hist["train_loss"]) == 3
    assert all(np.isfinite(v) for v in hist["train_loss"])


def test_loss_curve_figure(tmp_path):
    from bayestpu.cli.figures import loss_curve

    path = loss_curve([1.0, 0.5, 0.3], [0.2, 0.4, 0.5],
                      str(tmp_path / "figs" / "loss.png"))
    import os
    assert os.path.exists(path) and os.path.getsize(path) > 0

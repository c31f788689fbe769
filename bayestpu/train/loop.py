"""Training loop: jitted step + epoch driver with early stopping.

Re-designs ``Software_Artifact/software/train/train_base.py`` for JAX:
the inner step (forward, EED loss, backward, clip, update) is one jitted
function; gradient accumulation is ``optax.MultiSteps`` in the optimizer
chain (``bayestpu.train.optim.get_optimizer``) rather than the reference's
modulo-step optimizer gating (``train_base.py:28-34``); early stopping on a
validation metric with patience and best-snapshot keeping mirrors
``train_base.py:64-78``, with the reference's three validation modes
(accuracy / EED loss / CE loss, ``train_utils.py:40-65``).

Training runs with the Bayesian sites ACTIVE (dropout on / mask-bank batch
split), exactly as the reference trains its Bayes models (keras ``fit`` on
the wrapped model — ``MCDropout.call`` with ``training=True`` keeps dropout
on, ``Hardware_Artifact/converter/keras/MCDropout.py:57-60``).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any, Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from bayestpu.core.rng import BAYES_RNG
from bayestpu.nn.multiexit import ExitOutputs
from bayestpu.train.losses import EEDConfig, eed_loss, multi_exit_accuracy


@dataclasses.dataclass
class TrainState:
    """Minimal mutable training state (params + the non-trainable
    collections such as Masksembles banks and BN stats)."""

    params: Any
    extra: dict            # non-trainable collections ('masks', 'batch_stats')
    opt_state: Any
    step: int = 0

    def variables(self) -> dict:
        return {"params": self.params, **self.extra}


def create_state(model, tx: optax.GradientTransformation, key: jax.Array,
                 sample_input: jax.Array, train: bool = True) -> TrainState:
    # One jitted init instead of dozens of eager op dispatches — on a
    # remote/tunneled chip each eager op compile is a round trip.
    init_fn = jax.jit(lambda k, x: model.init(
        {"params": k, BAYES_RNG: k}, x, train=train))
    variables = dict(init_fn(key, sample_input))
    params = variables.pop("params")
    return TrainState(params=params, extra=variables,
                      opt_state=jax.jit(tx.init)(params))


def make_train_step(model, tx: optax.GradientTransformation,
                    eed_cfg: EEDConfig = EEDConfig(),
                    has_batch_stats: bool = False) -> Callable:
    """Build the jitted training step.

    Returns ``step(params, extra, opt_state, x, y, key, step_i=0)`` →
    ``(params, extra, opt_state, metrics)``; everything stays a pytree so
    the whole step jits and shards cleanly. ``key`` is the run key;
    ``step_i`` is folded in inside the jit.
    """

    def loss_fn(params, extra, x, y, key):
        variables = {"params": params, **extra}
        if has_batch_stats:
            out, updates = model.apply(
                variables, x, train=True, rngs={BAYES_RNG: key},
                mutable=["batch_stats"])
        else:
            out = model.apply(variables, x, train=True,
                              rngs={BAYES_RNG: key})
            updates = {}
        out: ExitOutputs
        feats = out.features if isinstance(out.features, jax.Array) else None
        loss = eed_loss(out.logits, y, feats, eed_cfg)
        return loss, (out.logits, updates)

    @jax.jit
    def train_step(params, extra, opt_state, x, y, key, step_i=0,
                   lr_scale=1.0):
        # step folding happens IN-jit: an eager fold_in per step would cost
        # one dispatch round-trip each on a remote chip
        key = jax.random.fold_in(key, step_i)
        (loss, (logits, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, extra, x, y, key)
        upd, opt_state = tx.update(grads, opt_state, params)
        # runtime LR multiplier (ReduceLROnPlateau support — the update is
        # linear in lr for SGD/momentum and adam alike)
        upd = jax.tree.map(lambda u: u * lr_scale, upd)
        params = optax.apply_updates(params, upd)
        if updates:
            extra = {**extra, **updates}
        metrics = {"loss": loss,
                   "grad_norm": optax.global_norm(grads),
                   **multi_exit_accuracy(logits, y)}
        return params, extra, opt_state, metrics

    return train_step


def make_train_epoch(model, tx: optax.GradientTransformation,
                     eed_cfg: EEDConfig = EEDConfig(),
                     has_batch_stats: bool = False,
                     augment_fn: Callable | None = None) -> Callable:
    """Whole-epoch training as ONE jitted call: ``lax.scan`` over stacked
    batches.

    ``epoch(params, extra, opt_state, xs, ys, key, step0)`` with
    ``xs: (n_batches, B, ...)``, ``ys: (n_batches, B)`` → ``(params, extra,
    opt_state, metrics)`` where metrics are scan-stacked then averaged on
    device. One dispatch per epoch instead of one per step — on a
    remote/tunneled chip per-call overhead scales with the number of buffer
    arguments (params+opt state ≈ 100 handles), so per-step dispatch
    dominates wall clock for small models; the scan removes it entirely.
    This is also the shape the reference's FPGA pipeline has: weights stay
    resident, only activations stream.
    """

    def loss_fn(params, extra, x, y, key):
        variables = {"params": params, **extra}
        if has_batch_stats:
            out, updates = model.apply(
                variables, x, train=True, rngs={BAYES_RNG: key},
                mutable=["batch_stats"])
        else:
            out = model.apply(variables, x, train=True,
                              rngs={BAYES_RNG: key})
            updates = {}
        feats = out.features if isinstance(out.features, jax.Array) else None
        loss = eed_loss(out.logits, y, feats, eed_cfg)
        return loss, (out.logits, updates)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_epoch(params, extra, opt_state, xs, ys, key, step0=0,
                    lr_scale=1.0):
        n = xs.shape[0]

        def body(carry, batch):
            params, extra, opt_state = carry
            x, y, i = batch
            k = jax.random.fold_in(key, step0 + i)
            if augment_fn is not None:
                x = augment_fn(k, x, i)
            (loss, (logits, updates)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, extra, x, y, k)
            upd, opt_state = tx.update(grads, opt_state, params)
            upd = jax.tree.map(lambda u: u * lr_scale, upd)
            params = optax.apply_updates(params, upd)
            if updates:
                extra = {**extra, **updates}
            metrics = {"loss": loss,
                       "grad_norm": optax.global_norm(grads),
                       **multi_exit_accuracy(logits, y)}
            return (params, extra, opt_state), metrics

        (params, extra, opt_state), ms = jax.lax.scan(
            body, (params, extra, opt_state),
            (xs, ys, jnp.arange(n, dtype=jnp.int32)))
        mean_ms = jax.tree.map(lambda a: jnp.mean(a, axis=0), ms)
        return params, extra, opt_state, mean_ms

    return train_epoch


def make_eval_step(model, eed_cfg: EEDConfig = EEDConfig()) -> Callable:
    """Deterministic-free eval: single stochastic pass per batch (the
    reference's validation also keeps dropout active through the wrapped
    model; MC-averaged eval lives in ``bayestpu.engine``). Besides the
    accuracy dict it emits the EED and plain-CE validation losses so the
    loop can select on any of the reference's three modes
    (``validate_model``/``validate_model_loss``, ``train_utils.py:40-65``)."""

    def _ce(logits, labels):
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))

    @jax.jit
    def eval_step(params, extra, x, y, key, step_i=0):
        key = jax.random.fold_in(key, step_i)
        out: ExitOutputs = model.apply(
            {"params": params, **extra}, x, train=False,
            rngs={BAYES_RNG: key})
        m = multi_exit_accuracy(out.logits, y)
        m["val_eed"] = eed_loss(out.logits, y, None, eed_cfg)
        m["val_ce"] = _ce(out.logits[-1], y)
        return m

    return eval_step


def make_eval_epoch(model, eed_cfg: EEDConfig = EEDConfig()) -> Callable:
    """All validation batches in ONE jitted scan (see ``make_train_epoch``
    for why); returns batch-averaged metrics on device."""

    def _ce(logits, labels):
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))

    @jax.jit
    def eval_epoch(params, extra, xs, ys, key):
        variables = {"params": params, **extra}

        def body(_, batch):
            x, y, i = batch
            k = jax.random.fold_in(key, 10_000_000 + i)
            out: ExitOutputs = model.apply(variables, x, train=False,
                                           rngs={BAYES_RNG: k})
            m = multi_exit_accuracy(out.logits, y)
            m["val_eed"] = eed_loss(out.logits, y, None, eed_cfg)
            m["val_ce"] = _ce(out.logits[-1], y)
            return None, m

        n = xs.shape[0]
        _, ms = jax.lax.scan(body, None,
                             (xs, ys, jnp.arange(n, dtype=jnp.int32)))
        return jax.tree.map(lambda a: jnp.mean(a, axis=0), ms)

    return eval_epoch


def _stackable(batches: list) -> bool:
    """Scan path wants host numpy batches of one uniform shape."""
    if not batches:
        return False
    if not all(isinstance(b[0], np.ndarray) and isinstance(b[1], np.ndarray)
               for b in batches):
        return False
    return (len({b[0].shape for b in batches}) == 1
            and len({b[1].shape for b in batches}) == 1)


def train_loop(model, state: TrainState, tx: optax.GradientTransformation,
               train_batches: Callable[[], Iterable], key: jax.Array,
               num_epochs: int,
               val_batches: Callable[[], Iterable] | None = None,
               eed_cfg: EEDConfig = EEDConfig(),
               patience: int = 10,
               has_batch_stats: bool = False,
               val_mode: str = "acc",
               epoch_scan: bool = True,
               augment_fn: Callable | None = None,
               mesh=None,
               checkpoint_dir: str | None = None,
               checkpoint_every: int = 1,
               start_epoch: int = 0,
               best0: tuple[float, Any, int] | None = None,
               plateau_factor: float | None = None,
               plateau_patience: int = 10,
               cache_data: bool = True,
               reshuffle: bool = False,
               history: dict | None = None,
               log_fn: Callable[[str], None] = print) -> TrainState:
    """Epoch driver with early stopping + best-snapshot keeping
    (``train_base.py:48-84``). ``train_batches``/``val_batches`` are
    callables returning fresh iterators of (x, y) batches.
    ``val_mode`` selects the early-stop metric: ``acc`` (final-exit top-1,
    higher-better), ``eed`` or ``ce`` (losses, lower-better) — the three
    modes of ``train_utils.py:40-65``.

    When the batches are uniform host arrays (the default pipelines) and
    ``epoch_scan`` is on, each epoch runs as ONE jitted ``lax.scan``
    (`make_train_epoch`) — one device dispatch per epoch. ``augment_fn``
    (key, x, i) → x runs inside the scan (e.g. ``random_crop_flip``).
    Otherwise falls back to the per-step path with on-device metric
    accumulation (never a per-step ``float(...)`` sync — ruinous on a
    remote chip).

    ``mesh``: a ``jax.sharding.Mesh`` with a ``data`` axis → data-parallel
    training (P8): params/opt state replicated, each batch sharded over
    ``data``; XLA's SPMD partitioner inserts the gradient all-reduce. The
    reference's only "multi-GPU" is ``CUDA_VISIBLE_DEVICES`` passthrough
    (``train_qkeras*.py:227-228``) — this is the real thing.

    ``checkpoint_dir``: write a rolling full checkpoint (params + opt state
    + PRNG key + step) to that path every ``checkpoint_every`` epochs —
    the mid-run failure-recovery the reference lacks (SURVEY §5.3-5.4).
    ``plateau_factor``: ReduceLROnPlateau semantics (``train_base.py:79-82``
    steps torch's scheduler with the val metric) — when the val metric has
    not improved for ``plateau_patience`` epochs, multiply the effective LR
    by ``plateau_factor``. Implemented as a traced update-scale so no
    recompile happens when it kicks in.

    ``start_epoch`` resumes the epoch count after a restore and ``best0 =
    (best_metric, best_params, since_best)`` restores the early-stopping
    history (both live in the rolling checkpoint's ``aux``); the per-step
    key folding is a pure function of ``state.step``, so a restored run
    continues bit-identically to an uninterrupted one.

    ``cache_data``: with the epoch scan active, stack + upload the dataset
    to the device ONCE and reuse it every epoch (``train_batches`` is then
    consumed exactly once). Every dataset in this zoo is
    device-resident-sized; re-uploading it per epoch costs more host↔device
    traffic than the training itself. Set False to draw fresh host batches
    each epoch (streaming pipelines / datasets larger than HBM).
    ``reshuffle``: with ``cache_data``, permute the flattened example axis
    on device each epoch with a (key, epoch)-derived fold — the shuffle the
    per-epoch host iterator used to provide; pure function of (key, epoch),
    so resume stays bit-identical.

    ``history``: optional dict; filled in place with per-epoch
    ``train_loss`` and ``val_metric`` lists — the raw material for the
    reference's loss-curve figure (``train_utils.py:87-92``).
    """
    if val_mode not in ("acc", "eed", "ce"):
        raise ValueError(f"unknown val_mode {val_mode!r}")
    if mesh is not None:
        from bayestpu.engine import sharding as _sh
        state.params = _sh.replicate(state.params, mesh)
        state.extra = _sh.replicate(state.extra, mesh)
        state.opt_state = _sh.replicate(state.opt_state, mesh)

    def _shard(xs, ys, stacked: bool):
        if mesh is None:
            return xs, ys
        from jax.sharding import NamedSharding, PartitionSpec as P
        from bayestpu.engine.sharding import DATA_AXIS
        spec = P(None, DATA_AXIS) if stacked else P(DATA_AXIS)
        return (jax.device_put(xs, NamedSharding(mesh, spec)),
                jax.device_put(ys, NamedSharding(mesh, spec)))
    train_step = make_train_step(model, tx, eed_cfg, has_batch_stats)
    eval_step = make_eval_step(model, eed_cfg)
    train_epoch = make_train_epoch(model, tx, eed_cfg, has_batch_stats,
                                   augment_fn) if epoch_scan else None
    eval_epoch = make_eval_epoch(model, eed_cfg) if epoch_scan else None

    def _last_exit(m: dict) -> str:
        e = max(int(k[4]) for k in m
                if k.startswith("exit") and k.endswith("_top1"))
        return f"exit{e}_top1"

    def _maybe_checkpoint(epoch: int) -> None:
        if checkpoint_dir is None or checkpoint_every <= 0:
            return
        if (epoch + 1) % checkpoint_every == 0:
            from bayestpu.train.checkpoint import save_checkpoint
            # without validation best_params is never updated and its
            # initial buffers get donated away by the epoch scan — the live
            # params are the correct (and alive) thing to store
            bp = best_params if val_batches is not None else state.params
            save_checkpoint(checkpoint_dir, state, key,
                            aux={"epoch": np.asarray(epoch),
                                 "best_metric": np.asarray(best_metric),
                                 "since_best": np.asarray(since_best),
                                 "best_params": bp})

    if best0 is not None:
        best_metric, best_params, since_best = best0
    else:
        best_metric, best_params, since_best = -float("inf"), state.params, 0
    lr_scale, since_plateau = jnp.float32(1.0), 0

    # device-resident dataset cache for the scan path (uploaded once,
    # reshuffled on device each epoch)
    cached: tuple[jax.Array, jax.Array] | None = None
    shuffle_fn = None
    if history is not None:
        history.setdefault("train_loss", [])
        history.setdefault("val_metric", [])

    def _epoch_arrays(epoch: int):
        """(xs, ys, n_batches) for the scan path, or the raw batch list for
        the per-step path.

        The cached path re-derives epoch e's order purely from (key, e) —
        a run resumed at epoch e sees the SAME permutation of the SAME
        stacked arrays an uninterrupted run would (bit-identical resume),
        provided ``train_batches`` itself is epoch-independent (the CLI's
        device pipeline is)."""
        nonlocal cached, shuffle_fn
        if cached is None:
            batches = list(train_batches())
            if train_epoch is None or not _stackable(batches):
                return batches
            xs = jnp.asarray(np.stack([b[0] for b in batches]))
            ys = jnp.asarray(np.stack([b[1] for b in batches]))
            if not cache_data:
                return (*_shard(xs, ys, stacked=True), len(batches))
            cached = (xs, ys)
        xs, ys = cached
        if reshuffle:
            if shuffle_fn is None:
                @jax.jit
                def shuffle_fn(xs, ys, k):
                    nb, bsz = xs.shape[0], xs.shape[1]
                    perm = jax.random.permutation(k, nb * bsz)
                    xf = xs.reshape((nb * bsz,) + xs.shape[2:])[perm]
                    yf = ys.reshape((nb * bsz,) + ys.shape[2:])[perm]
                    return xf.reshape(xs.shape), yf.reshape(ys.shape)
            xs, ys = shuffle_fn(xs, ys, jax.random.fold_in(
                jax.random.fold_in(key, 0x51), epoch))
        xs, ys = _shard(xs, ys, stacked=True)
        return xs, ys, xs.shape[0]

    for epoch in range(start_epoch, num_epochs):
        t0 = time.perf_counter()
        got = _epoch_arrays(epoch)
        if isinstance(got, tuple):
            xs, ys, n_batches = got
            state.params, state.extra, state.opt_state, ms = train_epoch(
                state.params, state.extra, state.opt_state, xs, ys, key,
                state.step, lr_scale)
            state.step += n_batches
            ep_loss = float(ms["loss"])
        else:
            n, loss_sum = 0, None
            for x, y in got:
                xd, yd = _shard(jnp.asarray(x), jnp.asarray(y),
                                stacked=False)
                if augment_fn is not None:
                    xd = augment_fn(jax.random.fold_in(key, state.step), xd,
                                    state.step)
                state.params, state.extra, state.opt_state, m = train_step(
                    state.params, state.extra, state.opt_state,
                    xd, yd, key, state.step, lr_scale)
                state.step += 1
                loss_sum = (m["loss"] if loss_sum is None
                            else loss_sum + m["loss"])
                n += 1
            ep_loss = float(loss_sum) / max(n, 1) if n else 0.0
        msg = f"epoch {epoch}: loss {ep_loss:.4f}"
        if history is not None:
            history["train_loss"].append(ep_loss)

        if val_batches is not None:
            vbatches = list(val_batches())
            if eval_epoch is not None and _stackable(vbatches):
                m = eval_epoch(state.params, state.extra,
                               jnp.asarray(np.stack([b[0] for b in vbatches])),
                               jnp.asarray(np.stack([b[1] for b in vbatches])),
                               key)
                val_acc = (float(m[_last_exit(m)]) if val_mode == "acc"
                           else -float(m[f"val_{val_mode}"]))
            else:
                vsum, cnt = None, 0
                for x, y in vbatches:
                    m = eval_step(state.params, state.extra,
                                  jnp.asarray(x), jnp.asarray(y),
                                  key, 10_000_000 + cnt)
                    if val_mode == "acc":
                        # final-exit top-1 is the selection metric
                        # (train_base.py:64)
                        v = m[_last_exit(m)]
                    else:  # lower-is-better losses → negate for max compare
                        v = -m[f"val_{val_mode}"]
                    vsum = v if vsum is None else vsum + v
                    cnt += 1
                val_acc = float(vsum) / max(cnt, 1) if cnt else 0.0
            msg += f" val_{val_mode} {abs(val_acc):.4f}"
            if history is not None:
                history["val_metric"].append(abs(val_acc))
            if val_acc > best_metric:
                # device-side copy: the scan path donates params each epoch,
                # which would invalidate a bare reference kept across epochs
                best_params = jax.tree.map(jnp.copy, state.params)
                best_metric, since_best = val_acc, 0
                since_plateau = 0
            else:
                since_best += 1
                since_plateau += 1
                if (plateau_factor is not None
                        and since_plateau >= plateau_patience):
                    lr_scale = lr_scale * jnp.float32(plateau_factor)
                    since_plateau = 0
                    log_fn(f"  plateau: lr scale → {float(lr_scale):.2e}")
                if since_best >= patience:
                    log_fn(msg + "  (early stop)")
                    # checkpoint BEFORE swapping in best params so the
                    # rolling state stays internally consistent (params ↔
                    # opt_state ↔ step all from the stop epoch)
                    _maybe_checkpoint(epoch)
                    state.params = best_params
                    return state
        log_fn(msg + f"  ({time.perf_counter() - t0:.1f}s)")
        _maybe_checkpoint(epoch)

    if val_batches is not None:
        state.params = best_params
    return state


def bn_reestimate(model, params, batch_stats, xs, key, passes: int = 3):
    """Re-estimate BatchNorm running statistics with FROZEN params.

    Returns an updated ``batch_stats`` collection after ``passes``
    momentum-averaged sweeps over the stacked batches ``xs``
    ``(n_batches, B, ...)``, each sweep one ``lax.scan`` dispatch.

    Why this exists: quantization-aware training moves weights in discrete
    grid jumps, so late-training batch statistics shift abruptly and the
    momentum-lagged running averages trail them — measured on the QAT
    vgg11_me flagship, eval-mode deep exits sat at 0.58–0.64 accuracy while
    train-mode (batch stats) was at 1.0; after this re-estimation every
    exit matches train-mode exactly. Float models don't need it (their
    running stats converge), but it is harmless there. The reference's
    QKeras flow sidesteps the issue by folding BN into the quantized kernel
    during training (``QConv2DBatchnorm``, ``qmodels.py:163``) — bayestpu
    keeps BN f32 at train AND eval (see ``nn/fused.py``) and squares the
    stats instead.
    """
    from bayestpu.core.rng import BAYES_RNG

    @jax.jit
    def sweep(params, bstats, xs, key):
        def body(bs_c, xb):
            _, upd = model.apply(
                {"params": params, "batch_stats": bs_c}, xb, train=True,
                rngs={BAYES_RNG: key}, mutable=["batch_stats"])
            return upd["batch_stats"], 0
        bs_c, _ = jax.lax.scan(body, bstats, xs)
        return bs_c

    for _ in range(max(passes, 1)):
        batch_stats = sweep(params, batch_stats, xs, key)
    return batch_stats

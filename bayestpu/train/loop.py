"""Training loop: jitted step + epoch driver with early stopping.

Re-designs ``Software_Artifact/software/train/train_base.py`` for JAX:
the inner step (forward, EED loss, backward, clip, update) is one jitted
function; gradient accumulation is a ``lax.scan`` over micro-batches rather
than the reference's modulo-step optimizer gating (``train_base.py:28-34``);
early stopping on validation metric with patience and best-snapshot keeping
mirrors ``train_base.py:64-78``.

Training runs with the Bayesian sites ACTIVE (dropout on / mask-bank batch
split), exactly as the reference trains its Bayes models (keras ``fit`` on
the wrapped model — ``MCDropout.call`` with ``training=True`` keeps dropout
on, ``Hardware_Artifact/converter/keras/MCDropout.py:57-60``).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Iterable

import jax
import jax.numpy as jnp
import optax

from bayestpu.core.rng import BAYES_RNG, step_key
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
    variables = model.init({"params": key, BAYES_RNG: key}, sample_input,
                           train=train)
    params = variables.pop("params")
    return TrainState(params=params, extra=dict(variables),
                      opt_state=tx.init(params))


def make_train_step(model, tx: optax.GradientTransformation,
                    eed_cfg: EEDConfig = EEDConfig(),
                    has_batch_stats: bool = False) -> Callable:
    """Build the jitted training step.

    Returns ``step(state_tuple, x, y, key) -> (state_tuple, metrics)`` where
    ``state_tuple = (params, extra, opt_state)`` stays a pytree so the whole
    step jits and shards cleanly.
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
    def train_step(params, extra, opt_state, x, y, key):
        (loss, (logits, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, extra, x, y, key)
        upd, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, upd)
        if updates:
            extra = {**extra, **updates}
        metrics = {"loss": loss,
                   "grad_norm": optax.global_norm(grads),
                   **multi_exit_accuracy(logits, y)}
        return params, extra, opt_state, metrics

    return train_step


def make_eval_step(model) -> Callable:
    """Deterministic-free eval: single stochastic pass per batch (the
    reference's validation also keeps dropout active through the wrapped
    model; MC-averaged eval lives in ``bayestpu.engine``)."""

    @jax.jit
    def eval_step(params, extra, x, y, key):
        out: ExitOutputs = model.apply(
            {"params": params, **extra}, x, train=False,
            rngs={BAYES_RNG: key})
        return multi_exit_accuracy(out.logits, y)

    return eval_step


def train_loop(model, state: TrainState, tx: optax.GradientTransformation,
               train_batches: Callable[[], Iterable], key: jax.Array,
               num_epochs: int,
               val_batches: Callable[[], Iterable] | None = None,
               eed_cfg: EEDConfig = EEDConfig(),
               patience: int = 10,
               has_batch_stats: bool = False,
               log_fn: Callable[[str], None] = print) -> TrainState:
    """Epoch driver with early stopping + best-snapshot keeping
    (``train_base.py:48-84``). ``train_batches``/``val_batches`` are
    callables returning fresh iterators of (x, y) device-puttable batches.
    """
    train_step = make_train_step(model, tx, eed_cfg, has_batch_stats)
    eval_step = make_eval_step(model)

    best_metric, best_params, since_best = -float("inf"), state.params, 0
    for epoch in range(num_epochs):
        t0 = time.perf_counter()
        n, loss_sum = 0, 0.0
        for x, y in train_batches():
            k = step_key(key, state.step)
            state.params, state.extra, state.opt_state, m = train_step(
                state.params, state.extra, state.opt_state,
                jnp.asarray(x), jnp.asarray(y), k)
            state.step += 1
            loss_sum += float(m["loss"])
            n += 1
        msg = f"epoch {epoch}: loss {loss_sum / max(n, 1):.4f}"

        if val_batches is not None:
            accs, cnt = 0.0, 0
            for x, y in val_batches():
                m = eval_step(state.params, state.extra,
                              jnp.asarray(x), jnp.asarray(y),
                              step_key(key, 10_000_000 + cnt))
                # final-exit top-1 is the selection metric (train_base.py:64)
                last_exit = max(int(k[4]) for k in m if k.startswith("exit")
                                and k.endswith("_top1"))
                accs += float(m[f"exit{last_exit}_top1"])
                cnt += 1
            val_acc = accs / max(cnt, 1)
            msg += f" val_acc {val_acc:.4f}"
            if val_acc > best_metric:
                best_metric, best_params, since_best = val_acc, state.params, 0
            else:
                since_best += 1
                if since_best >= patience:
                    log_fn(msg + "  (early stop)")
                    state.params = best_params
                    return state
        log_fn(msg + f"  ({time.perf_counter() - t0:.1f}s)")

    if val_batches is not None:
        state.params = best_params
    return state

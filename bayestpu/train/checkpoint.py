"""Checkpoint/resume with orbax: params + opt state + PRNG key + step.

The reference only snapshots best-val weights (``torch.save`` in
``train_base.py:71-78``) and final ``.h5`` (``train_qkeras_mcme.py:263``) —
no optimizer state, no RNG, no mid-run resume (SURVEY §5.4: "No
mid-epoch/optimizer-state resume anywhere. TPU build: orbax-style checkpoint
of params + PRNG key + step"). This module is that upgrade: a full
``TrainState`` round-trips, so long runs restart exactly (the failure-
recovery story the FPGA flow lacked for its multi-day builds,
``Hardware_Artifact/README.md:71``).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from bayestpu.train.loop import TrainState


def _default_aux(params: Any) -> dict:
    """Loop-state aux carried by every checkpoint (uniform schema — orbax
    restores by structure match): last completed epoch + early-stopping
    history, so a resumed run continues the patience/best tracking instead
    of restarting it."""
    return {"epoch": np.asarray(-1),
            "best_metric": np.asarray(-np.inf),
            "since_best": np.asarray(0),
            "best_params": params}


def save_checkpoint(path: str, state: TrainState, key: jax.Array,
                    aux: dict | None = None) -> str:
    """Write a full training checkpoint; returns the directory written."""
    path = os.path.abspath(path)
    payload = {
        "params": state.params,
        "extra": state.extra,
        "opt_state": state.opt_state,
        "step": np.asarray(state.step),
        "key_data": np.asarray(jax.random.key_data(key)),
        "aux": aux if aux is not None else _default_aux(state.params),
    }
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(path: str, template: TrainState, key: jax.Array,
                       with_aux: bool = False):
    """Restore ``(state, key)`` — or ``(state, key, aux)`` when
    ``with_aux``. ``template``/``key`` provide the pytree structure (orbax
    restores by structure match)."""
    payload = {
        "params": template.params,
        "extra": template.extra,
        "opt_state": template.opt_state,
        "step": np.asarray(template.step),
        "key_data": np.asarray(jax.random.key_data(key)),
        "aux": _default_aux(template.params),
    }
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), payload)
    state = TrainState(params=restored["params"], extra=restored["extra"],
                       opt_state=restored["opt_state"],
                       step=int(restored["step"]))
    rkey = jax.random.wrap_key_data(restored["key_data"])
    if with_aux:
        return state, rkey, restored["aux"]
    return state, rkey


def restore_variables(path: str, variables_template: dict) -> dict:
    """Restore only the model variables (params + non-trainable
    collections) from a full checkpoint — for inference CLIs that don't
    know (or care about) the optimizer used in training."""
    del variables_template  # structure is inferred from the checkpoint
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path))
    return {"params": restored["params"], **restored["extra"]}


def save_best(path: str, params: Any) -> str:
    """Best-val weights-only snapshot (≙ ``torch.save`` best model,
    ``train_base.py:71-74``)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), {"params": params}, force=True)
    ckptr.wait_until_finished()
    return path


def load_best(path: str, params_template: Any) -> Any:
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path),
                         {"params": params_template})["params"]

"""Optimizer / LR-schedule factory + the reference training recipes.

Collapses the reference's optimizer plumbing —
``get_optimizer``/``get_scheduler`` reflection over ``torch.optim``
(``Software_Artifact/software/train/train_utils.py:22-30``) and the
per-backbone hyperparameter dicts
(``software/train/hyperparameters.py:3-286``) — into optax factories plus
typed recipes:

- resnet18: SGD lr .1, momentum .9, wd 5e-4, MultiStep ×0.1 @ [75,130,180]
  (``hyperparameters.py:203-220``);
- vgg19: SGD lr .1, wd 5e-4, cosine T_max 200 (``:221-237,265-266``);
- HW-side QKeras recipes: Adam(lr, decay 1e-4) for LeNet/VGG11, SGD for
  others, CosineAnnealing for SVHN (``Hardware_Artifact/bayes_hw/
  train_qkeras.py:131-184``, ``svhn/utils.py:6-28``);
- batch sizes train/val/test = 128/250/250 (``hyperparameters.py:265-266``).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import optax


@dataclasses.dataclass(frozen=True)
class TrainRecipe:
    optimizer: str = "sgd"
    lr: float = 0.1
    momentum: float = 0.9
    weight_decay: float = 5e-4
    scheduler: str = "multistep"     # multistep | cosine | constant | plateau
    milestones: tuple[int, ...] = (75, 130, 180)
    gamma: float = 0.1
    t_max: int = 200                 # cosine period (epochs)
    plateau_factor: float = 0.1      # plateau: LR × factor after
    plateau_patience: int = 10       # ... this many non-improving epochs
    epochs: int = 200
    batch_size: int = 128
    test_batch_size: int = 250
    grad_clip: float = 10.0
    patience: int = 25
    accum_steps: int = 1             # grad accumulation (train_base.py:28-34)


RECIPES: dict[str, TrainRecipe] = {
    # hyperparameters.py:203-237 (SW artifact)
    "resnet18": TrainRecipe(),
    "resnet20": TrainRecipe(),
    "vgg19": TrainRecipe(momentum=0.9, scheduler="cosine", t_max=200),
    # HW artifact QKeras recipes (train_qkeras.py:131-184)
    "lenet": TrainRecipe(optimizer="adam", lr=1e-3, weight_decay=0.0,
                         scheduler="constant", epochs=30, batch_size=128),
    "vgg11": TrainRecipe(optimizer="adam", lr=1e-3, weight_decay=0.0,
                         scheduler="cosine", t_max=100, epochs=100),
}


def get_schedule(recipe: TrainRecipe, steps_per_epoch: int
                 ) -> optax.Schedule:
    if recipe.scheduler == "multistep":
        boundaries = {m * steps_per_epoch: recipe.gamma
                      for m in recipe.milestones}
        return optax.piecewise_constant_schedule(recipe.lr, boundaries)
    if recipe.scheduler == "cosine":
        return optax.cosine_decay_schedule(
            recipe.lr, recipe.t_max * steps_per_epoch)
    if recipe.scheduler == "constant":
        return optax.constant_schedule(recipe.lr)
    if recipe.scheduler == "plateau":
        # base schedule is constant; the val-driven LR reduction lives in
        # ``train_loop(plateau_factor=..)`` (≙ ReduceLROnPlateau stepping,
        # train_base.py:79-82)
        return optax.constant_schedule(recipe.lr)
    raise ValueError(f"unknown scheduler {recipe.scheduler!r}")


def get_optimizer(recipe: TrainRecipe, steps_per_epoch: int = 1
                  ) -> optax.GradientTransformation:
    """Build the optax chain: clip → (wd) → optimizer(schedule).

    ``recipe.accum_steps > 1`` wraps the chain in ``optax.MultiSteps`` —
    gradients average over that many consecutive micro-batches before one
    optimizer update, matching the reference's modulo-step accumulation
    (``Software_Artifact/software/train/train_base.py:28-34``).
    """
    sched = get_schedule(recipe, steps_per_epoch)
    if recipe.optimizer == "sgd":
        opt = optax.sgd(sched, momentum=recipe.momentum or None)
    elif recipe.optimizer == "adam":
        opt = optax.adam(sched)
    elif recipe.optimizer == "adamw":
        opt = optax.adamw(sched, weight_decay=recipe.weight_decay)
    else:
        raise ValueError(f"unknown optimizer {recipe.optimizer!r}")
    parts = []
    if recipe.grad_clip:
        parts.append(optax.clip_by_global_norm(recipe.grad_clip))
    if recipe.weight_decay and recipe.optimizer == "sgd":
        # torch SGD couples wd into the gradient (hyperparameters recipes)
        parts.append(optax.add_decayed_weights(recipe.weight_decay))
    parts.append(opt)
    tx = optax.chain(*parts)
    if recipe.accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=recipe.accum_steps)
    return tx


def get_recipe(backbone: str, **overrides) -> TrainRecipe:
    base = RECIPES.get(backbone.lower(), TrainRecipe())
    return dataclasses.replace(base, **overrides) if overrides else base

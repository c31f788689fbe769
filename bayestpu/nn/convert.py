"""NN→BNN conversion: insertion strategies and Bayesian wrapper models.

The reference's converter (``Hardware_Artifact/converter/keras/nn2bnn.py``)
rewrites a built Keras graph, inserting Bayesian layers at positions chosen
by a strategy, then wraps the result in an ``MCDropout``/``MasksemblesModel``
that averages MC samples at inference. Here the same capability is built on
a declarative layer-spec sequence (graph rewriting on traced JAX functions
would fight the functional model; a spec list is the honest equivalent of
Keras's layer list and converts losslessly to a flax module):

- ``strategy_default`` — insert before the last ``num`` Dense/Conv layers
  (``nn2bnn.py:9-28``).
- ``strategy_last`` — insert before the first Dense after the last Conv
  (``nn2bnn.py:30-58``).
- ``strategy_full`` — insert after every Dense/Conv (``nn2bnn.py:60-72``).
- ``convert_to_bayesian`` ≙ ``_convert_model`` (``nn2bnn.py:74-146``).
- ``MCDropoutModel`` ≙ ``MCDropout`` wrapper: training → plain stochastic
  forward; inference → mean over ``num_samples`` MC passes
  (``converter/keras/MCDropout.py:40-76``).
- ``MasksemblesModel`` ≙ inference averages over all mask indices
  (``converter/keras/Masksembles.py:216-239`` tiles the batch ×num_masks
  and reduce-means; the engine enumerates mask indices instead — same
  result without the ×num_masks memory).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from bayestpu.core.config import BayesConfig, DropoutKind, InsertStrategy, QuantConfig
from bayestpu.engine import sampler
from bayestpu.nn.bayes import BayesSite
from bayestpu.nn.fused import BayesConv, BayesDense
from bayestpu.nn.layers import Conv, Dense, QuantAct, avg_pool, max_pool
from bayestpu.nn.multiexit import ExitOutputs, stack_exits

# ----------------------------------------------------------- layer specs


@dataclasses.dataclass(frozen=True)
class D:
    """Dense layer spec."""
    features: int


@dataclasses.dataclass(frozen=True)
class C:
    """Conv layer spec."""
    features: int
    kernel: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    padding: str = "SAME"


@dataclasses.dataclass(frozen=True)
class Act:
    fn: str = "relu"


@dataclasses.dataclass(frozen=True)
class Pool:
    kind: str = "max"          # "max" | "avg"
    window: int = 2
    strides: int | None = None


@dataclasses.dataclass(frozen=True)
class Flatten:
    pass


@dataclasses.dataclass(frozen=True)
class Bayes:
    """An inserted Bayesian site (carries its own config)."""
    cfg: BayesConfig


Spec = object
_COMPUTE = (D, C)


def _is_compute(s: Spec) -> bool:
    return isinstance(s, _COMPUTE)


# ------------------------------------------------------ insertion strategies


def strategy_default(specs: Sequence[Spec], num: int) -> list[int]:
    """Indices BEFORE which to insert: the last ``num`` Dense/Conv layers
    (``nn2bnn.py:9-28``)."""
    idx = [i for i, s in enumerate(specs) if _is_compute(s)]
    return idx[-num:] if num > 0 else []


def strategy_last(specs: Sequence[Spec], num: int = 1) -> list[int]:
    """Index of the first Dense after the last Conv (``nn2bnn.py:30-58``)."""
    del num
    last_conv = max((i for i, s in enumerate(specs) if isinstance(s, C)),
                    default=-1)
    for i in range(last_conv + 1, len(specs)):
        if isinstance(specs[i], D):
            return [i]
    return []


def strategy_full(specs: Sequence[Spec], num: int = 0) -> list[int]:
    """AFTER every Dense/Conv → i.e. before-index is compute index + 1
    (``nn2bnn.py:60-72``); returned as before-indices."""
    del num
    return [i + 1 for i, s in enumerate(specs) if _is_compute(s)]


STRATEGIES: dict[InsertStrategy, Callable] = {
    InsertStrategy.DEFAULT: strategy_default,
    InsertStrategy.LAST: strategy_last,
    InsertStrategy.FULL: strategy_full,
}


def convert_to_bayesian(specs: Sequence[Spec], bayes: BayesConfig
                        ) -> list[Spec]:
    """Insert ``Bayes`` sites per ``bayes.strategy``/``num_bayes_layers``
    (≙ ``_convert_model``, ``nn2bnn.py:74-146``)."""
    positions = STRATEGIES[bayes.strategy](list(specs),
                                           bayes.num_bayes_layers)
    out: list[Spec] = []
    pos = set(positions)
    for i, s in enumerate(list(specs) + [None]):
        if i in pos:
            out.append(Bayes(bayes))
        if s is not None:
            out.append(s)
    return out


# --------------------------------------------------------------- Sequential


class Sequential(nn.Module):
    """Flax module built from a layer-spec list (the Keras-Sequential
    analogue the converter operates on).

    With ``fused=True``, a ``Bayes`` spec immediately followed by a Conv or
    Dense spec lowers to the fused Pallas kernels (``BayesConv`` /
    ``BayesDense``) — the TPU analogue of the hls4ml fork synthesizing the
    inserted dropout layers into the conv/dense fabric
    (``Hardware_Artifact/autobayes/diff_dropouts.py:33-53``). Strided or
    explicitly-padded convs keep the materialized site.
    """

    specs: tuple
    quant: QuantConfig | None = None
    dtype: jnp.dtype = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, *, sample_idx=0, train: bool = False
                 ) -> ExitOutputs:
        feat = None
        pending: BayesConfig | None = None
        site_kw = dict(sample_idx=sample_idx, train=train)
        for i, s in enumerate(self.specs):
            if isinstance(s, C):
                if pending is not None:
                    x = BayesConv(s.features, tuple(s.kernel),
                                  tuple(s.strides), s.padding, bayes=pending,
                                  quant=self.quant, dtype=self.dtype,
                                  name=f"conv_{i}")(x, **site_kw)
                    pending = None
                else:
                    x = Conv(s.features, s.kernel, s.strides, s.padding,
                             quant=self.quant, dtype=self.dtype,
                             name=f"conv_{i}")(x)
            elif isinstance(s, D):
                if x.ndim > 2:
                    x = x.reshape((x.shape[0], -1))
                feat = x
                if pending is not None:
                    x = BayesDense(s.features, bayes=pending, fused=True,
                                   quant=self.quant, dtype=self.dtype,
                                   name=f"dense_{i}")(x, **site_kw)
                    pending = None
                else:
                    x = Dense(s.features, quant=self.quant, dtype=self.dtype,
                              name=f"dense_{i}")(x)
            elif isinstance(s, Act):
                x = QuantAct(act=getattr(nn, s.fn), quant=self.quant,
                             name=f"act_{i}")(x)
            elif isinstance(s, Pool):
                pool = max_pool if s.kind == "max" else avg_pool
                x = pool(x, s.window, s.strides)
            elif isinstance(s, Flatten):
                x = x.reshape((x.shape[0], -1))
            elif isinstance(s, Bayes):
                nxt = self.specs[i + 1] if i + 1 < len(self.specs) else None
                # never defer into the LAST Dense: its input is recorded as
                # the exit feature, and a fused (in-kernel) mask would make
                # `feat` the PRE-mask activation while the materialized path
                # records the masked one — feature-based metrics (aPE on
                # features) must be like-for-like (ADVICE r2 #2)
                last_d = max((j for j, t in enumerate(self.specs)
                              if isinstance(t, D)), default=-1)
                if (self.fused and isinstance(nxt, (C, D))
                        and i + 1 != last_d and (
                        isinstance(nxt, D)
                        or (tuple(nxt.strides) == (1, 1)
                            and isinstance(nxt.padding, str)))):
                    pending = s.cfg   # consumed by the next layer's kernel
                else:
                    x = BayesSite(s.cfg, name=f"bayes_{i}")(x, **site_kw)
            else:
                raise TypeError(f"unknown spec {s!r}")
        return stack_exits([x], [feat] if feat is not None else None)


# ------------------------------------------------------------- BNN wrappers


class _BayesianWrapper:
    """Common behaviour of the converter wrappers: keep the converted model
    + variables, train plain, predict MC-averaged (``MCDropout.py:57-68``)."""

    def __init__(self, model: nn.Module, bayes: BayesConfig):
        self.model = model
        self.bayes = bayes
        self.variables = None

    def init(self, key: jax.Array, x: jax.Array) -> None:
        from bayestpu.core.rng import BAYES_RNG
        self.variables = self.model.init({"params": key, BAYES_RNG: key}, x)

    def __call__(self, x: jax.Array, key: jax.Array, *, train: bool = False
                 ) -> jax.Array:
        from bayestpu.core.rng import BAYES_RNG
        if train:
            out: ExitOutputs = self.model.apply(
                self.variables, x, train=True, rngs={BAYES_RNG: key})
            return out.logits[-1]
        pred = sampler.predictive(
            self.model, self.variables, x, key,
            sampler.num_effective_samples(self.bayes))
        return pred.probs[-1]

    def predict(self, x: jax.Array, key: jax.Array | None = None) -> jax.Array:
        """MC-averaged class probabilities (≙ ``predict_hls`` averaging,
        ``nn2bnn.py:187-191``)."""
        return self(x, key if key is not None else jax.random.key(0))

    def evaluate(self, x: jax.Array, y: jax.Array,
                 key: jax.Array | None = None) -> dict:
        """Accuracy/ECE/NLL of the MC-averaged prediction
        (≙ ``evaluate_hls``, ``nn2bnn.py:193-195``)."""
        from bayestpu.metrics import eval_metrics
        probs = self.predict(x, key)
        return {k: float(v) for k, v in eval_metrics(probs, y).items()}


class MCDropoutModel(_BayesianWrapper):
    """≙ ``MCDropout(model, nSamples, p, num, strategy)``
    (``converter/keras/MCDropout.py:40-55``)."""

    def __init__(self, specs: Sequence[Spec], num_samples: int = 10,
                 rate: float = 0.25, num: int = 1,
                 strategy: InsertStrategy | str = InsertStrategy.DEFAULT,
                 quant: QuantConfig | None = None):
        bayes = BayesConfig(kind=DropoutKind.MC, rate=rate,
                            num_samples=num_samples, num_bayes_layers=num,
                            strategy=InsertStrategy(strategy))
        converted = convert_to_bayesian(specs, bayes) if num > 0 else list(specs)
        super().__init__(Sequential(specs=tuple(converted), quant=quant),
                         bayes)


class MasksemblesModel(_BayesianWrapper):
    """≙ ``MasksemblesModel(model, num_masks, scale, num, strategy)``
    (``converter/keras/Masksembles.py:193-214``)."""

    def __init__(self, specs: Sequence[Spec], num_masks: int = 4,
                 scale: float = 2.0, num: int = 1,
                 strategy: InsertStrategy | str = InsertStrategy.DEFAULT,
                 quant: QuantConfig | None = None):
        bayes = BayesConfig(kind=DropoutKind.MASK, num_masks=num_masks,
                            scale=scale, num_bayes_layers=num,
                            strategy=InsertStrategy(strategy))
        converted = convert_to_bayesian(specs, bayes) if num > 0 else list(specs)
        super().__init__(Sequential(specs=tuple(converted), quant=quant),
                         bayes)


def lenet_specs(num_classes: int = 10) -> list[Spec]:
    """The float LeNet of the autobayes zoo
    (``Hardware_Artifact/autobayes/models/LeNet.py``) as specs — the
    converter's canonical test subject."""
    return [
        C(20, (5, 5)), Act(), Pool("max", 2),
        C(20, (5, 5)), Act(), Pool("max", 7),
        Flatten(),
        D(100), Act(),
        D(num_classes),
    ]

"""LeNet family: single-exit and multi-exit Bayesian variants.

Mirrors the reference's MNIST workhorse:

- ``LeNet`` ≙ ``lenet``/``Qlenet``: conv(20,5×5,same)+relu+pool(2) →
  conv(20,5×5,same)+relu+pool(7) → flatten → dense(100)+relu → dense(10),
  with Bayesian sites inserted back-to-front at up to 3 points by a countdown
  (``Hardware_Artifact/bayes_hw/models/qmodels.py:60-101``,
  ``models.py:34-73``).
- ``LeNetME`` ≙ ``T_Qlenet_bayes_me``: adds an early exit branching after the
  first conv block (strided conv(20,5×5,s7) → dense(100) → bayes →
  dense(10)); the main exit is the full backbone → bayes → dense(10)
  (``Hardware_Artifact/bayes_hw/models/t_qmodels_bayes_me.py:41-147``).

The reference bakes ``mc_samples-1`` extra replica heads into the graph
("spatial" S_* models) or re-runs the graph ("temporal" T_*). Neither is
needed here: models emit ONE set of exit logits and the engine maps the
sample dimension with vmap / lax.scan / pjit (``bayestpu.engine.sampler``).

Models return pre-softmax logits (the reference attaches softmax in-graph;
on TPU softmax belongs in the loss / ensembling stage for numerical reasons
— XLA's stable softmax ≙ the fork's ``Strategy='Stable'`` softmax config at
``hls4ml_pred.py:68``).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

import dataclasses

from bayestpu.core.config import BayesConfig, DropoutKind, QuantConfig
from bayestpu.nn.bayes import BayesSite
from bayestpu.nn.fused import BayesConv, BayesDense
from bayestpu.nn.layers import Conv, Dense, QuantAct, max_pool
from bayestpu.nn.multiexit import ExitOutputs, stack_exits
from bayestpu.nn.zoo.registry import register_model

# LeNet has 3 insertion points (after pool1, after flatten, after fc_1); the
# countdown in the reference inserts at the LAST `num_bayes_layers` of them.
_NUM_SITES = 3


def _site_on(site_idx: int, num_bayes_layers: int) -> bool:
    """Back-to-front countdown insertion (``qmodels.py:62,71-95``)."""
    return site_idx >= _NUM_SITES - num_bayes_layers


class LeNet(nn.Module):
    """Single-exit LeNet with configurable Bayesian sites."""

    bayes: BayesConfig = BayesConfig()
    num_classes: int = 10
    quant: QuantConfig | None = None
    dtype: jnp.dtype = jnp.float32
    fused: bool = False   # Pallas fused mask+matmul for the classifier head

    @nn.compact
    def __call__(self, x: jax.Array, *, sample_idx=0, train: bool = False
                 ) -> ExitOutputs:
        q, dt = self.quant, self.dtype
        nb = self.bayes.num_bayes_layers

        x = Conv(20, (5, 5), padding="SAME", quant=q, dtype=dt,
                 quant_input=False, name="conv2d_1")(x)
        x = QuantAct(quant=q, name="relu1")(x)
        x = max_pool(x, 2, 2)
        # Site 0's only consumer is conv2d_2: with fused=True the mask fuses
        # into that conv's Pallas kernel (BayesConv); param path stays
        # conv2d_2/kernel either way.
        if _site_on(0, nb) and self.fused:
            x = BayesConv(20, (5, 5), padding="SAME", bayes=self.bayes,
                          quant=q, dtype=dt, name="conv2d_2")(
                x, sample_idx=sample_idx, train=train)
        else:
            if _site_on(0, nb):
                x = BayesSite(self.bayes, name="bayes_0")(
                    x, sample_idx=sample_idx, train=train)
            x = Conv(20, (5, 5), padding="SAME", quant=q, dtype=dt,
                     name="conv2d_2")(x)
        x = QuantAct(quant=q, name="relu2")(x)
        x = max_pool(x, 7, 7)
        x = x.reshape((x.shape[0], -1))
        # Site 1 feeds fc_1: fuse into the masked-matmul kernel.
        if _site_on(1, nb) and self.fused:
            x = BayesDense(100, bayes=self.bayes, fused=True, quant=q, dtype=dt,
                           name="fc_1")(x, sample_idx=sample_idx, train=train)
        else:
            if _site_on(1, nb):
                x = BayesSite(self.bayes, name="bayes_1")(
                    x, sample_idx=sample_idx, train=train)
            x = Dense(100, quant=q, dtype=dt, name="fc_1")(x)
        x = QuantAct(quant=q, name="relu3")(x)
        feat = x
        head_bayes = self.bayes if _site_on(2, nb) else dataclasses.replace(
            self.bayes, kind=DropoutKind.NONE)
        logits = BayesDense(self.num_classes, bayes=head_bayes,
                            fused=self.fused, quant=q, dtype=dt,
                            name="fc_2")(
            x, sample_idx=sample_idx, train=train)
        return stack_exits([logits], [feat])


class LeNetME(nn.Module):
    """Two-exit Bayesian LeNet (≙ ``T_Qlenet_bayes_me``).

    Exit order follows the framework convention (earliest first, final last):
    exit 0 is the reference's "2nd exit" early branch, exit 1 its main exit.
    Each exit has its own Bayesian site directly before its classifier head,
    as in ``t_qmodels_bayes_me.py:68-71,113-119``.
    """

    bayes: BayesConfig = BayesConfig()
    num_classes: int = 10
    quant: QuantConfig | None = None
    dtype: jnp.dtype = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, *, sample_idx=0, train: bool = False
                 ) -> ExitOutputs:
        q, dt = self.quant, self.dtype

        # Shared stem (entry conv consumes the raw input — Conv.quant_input)
        x = Conv(20, (5, 5), padding="SAME", quant=q, dtype=dt,
                 quant_input=False, name="conv2d_1")(x)
        x = QuantAct(quant=q, name="relu1")(x)
        x = max_pool(x, 2, 2)

        # Early exit: strided conv collapses the 14×14 map in one shot
        e = Conv(20, (5, 5), strides=(7, 7), padding="SAME", quant=q,
                 dtype=dt, name="conv2d_2_2nd_exit")(x)
        e = QuantAct(quant=q, name="relu2_2nd_exit")(e)
        e = e.reshape((e.shape[0], -1))
        e = Dense(100, quant=q, dtype=dt, name="fc_1_2nd_exit")(e)
        e = QuantAct(quant=q, name="relu3_2nd_exit")(e)
        feat_e = e
        exit_early = BayesDense(self.num_classes, bayes=self.bayes,
                                fused=self.fused, quant=q, dtype=dt,
                                name="fc_2nd_exit")(
            e, sample_idx=sample_idx, train=train)

        # Main exit
        x = Conv(20, (5, 5), padding="SAME", quant=q, dtype=dt,
                 name="conv2d_2")(x)
        x = QuantAct(quant=q, name="relu2")(x)
        x = max_pool(x, 7, 7)
        x = x.reshape((x.shape[0], -1))
        x = Dense(100, quant=q, dtype=dt, name="fc_1")(x)
        x = QuantAct(quant=q, name="relu3")(x)
        feat_m = x
        exit_main = BayesDense(self.num_classes, bayes=self.bayes,
                               fused=self.fused, quant=q, dtype=dt,
                               name="fc_exit_1st")(
            x, sample_idx=sample_idx, train=train)

        return stack_exits([exit_early, exit_main], [feat_e, feat_m])


@register_model("lenet")
def build_lenet(**kw) -> LeNet:
    return LeNet(**kw)


@register_model("lenet_me")
def build_lenet_me(**kw) -> LeNetME:
    return LeNetME(**kw)

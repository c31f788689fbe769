"""Model zoo: shapes, exit counts, BN mutability, Bayes placement options."""

import jax
import jax.numpy as jnp
import pytest

from bayestpu.core.config import BayesConfig, DropoutKind, QuantConfig
from bayestpu.core.rng import BAYES_RNG
from bayestpu.nn.zoo import available_models, get_model


def _init_apply(model, x, train=False):
    key = jax.random.key(0)
    vs = model.init({"params": key, BAYES_RNG: key}, x, train=train)
    out, _ = model.apply(vs, x, train=train, rngs={BAYES_RNG: key},
                         mutable=["batch_stats"])
    return vs, out


def test_registry_contents():
    names = available_models()
    for required in ["lenet", "lenet_me", "resnet18", "resnet18_me",
                     "resnet20", "vgg11", "vgg11_me", "vgg16", "vgg19",
                     "vgg19_me"]:
        assert required in names


@pytest.mark.parametrize("name,shape,n_exits,classes", [
    ("resnet18", (2, 32, 32, 3), 1, 100),
    ("resnet18_me", (2, 32, 32, 3), 4, 100),
    ("resnet20", (2, 32, 32, 3), 1, 10),
    ("vgg11", (2, 32, 32, 3), 1, 10),
    ("vgg19_me", (2, 32, 32, 3), 5, 100),
])
def test_exit_counts_and_shapes(name, shape, n_exits, classes):
    model = get_model(name)
    _, out = _init_apply(model, jnp.zeros(shape))
    assert out.logits.shape == (n_exits, shape[0], classes)


def test_resnet_block_dropout_placements():
    for mode in (None, "block", "layer"):
        model = get_model("resnet18", dropout=mode, dropout_exit=True,
                          bayes=BayesConfig(rate=0.3))
        _, out = _init_apply(model, jnp.zeros((2, 32, 32, 3)))
        assert out.logits.shape == (1, 2, 100)


def test_resnet_masksembles_exit():
    cfg = BayesConfig(kind=DropoutKind.MASK, num_masks=4, scale=2.0)
    model = get_model("resnet18_me", bayes=cfg)
    x = jnp.zeros((4, 32, 32, 3))
    vs, out = _init_apply(model, x)
    assert "masks" in vs  # bank variables created
    assert out.logits.shape == (4, 4, 100)


def test_quantized_vgg11_runs():
    model = get_model("vgg11", quant=QuantConfig(8, 0))
    _, out = _init_apply(model, jnp.zeros((2, 32, 32, 3)))
    assert out.logits.shape == (1, 2, 10)


def test_batchnorm_stats_update():
    model = get_model("resnet20")
    key = jax.random.key(0)
    x = jax.random.normal(key, (4, 32, 32, 3))
    vs = model.init({"params": key, BAYES_RNG: key}, x, train=True)
    _, upd = model.apply(vs, x, train=True, rngs={BAYES_RNG: key},
                         mutable=["batch_stats"])
    old = jax.tree_util.tree_leaves(vs["batch_stats"])
    new = jax.tree_util.tree_leaves(upd["batch_stats"])
    assert any((a != b).any() for a, b in zip(old, new))


def test_bayes_in_on_identity_block_raises():
    """The single-site invariant is enforced structurally: a fused input
    site on a block with an identity residual (no projection conv) would
    silently bypass the mask on the residual path (ADVICE r3)."""
    from bayestpu.nn.zoo.resnet import BasicBlock, Bottleneck

    x = jnp.ones((2, 8, 8, 64), jnp.float32)
    cfg = BayesConfig(kind=DropoutKind.MC, rate=0.25)
    blk = BasicBlock(planes=64, stride=1, bayes_in=cfg)
    with pytest.raises(ValueError, match="identity BasicBlock"):
        blk.init({"params": jax.random.key(0), BAYES_RNG: jax.random.key(1)},
                 x)
    bot = Bottleneck(planes=16, stride=1, bayes_in=cfg)  # out_ch=64 == in
    with pytest.raises(ValueError, match="identity Bottleneck"):
        bot.init({"params": jax.random.key(0), BAYES_RNG: jax.random.key(1)},
                 x)
    # projection blocks still accept the site
    ok = BasicBlock(planes=128, stride=2, bayes_in=cfg)
    ok.init({"params": jax.random.key(0), BAYES_RNG: jax.random.key(1)}, x)


def test_vgg_block_batch_chunking_row_independent():
    """_VGGBlock slices batches ≥512 into 256-row chunks at inference (the
    XLA conv→pool fusion cliff, scripts/exp_batch_falloff.json). Per-row
    outputs must be identical to an unchunked small-batch call — the block
    is elementwise/per-row, so chunking is a pure dataflow change."""
    import numpy as np

    from bayestpu.nn.zoo import get_model

    model = get_model("vgg11", bayes=BayesConfig(kind=DropoutKind.NONE))
    key = jax.random.key(0)
    x = jax.random.normal(key, (512, 32, 32, 3))
    vs = model.init({"params": key, BAYES_RNG: key}, x[:4])
    big = model.apply(vs, x, train=False, rngs={BAYES_RNG: key}).logits
    small = model.apply(vs, x[:8], train=False, rngs={BAYES_RNG: key}).logits
    np.testing.assert_allclose(np.asarray(big[-1][:8]),
                               np.asarray(small[-1]), rtol=2e-5, atol=2e-5)

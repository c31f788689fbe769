"""Golden keras-parity: save a keras LeNet to .h5, import into bayestpu,
deterministic logits must agree (the SW↔HW golden-model protocol of
SURVEY §4 applied to the .h5 bridge)."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bayestpu.core.config import BayesConfig, DropoutKind  # noqa: E402
from bayestpu.core.rng import BAYES_RNG  # noqa: E402
from bayestpu.interop.keras_import import assign_by_name, read_h5_weights  # noqa: E402
from bayestpu.nn.zoo import get_model  # noqa: E402


def _keras_lenet():
    """The reference HW LeNet graph (bayes_hw/models/models.py:34-73) with
    the reference's layer names."""
    k = tf.keras
    model = k.Sequential([
        k.layers.Input(shape=(28, 28, 1)),
        k.layers.Conv2D(20, (5, 5), padding="same", name="conv2d_1"),
        k.layers.Activation("relu"),
        k.layers.MaxPool2D((2, 2), strides=2),
        k.layers.Conv2D(20, (5, 5), padding="same", name="conv2d_2"),
        k.layers.Activation("relu"),
        k.layers.MaxPool2D((7, 7), strides=7),
        k.layers.Flatten(),
        k.layers.Dense(100, name="fc_1"),
        k.layers.Activation("relu"),
        k.layers.Dense(10, name="fc_2"),
    ])
    return model


def test_h5_roundtrip_logit_parity(tmp_path, key):
    keras_model = _keras_lenet()
    path = str(tmp_path / "lenet.h5")
    keras_model.save(path)

    weights = read_h5_weights(path)
    assert "conv2d_1" in weights and "kernel" in weights["conv2d_1"]

    model = get_model("lenet", bayes=BayesConfig(kind=DropoutKind.NONE))
    x = np.random.default_rng(0).normal(size=(4, 28, 28, 1)).astype(np.float32)
    vs = model.init({"params": key, BAYES_RNG: key}, jnp.asarray(x))
    vs = assign_by_name(vs, weights)

    want = keras_model(x, training=False).numpy()
    got = np.asarray(model.apply(vs, jnp.asarray(x),
                                 rngs={BAYES_RNG: key}).logits[0])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_shape_mismatch_raises(tmp_path, key):
    keras_model = _keras_lenet()
    path = str(tmp_path / "lenet.h5")
    keras_model.save(path)
    weights = read_h5_weights(path)
    weights["fc_2"]["kernel"] = weights["fc_2"]["kernel"][:, :5]  # corrupt
    model = get_model("lenet", bayes=BayesConfig(kind=DropoutKind.NONE))
    vs = model.init({"params": key, BAYES_RNG: key},
                    jnp.zeros((1, 28, 28, 1)))
    with pytest.raises(ValueError, match="shape mismatch"):
        assign_by_name(vs, weights)

"""Golden cross-implementation parity vs PyTorch (SURVEY §4: the reference
verifies by cross-implementation equivalence — verify_masksembles.py,
verify_accuracy.py). A torch twin of our LeNet is built, weights are ported
with bayestpu.interop, and deterministic logits must agree."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from bayestpu.core.config import BayesConfig, DropoutKind  # noqa: E402
from bayestpu.core.rng import BAYES_RNG  # noqa: E402
from bayestpu.interop import torch_import as ti  # noqa: E402
from bayestpu.nn.zoo import get_model  # noqa: E402


class TorchLeNet(tnn.Module):
    """The reference's LeNet shape (bayes_hw/models/models.py:34-73) in
    torch: conv(20,5,same) relu pool2 conv(20,5,same) relu pool7 flatten
    fc(100) relu fc(10)."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(1, 20, 5, padding=2)
        self.conv2 = tnn.Conv2d(20, 20, 5, padding=2)
        self.fc1 = tnn.Linear(20 * 2 * 2, 100)
        self.fc2 = tnn.Linear(100, 10)

    def forward(self, x):
        x = F.max_pool2d(F.relu(self.conv1(x)), 2, 2)
        x = F.max_pool2d(F.relu(self.conv2(x)), 7, 7)
        x = x.flatten(1)
        x = F.relu(self.fc1(x))
        return self.fc2(x)


def _port_weights(tm: TorchLeNet, variables):
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    p["conv2d_1"]["kernel"] = ti.conv_weight(sd["conv1.weight"])
    p["conv2d_1"]["bias"] = sd["conv1.bias"]
    p["conv2d_2"]["kernel"] = ti.conv_weight(sd["conv2.weight"])
    p["conv2d_2"]["bias"] = sd["conv2.bias"]
    p["fc_1"]["kernel"] = ti.linear_weight_after_flatten(
        sd["fc1.weight"], c=20, h=2, wdim=2)
    p["fc_1"]["bias"] = sd["fc1.bias"]
    p["fc_2"]["kernel"] = ti.linear_weight(sd["fc2.weight"])
    p["fc_2"]["bias"] = sd["fc2.bias"]
    ti.check_weight_load(sd["fc2.bias"], p["fc_2"]["bias"])
    return {**variables, "params": p}


def test_lenet_logits_match_torch(key):
    torch.manual_seed(0)
    tm = TorchLeNet().eval()
    model = get_model("lenet", bayes=BayesConfig(kind=DropoutKind.NONE))
    x = np.random.default_rng(0).normal(size=(8, 28, 28, 1)).astype(np.float32)
    vs = model.init({"params": key, BAYES_RNG: key}, jnp.asarray(x))
    vs = _port_weights(tm, vs)

    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(model.apply(vs, jnp.asarray(x),
                                 rngs={BAYES_RNG: key}).logits[0])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_mc_predictive_tracks_torch_mc(key):
    """MC-dropout averaged predictions agree within MC error between torch
    (F.dropout always-on, resnet18.py:207-210 semantics) and our engine."""
    torch.manual_seed(0)
    tm = TorchLeNet().eval()
    model = get_model("lenet", bayes=BayesConfig(rate=0.5,
                                                 num_bayes_layers=1))
    x = np.random.default_rng(1).normal(size=(16, 28, 28, 1)).astype(np.float32)
    vs = model.init({"params": key, BAYES_RNG: key}, jnp.asarray(x))
    vs = _port_weights(tm, vs)

    s = 400
    with torch.no_grad():
        tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
        h = F.max_pool2d(F.relu(tm.conv1(tx)), 2, 2)
        h = F.max_pool2d(F.relu(tm.conv2(h)), 7, 7).flatten(1)
        h = F.relu(tm.fc1(h))
        probs = torch.stack([
            torch.softmax(tm.fc2(F.dropout(h, 0.5, True)), -1)
            for _ in range(s)]).mean(0).numpy()

    from bayestpu.engine import sampler
    pred = sampler.predictive(model, vs, jnp.asarray(x), jax.random.key(2), s)
    ours = np.asarray(pred.probs[0])
    # agreement within Monte-Carlo error (BASELINE: "within MC error")
    assert np.abs(ours - probs).max() < 0.08
    assert (ours.argmax(-1) == probs.argmax(-1)).mean() >= 0.9

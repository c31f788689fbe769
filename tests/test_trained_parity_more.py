"""Trained-parity breadth (VERDICT r2 item 4): Masksembles + EED multi-exit.

The round-2 trained-parity protocol covered one family (MC-dropout
``ResNet18MC``, plain CE). The reference's own trained verifications also
cover:

1. **Masksembles** — trained LeNet with a fixed mask bank, compared
   per-mask (``/root/reference/Hardware_Artifact/autobayes/
   verify_accuracy.py:88-92``: keras accuracy vs per-``mask_index`` HLS
   accuracy). Here the reference's own torch ``Masksembles1D``
   (``Software_Artifact/software/utils.py``) trains side-by-side with the
   bayestpu LeNet on identical data/batch order, the torch layer's mask
   bank is COPIED into the bayestpu model (same bank → per-mask accs are
   like-for-like), and per-mask + mask-averaged accuracies must agree.
2. **Multi-exit EED training** — the reference's
   ``ExitEnsembleDistillation`` loss (``Software_Artifact/software/train/
   loss/loss_functions.py:29-58``) training its ``ResNet18EarlyExit``
   (4 exits) vs ``bayestpu.train.losses.eed_loss`` training the bayestpu
   ``resnet18_me`` twin; per-exit accuracies must agree.

Both runs are deterministic at eval (fixed bank / no dropout), so the
comparison bound is the cross-framework training-stochasticity floor alone
(different init + shuffle PRNGs), not MC-eval noise.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

# trains reference torch models (minutes each) — excluded from the default
# suite; run with `pytest -m ""` (VERDICT r4 next #7)
pytestmark = pytest.mark.slow

import optax  # noqa: E402

from bayestpu.core.config import BayesConfig, DropoutKind  # noqa: E402
from bayestpu.data.datasets import get_dataset  # noqa: E402
from bayestpu.nn.zoo import get_model  # noqa: E402
from bayestpu.train.loop import create_state, make_train_step  # noqa: E402

REF_SW = "/root/reference/Software_Artifact/software"

BATCH, LR, MOM = 64, 0.05, 0.9


def _batch_order(seed: int, n: int, epochs: int):
    rng = np.random.default_rng(seed)
    return [rng.permutation(n) for _ in range(epochs)]


def _no_cuda(monkeypatch_target=None):
    """The reference loss hard-codes ``.cuda()`` (loss_functions.py:10);
    neutralize it on this CPU-only box."""
    if not torch.cuda.is_available():
        torch.nn.Module.cuda = lambda self, *a, **k: self


# ------------------------------------------------------------- Masksembles

N_MASKS, SCALE = 4, 2.0
# LeNet+Adam on synthetic MNIST: 2048×8 epochs trains both frameworks into
# the stable >0.95 regime (512×6 sits on a knife's edge where per-mask acc
# varies 0.59-0.72 within ONE model — useless for cross-framework bounds)
MASK_EPOCHS, MASK_NTRAIN, MASK_NTEST = 8, 2048, 512
MASK_LR = 1e-3   # the reference trains Masksembles with Adam
#                  (converter/keras/train.py:data_train)


class _TorchLeNetMask(torch.nn.Module):
    """Torch twin of the bayestpu ``lenet`` (num_bayes_layers=1) with the
    reference's OWN ``Masksembles1D`` before the classifier head — the
    layout ``verify_accuracy.py`` trains (site before the final dense)."""

    def __init__(self, mask_layer):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(1, 20, 5, padding=2)
        self.conv2 = torch.nn.Conv2d(20, 20, 5, padding=2)
        self.fc1 = torch.nn.Linear(80, 100)
        self.mask = mask_layer
        self.fc2 = torch.nn.Linear(100, 10)

    def forward(self, x):
        x = torch.nn.functional.max_pool2d(torch.relu(self.conv1(x)), 2)
        x = torch.nn.functional.max_pool2d(torch.relu(self.conv2(x)), 7)
        x = torch.flatten(x, 1)
        x = torch.relu(self.fc1(x))
        return self.fc2(self.mask(x))


def test_trained_masksembles_per_mask_parity():
    sys.path.insert(0, REF_SW)
    try:
        from utils import Masksembles1D
    finally:
        sys.path.remove(REF_SW)

    ds = get_dataset("mnist", data_dir="/nonexistent",
                     n_synth_train=MASK_NTRAIN, n_synth_test=MASK_NTEST)
    order = _batch_order(11, MASK_NTRAIN, MASK_EPOCHS)

    # ---- reference side: torch + the reference's own Masksembles1D
    torch.manual_seed(5)
    np.random.seed(5)          # Masksembles1D's generator uses np.random
    mask_layer = Masksembles1D(100, N_MASKS, SCALE)
    net = _TorchLeNetMask(mask_layer)
    opt = torch.optim.Adam(net.parameters(), lr=MASK_LR)
    lossf = torch.nn.CrossEntropyLoss()
    xtr = torch.from_numpy(ds.x_train.transpose(0, 3, 1, 2))
    ytr = torch.from_numpy(ds.y_train.astype(np.int64))
    net.train()
    for ep in range(MASK_EPOCHS):
        for s in range(0, MASK_NTRAIN, BATCH):
            idx = order[ep][s:s + BATCH]
            opt.zero_grad()
            loss = lossf(net(xtr[idx]), ytr[idx])
            loss.backward()
            opt.step()
    net.eval()
    xte = torch.from_numpy(ds.x_test.transpose(0, 3, 1, 2))
    t_acc = []
    for i in range(N_MASKS):
        mask_layer.cnt = i      # per-mask select ≙ predict(x, mask_index=i)
        with torch.no_grad():
            p = net(xte).numpy()
        t_acc.append(float((p.argmax(-1) == ds.y_test).mean()))

    # ---- bayestpu side, with the torch layer's bank COPIED in
    bank = np.asarray(mask_layer.masks.detach().numpy(), np.float32)
    model = get_model("lenet",
                      bayes=BayesConfig(kind=DropoutKind.MASK,
                                        num_masks=N_MASKS, scale=SCALE,
                                        num_bayes_layers=1),
                      fused=False)
    key = jax.random.key(5)
    tx = optax.adam(MASK_LR)
    state = create_state(model, tx, key, jnp.asarray(ds.x_train[:BATCH]))
    # overwrite the generated bank with the torch one (same-bank protocol)
    masks_col = jax.tree.map(lambda _: jnp.asarray(bank),
                             state.extra["masks"])
    extra = dict(state.extra)
    extra["masks"] = masks_col
    step = make_train_step(model, tx, has_batch_stats=False)
    params, opt_state = state.params, state.opt_state
    i = 0
    for ep in range(MASK_EPOCHS):
        for s in range(0, MASK_NTRAIN, BATCH):
            idx = order[ep][s:s + BATCH]
            params, extra, opt_state, _ = step(
                params, extra, opt_state, jnp.asarray(ds.x_train[idx]),
                jnp.asarray(ds.y_train[idx]), key, i)
            i += 1
    vs = {"params": params, **extra}

    @jax.jit
    def logits(x, idx):
        return model.apply(vs, x, sample_idx=idx, train=False).logits[-1]

    xte_j = jnp.asarray(ds.x_test)
    j_acc = [float((np.asarray(logits(xte_j, jnp.int32(i))).argmax(-1)
                    == ds.y_test).mean()) for i in range(N_MASKS)]

    assert np.mean(t_acc) > 0.9, f"torch masksembles failed to train: {t_acc}"
    assert np.mean(j_acc) > 0.9, f"bayestpu masksembles failed to train: {j_acc}"
    # mask-averaged accuracy: tight cross-framework floor
    assert abs(np.mean(t_acc) - np.mean(j_acc)) <= 0.04, (t_acc, j_acc)
    # per-mask accuracies (same bank both sides)
    for i in range(N_MASKS):
        assert abs(t_acc[i] - j_acc[i]) <= 0.05, (i, t_acc, j_acc)


# ------------------------------------------------------------- EED multi-exit

EED_EPOCHS, EED_NTRAIN, EED_NTEST = 8, 512, 256


def test_trained_eed_multiexit_per_exit_parity():
    import types

    sys.path.insert(0, REF_SW)
    _no_cuda()
    # importing `train.loss` runs the reference's `train/__init__.py`,
    # which transitively imports torchvision (not in this image); stub it —
    # the loss under test touches neither
    for name in ("torchvision", "torchvision.transforms",
                 "torchvision.datasets", "matplotlib", "matplotlib.pyplot",
                 "KDEpy", "sacred", "sacred.observers"):
        sys.modules.setdefault(name, types.ModuleType(name))
    if not hasattr(sys.modules["KDEpy"], "FFTKDE"):
        sys.modules["KDEpy"].FFTKDE = object
    try:
        from models.resnet18.resnet18 import ResNet18EarlyExit
        from train.loss.loss_functions import ExitEnsembleDistillation
    finally:
        sys.path.remove(REF_SW)

    ds = get_dataset("cifar10", data_dir="/nonexistent",
                     n_synth_train=EED_NTRAIN, n_synth_test=EED_NTEST)
    order = _batch_order(13, EED_NTRAIN, EED_EPOCHS)

    # ---- reference side: their model + their EED loss (MSE variant)
    torch.manual_seed(9)
    net = ResNet18EarlyExit(n_exits=4, out_dim=10)
    eed = ExitEnsembleDistillation(n_exits=4, use_EED=True,
                                   loss_output="MSE")
    opt = torch.optim.SGD(net.parameters(), lr=LR, momentum=MOM)
    xtr = torch.from_numpy(ds.x_train.transpose(0, 3, 1, 2))
    ytr = torch.from_numpy(ds.y_train.astype(np.int64))
    net.train()
    for ep in range(EED_EPOCHS):
        for s in range(0, EED_NTRAIN, BATCH):
            idx = order[ep][s:s + BATCH]
            opt.zero_grad()
            loss = eed(net, xtr[idx], ytr[idx])
            loss.backward()
            opt.step()
    net.eval()
    with torch.no_grad():
        outs = net(torch.from_numpy(ds.x_test.transpose(0, 3, 1, 2)))
    t_acc = [float((o.numpy().argmax(-1) == ds.y_test).mean()) for o in outs]

    # ---- bayestpu side: resnet18_me twin + eed_loss (MSE)
    from bayestpu.train.losses import EEDConfig

    model = get_model("resnet18_me", num_classes=10, dropout_exit=False,
                      bayes=BayesConfig(kind=DropoutKind.NONE))
    key = jax.random.key(9)
    tx = optax.sgd(LR, MOM)
    state = create_state(model, tx, key, jnp.asarray(ds.x_train[:2]))
    step = make_train_step(
        model, tx, eed_cfg=EEDConfig(use_eed=True, loss_output="MSE"),
        has_batch_stats="batch_stats" in state.extra)
    params, extra, opt_state = state.params, state.extra, state.opt_state
    i = 0
    for ep in range(EED_EPOCHS):
        for s in range(0, EED_NTRAIN, BATCH):
            idx = order[ep][s:s + BATCH]
            params, extra, opt_state, _ = step(
                params, extra, opt_state, jnp.asarray(ds.x_train[idx]),
                jnp.asarray(ds.y_train[idx]), key, i)
            i += 1
    vs = {"params": params, **extra}

    @jax.jit
    def logits(x):
        return model.apply(vs, x, train=False).logits  # (E, B, C)

    lj = np.asarray(logits(jnp.asarray(ds.x_test)))
    j_acc = [float((lj[e].argmax(-1) == ds.y_test).mean())
             for e in range(lj.shape[0])]

    assert len(t_acc) == len(j_acc) == 4
    assert np.mean(t_acc) > 0.45, f"torch EED failed to train: {t_acc}"
    assert np.mean(j_acc) > 0.45, f"bayestpu EED failed to train: {j_acc}"
    assert abs(np.mean(t_acc) - np.mean(j_acc)) <= 0.04, (t_acc, j_acc)
    for e in range(4):
        # 0.06 per-exit floor (VERDICT r3 item 8; was 0.10 — wide enough to
        # hide a real per-exit regression). 8 epochs converge both sides
        # close enough that cross-framework stochasticity sits well inside.
        assert abs(t_acc[e] - j_acc[e]) <= 0.06, (e, t_acc, j_acc)

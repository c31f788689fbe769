"""Golden parity against the REFERENCE'S OWN torch models.

The reference's verification culture is cross-implementation equivalence
(SURVEY §4). Here the gold standard is the reference code itself, imported
read-only from /root/reference at test time (never copied): its multi-exit
``ResNet18EarlyExit`` runs in torch, weights port through
``bayestpu.interop.torch_import.import_reference_resnet18``, and every
exit's logits must agree with our TPU-native ``ResNet18(n_exits=4)``.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_SW = "/root/reference/Software_Artifact/software"


@pytest.fixture(scope="module")
def ref_resnet18():
    sys.path.insert(0, REF_SW)
    try:
        from models.resnet18.resnet18 import ResNet18EarlyExit
    except Exception as e:  # pragma: no cover - reference tree absent
        pytest.skip(f"reference model unavailable: {e}")
    finally:
        sys.path.remove(REF_SW)
    torch.manual_seed(7)
    return ResNet18EarlyExit(out_dim=10).eval()


def test_resnet18_me_all_exits_match_reference(ref_resnet18, key):
    from bayestpu.core.config import BayesConfig, DropoutKind
    from bayestpu.core.rng import BAYES_RNG
    from bayestpu.interop.torch_import import import_reference_resnet18
    from bayestpu.nn.zoo import get_model

    model = get_model("resnet18_me", num_classes=10,
                      bayes=BayesConfig(kind=DropoutKind.NONE),
                      dropout_exit=False)
    x = np.random.default_rng(0).normal(
        0, 1, (4, 32, 32, 3)).astype(np.float32)
    template = model.init({"params": key, BAYES_RNG: key}, jnp.asarray(x))
    sd = {k: v.detach().numpy()
          for k, v in ref_resnet18.state_dict().items()}
    variables = import_reference_resnet18(sd, template)

    out = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), train=False, rngs={BAYES_RNG: key})
    ours = np.asarray(out.logits)            # (4, B, 10)

    with torch.no_grad():
        ref = ref_resnet18(torch.from_numpy(x).permute(0, 3, 1, 2))
    ref = np.stack([r.numpy() for r in ref])  # [out1, out2, out3, out]

    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_reference_checkpoint_roundtrip(ref_resnet18, tmp_path, key):
    """torch.save → torch.load → port (the reference's snapshot flow,
    ``train_base.py:71-74`` / ``model_loader.py:9-17``)."""
    from bayestpu.core.config import BayesConfig, DropoutKind
    from bayestpu.core.rng import BAYES_RNG
    from bayestpu.interop.torch_import import import_reference_resnet18
    from bayestpu.nn.zoo import get_model

    path = tmp_path / "best_val_model_0"
    torch.save(ref_resnet18.state_dict(), path)
    sd = {k: v.numpy() for k, v in torch.load(path).items()}

    model = get_model("resnet18_me", num_classes=10,
                      bayes=BayesConfig(kind=DropoutKind.NONE),
                      dropout_exit=False)
    template = model.init({"params": key, BAYES_RNG: key},
                          jnp.zeros((1, 32, 32, 3)))
    variables = import_reference_resnet18(sd, template)
    # a block-level weight survived the port (mirrors check_weight_load)
    np.testing.assert_array_equal(
        variables["params"]["layer2_0"]["convbn1"]["conv"]["kernel"],
        np.transpose(sd["layer2.0.conv1.weight"], (2, 3, 1, 0)))


@pytest.fixture(scope="module")
def ref_vgg19():
    sys.path.insert(0, REF_SW)
    try:
        from models.vgg19.vgg19 import VGG19EarlyExit
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference model unavailable: {e}")
    finally:
        sys.path.remove(REF_SW)
    torch.manual_seed(3)
    return VGG19EarlyExit(n_exits=5, out_dim=10).eval()


def test_vgg19_me_all_exits_match_reference(ref_vgg19, key):
    from bayestpu.core.config import BayesConfig, DropoutKind
    from bayestpu.core.rng import BAYES_RNG
    from bayestpu.interop.torch_import import import_reference_vgg19
    from bayestpu.nn.zoo import get_model

    model = get_model("vgg19_me", num_classes=10,
                      bayes=BayesConfig(kind=DropoutKind.NONE),
                      dropout_exit=False)
    x = np.random.default_rng(1).normal(
        0, 1, (2, 32, 32, 3)).astype(np.float32)
    template = model.init({"params": key, BAYES_RNG: key}, jnp.asarray(x))
    sd = {k: v.detach().numpy() for k, v in ref_vgg19.state_dict().items()}
    variables = import_reference_vgg19(sd, template)

    out = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), train=False, rngs={BAYES_RNG: key})
    ours = np.asarray(out.logits)            # (5, B, 10)

    with torch.no_grad():
        ref = ref_vgg19(torch.from_numpy(x).permute(0, 3, 1, 2))
    ref = np.stack([r.numpy() for r in ref])

    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def _import_ref_utils():
    sys.path.insert(0, REF_SW)
    try:
        import utils as ref_utils
        return ref_utils
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference utils unavailable: {e}")
    finally:
        sys.path.remove(REF_SW)


def test_masksembles_layer_matches_reference_bank(key):
    """Load the REFERENCE's own generated bank into our Masksembles layer:
    train batch-split and eval mask-select must reproduce the torch
    ``Masksembles1D`` outputs exactly (utils.py:206-236)."""
    from bayestpu.nn.bayes import MASKS_COLLECTION, Masksembles

    ref_utils = _import_ref_utils()
    np.random.seed(11)
    tm = ref_utils.Masksembles1D(32, 4, 2.0)
    bank = tm.masks.detach().numpy()            # (4, 32)

    layer = Masksembles(num_masks=4, scale=2.0)
    x = np.random.default_rng(2).random((8, 32)).astype(np.float32)
    variables = layer.init(key, jnp.asarray(x))
    variables = {**variables, MASKS_COLLECTION: {"bank": jnp.asarray(bank)}}

    # train mode: batch split into groups under consecutive masks
    ours_tr = np.asarray(layer.apply(variables, jnp.asarray(x), train=True))
    tm.train()
    ref_tr = tm(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(ours_tr, ref_tr, rtol=1e-6)

    # eval mode: sample_idx i == the reference's round-robin cnt == i
    tm.eval()
    for i in range(4):
        ref_ev = tm(torch.from_numpy(x)).detach().numpy()   # advances cnt
        ours_ev = np.asarray(layer.apply(
            variables, jnp.asarray(x), sample_idx=i, train=False))
        np.testing.assert_allclose(ours_ev, ref_ev, rtol=1e-6)


def test_mask_bank_properties_match_reference_generator():
    """Our exact-solver bank has the same structural properties as banks from
    the reference's generation_wrapper (utils.py:66-110): width c, equal
    ones-per-mask, full coverage."""
    from bayestpu.kernels import mask_bank

    ref_utils = _import_ref_utils()
    np.random.seed(5)
    ref_bank = ref_utils.generation_wrapper(64, 4, 2.0)
    _, our_bank = mask_bank.generation_wrapper(64, 4, 2.0, rng=5)

    assert ref_bank.shape == our_bank.shape == (4, 64)
    # ones-per-mask: both generators draw exactly active_features ones
    assert set(ref_bank.sum(1)) == set(our_bank.sum(1))
    ours = mask_bank.bank_stats(our_bank)
    refs = mask_bank.bank_stats(ref_bank.astype(np.float32))
    assert ours["coverage"] == refs["coverage"] == 1.0
    # overlap statistics within sampling noise of each other
    assert abs(ours["mean_pair_overlap"] - refs["mean_pair_overlap"]) < 8.0


def test_masksembles2d_channel_masks_match_reference(key):
    """4D (NHWC here, NCHW there) channel masking: with the reference's own
    bank our layer reproduces torch ``Masksembles2D`` train/eval outputs
    exactly (utils.py:112-170 — channel mask broadcast over H×W)."""
    from bayestpu.nn.bayes import MASKS_COLLECTION, Masksembles

    ref_utils = _import_ref_utils()
    np.random.seed(13)
    tm = ref_utils.Masksembles2D(16, 4, 2.0)
    bank = tm.masks.detach().numpy().reshape(4, 16)   # (4, C)

    layer = Masksembles(num_masks=4, scale=2.0)
    x = np.random.default_rng(3).random((8, 5, 5, 16)).astype(np.float32)
    x_t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))  # NCHW for torch
    variables = layer.init(key, jnp.asarray(x))
    variables = {**variables, MASKS_COLLECTION: {"bank": jnp.asarray(bank)}}

    ours_tr = np.asarray(layer.apply(variables, jnp.asarray(x), train=True))
    tm.train()
    ref_tr = tm(x_t).detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours_tr, ref_tr, rtol=1e-6)

    tm.eval()
    for i in range(4):
        ref_ev = tm(x_t).detach().numpy().transpose(0, 2, 3, 1)
        ours_ev = np.asarray(layer.apply(
            variables, jnp.asarray(x), sample_idx=i, train=False))
        np.testing.assert_allclose(ours_ev, ref_ev, rtol=1e-6)

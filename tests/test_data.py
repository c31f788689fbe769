"""Data pipeline: synthetic fallback shapes, batching, normalization, split."""

import numpy as np
import pytest

from bayestpu.data import datasets


@pytest.mark.parametrize("name,shape,classes", [
    ("mnist", (28, 28, 1), 10),
    ("cifar10", (32, 32, 3), 10),
    ("cifar100", (32, 32, 3), 100),
    ("svhn", (32, 32, 3), 10),
])
def test_shapes_and_ranges(name, shape, classes):
    ds = datasets.get_dataset(name, data_dir="/nonexistent",
                              n_synth_train=200, n_synth_test=50)
    assert ds.x_train.shape == (200,) + shape
    assert ds.x_train.dtype == np.float32
    assert ds.x_train.min() >= 0.0 and ds.x_train.max() <= 1.0
    assert ds.y_train.max() < classes
    assert ds.meta["num_classes"] == classes


def test_synthetic_is_learnable_signal():
    # class-conditional means must differ (so training can make progress)
    ds = datasets.get_dataset("mnist", data_dir="/nonexistent",
                              n_synth_train=2000, n_synth_test=100)
    m0 = ds.x_train[ds.y_train == 0].mean(0)
    m1 = ds.x_train[ds.y_train == 1].mean(0)
    assert np.abs(m0 - m1).mean() > 0.05


def test_normalize_applies_stats():
    ds = datasets.get_dataset("cifar10", data_dir="/nonexistent",
                              normalize=True, n_synth_train=500,
                              n_synth_test=50)
    assert abs(ds.x_train.mean()) < 1.5  # roughly standardized


def test_train_val_split_disjoint():
    ds = datasets.get_dataset("mnist", data_dir="/nonexistent",
                              n_synth_train=1000, n_synth_test=100)
    tr, xv, yv = datasets.train_val_split(ds, 0.2, seed=0)
    assert tr.x_train.shape[0] == 800 and xv.shape[0] == 200
    assert len(yv) == 200


def test_iterate_batches_static_shapes():
    x = np.zeros((103, 4), np.float32)
    y = np.zeros((103,), np.int32)
    batches = list(datasets.iterate_batches(x, y, 32, seed=1))
    assert len(batches) == 3
    assert all(b[0].shape == (32, 4) for b in batches)


def test_iterate_batches_shuffles_deterministically():
    x = np.arange(64, dtype=np.float32).reshape(64, 1)
    y = np.arange(64, dtype=np.int32)
    a = [b[1] for b in datasets.iterate_batches(x, y, 16, seed=5)]
    b = [b[1] for b in datasets.iterate_batches(x, y, 16, seed=5)]
    np.testing.assert_array_equal(np.concatenate(a), np.concatenate(b))
    c = [b[1] for b in datasets.iterate_batches(x, y, 16, seed=6)]
    assert not np.array_equal(np.concatenate(a), np.concatenate(c))


@pytest.mark.slow  # heavy; full tier runs it (pytest -m "")
def test_imagenet_chestx_stubs():
    for name, (hw, classes) in (("imagenet", (224, 1000)),
                                ("chestx", (224, 2))):
        ds = datasets.get_dataset(name, data_dir="/nonexistent")
        assert ds.x_train.shape[1:] == (hw, hw, 3)
        assert ds.meta["num_classes"] == classes
        assert ds.x_train.shape[0] <= 512  # capped synth size
        assert ds.y_train.max() < classes


def test_prefetch_iterator_matches_plain_iteration():
    import numpy as np

    from bayestpu.data.pipeline import BatchPipeline, PrefetchIterator

    rng = np.random.default_rng(0)
    x = rng.normal(size=(64, 8, 8, 1)).astype(np.float32)
    y = rng.integers(0, 10, size=64).astype(np.int32)
    plain = list(BatchPipeline(x, y, 16, pad=0, train=True, seed=3))
    pre = list(PrefetchIterator(iter(
        BatchPipeline(x, y, 16, pad=0, train=True, seed=3))))
    assert len(plain) == len(pre) == 4
    for (xa, ya), (xb, yb) in zip(plain, pre):
        np.testing.assert_array_equal(xa, np.asarray(xb))
        np.testing.assert_array_equal(ya, np.asarray(yb))


def test_prefetch_iterator_propagates_errors():
    import pytest

    from bayestpu.data.pipeline import PrefetchIterator

    def bad():
        yield (1, 2)
        raise RuntimeError("boom")

    it = PrefetchIterator(bad())
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_raw_mnist_idx_loader(tmp_path):
    """Real-format raw files load with no code change (the only blocker for
    the paper configs in this offline environment is the files themselves)."""
    import struct

    from bayestpu.data.datasets import get_dataset

    rng = np.random.default_rng(0)

    def write_idx(path, arr):
        arr = np.ascontiguousarray(arr, np.uint8)
        with open(path, "wb") as f:
            f.write(struct.pack(">I", 0x00000800 | arr.ndim))
            f.write(struct.pack(f">{arr.ndim}I", *arr.shape))
            f.write(arr.tobytes())

    d = tmp_path / "mnist"
    d.mkdir()
    xtr = rng.integers(0, 256, (64, 28, 28), dtype=np.uint8)
    xte = rng.integers(0, 256, (16, 28, 28), dtype=np.uint8)
    write_idx(d / "train-images-idx3-ubyte", xtr)
    write_idx(d / "train-labels-idx1-ubyte",
              rng.integers(0, 10, 64, dtype=np.uint8))
    write_idx(d / "t10k-images-idx3-ubyte", xte)
    write_idx(d / "t10k-labels-idx1-ubyte",
              rng.integers(0, 10, 16, dtype=np.uint8))
    ds = get_dataset("mnist", data_dir=str(tmp_path))
    assert not ds.meta["synthetic"]
    assert ds.x_train.shape == (64, 28, 28, 1)
    np.testing.assert_allclose(ds.x_train[..., 0], xtr / 255.0, atol=1e-7)


def test_raw_cifar10_pickle_loader(tmp_path):
    import pickle

    from bayestpu.data.datasets import get_dataset

    rng = np.random.default_rng(1)
    root = tmp_path / "cifar-10-batches-py"
    root.mkdir()
    for i in range(1, 6):
        batch = {b"data": rng.integers(0, 256, (20, 3072), dtype=np.uint8),
                 b"labels": list(rng.integers(0, 10, 20))}
        with open(root / f"data_batch_{i}", "wb") as f:
            pickle.dump(batch, f)
    with open(root / "test_batch", "wb") as f:
        pickle.dump({b"data": rng.integers(0, 256, (10, 3072), dtype=np.uint8),
                     b"labels": list(rng.integers(0, 10, 10))}, f)
    ds = get_dataset("cifar10", data_dir=str(tmp_path))
    assert not ds.meta["synthetic"]
    assert ds.x_train.shape == (100, 32, 32, 3)
    assert ds.x_test.shape == (10, 32, 32, 3)


def test_raw_svhn_mat_loader(tmp_path):
    pytest.importorskip("scipy")
    from scipy.io import savemat

    from bayestpu.data.datasets import get_dataset

    rng = np.random.default_rng(2)
    x = rng.integers(0, 256, (32, 32, 3, 24), dtype=np.uint8)
    y = rng.integers(1, 11, (24, 1)).astype(np.uint8)  # SVHN labels 1..10
    savemat(tmp_path / "train_32x32.mat", {"X": x, "y": y})
    savemat(tmp_path / "test_32x32.mat", {"X": x[..., :8], "y": y[:8]})
    ds = get_dataset("svhn", data_dir=str(tmp_path))
    assert not ds.meta["synthetic"]
    assert ds.x_train.shape == (24, 32, 32, 3)
    assert ds.y_train.max() <= 9  # label '10' wraps to 0

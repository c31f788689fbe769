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

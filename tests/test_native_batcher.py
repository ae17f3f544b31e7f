"""Native C++ batcher: build, parity with the numpy path, augmentation."""

import numpy as np
import pytest

from joint_vae_tpu.data.loaders import ArrayDataset, DataLoader
from joint_vae_tpu.data.native import available, NativeBatcher

pytestmark = pytest.mark.skipif(not available(),
                                reason='no C++ toolchain for native batcher')

RNG = np.random.default_rng(0)


def _ds(n=100):
    x = RNG.uniform(0, 1, (n, 3, 8, 8)).astype(np.float32)
    y = RNG.integers(0, 5, n).astype(np.int32)
    return ArrayDataset(x, y, 'd')


def test_unshuffled_matches_numpy_path():
    ds = _ds(64)
    nb = NativeBatcher(ds.data, ds.targets)
    nb.start_epoch(0, shuffle=False)
    x, y = nb.get_batch(0, 32)
    np.testing.assert_array_equal(x, ds.data[:32])
    np.testing.assert_array_equal(y, ds.targets[:32])
    x2, _ = nb.get_batch(1, 32)
    np.testing.assert_array_equal(x2, ds.data[32:64])


def test_tail_batch_and_range():
    ds = _ds(70)
    nb = NativeBatcher(ds.data, ds.targets)
    nb.start_epoch(0, shuffle=False)
    x, y = nb.get_batch(2, 32)
    assert x.shape[0] == 6 and y.shape[0] == 6
    with pytest.raises(IndexError):
        nb.get_batch(3, 32)


def test_shuffle_deterministic_and_complete():
    ds = _ds(64)
    a = NativeBatcher(ds.data, ds.targets, seed=7)
    b = NativeBatcher(ds.data, ds.targets, seed=7)
    a.start_epoch(1)
    b.start_epoch(1)
    xa, ya = a.get_batch(0, 64)
    xb, yb = b.get_batch(0, 64)
    np.testing.assert_array_equal(xa, xb)
    # permutation covers the dataset
    assert not np.array_equal(xa, ds.data)
    np.testing.assert_allclose(np.sort(xa.sum((1, 2, 3))),
                               np.sort(ds.data.sum((1, 2, 3))), rtol=1e-5)
    # different epoch differs
    a.start_epoch(2)
    xc, _ = a.get_batch(0, 64)
    assert not np.array_equal(xa, xc)


def test_augmentations_shapes_and_values():
    ds = _ds(32)
    nb = NativeBatcher(ds.data, ds.targets, hflip=True, crop_pad=2)
    nb.start_epoch(0, shuffle=False)
    x, _ = nb.get_batch(0, 32)
    assert x.shape == (32, 3, 8, 8)
    assert 0 <= x.min() and x.max() <= 1
    # some samples should be changed vs originals (flip or shift)
    assert (np.abs(x - ds.data) > 1e-6).any()
    # pure flip preserves row sums
    nbf = NativeBatcher(ds.data, ds.targets, hflip=True, crop_pad=0)
    nbf.start_epoch(0, shuffle=False)
    xf, _ = nbf.get_batch(0, 32)
    np.testing.assert_allclose(xf.sum(-1), ds.data.sum(-1), rtol=1e-5)


def test_dataloader_uses_native():
    ds = _ds(96)
    dl = DataLoader(ds, 32, seed=3, data_augmentation=['flip'])
    assert dl._native is not None
    batches = list(dl)
    assert len(batches) == 3
    for x, y in batches:
        assert x.shape == (32, 3, 8, 8)
    # deterministic per (seed, epoch)
    dl2 = DataLoader(ds, 32, seed=3, data_augmentation=['flip'])
    for (x1, _), (x2, _) in zip(DataLoader(ds, 32, seed=3), DataLoader(ds, 32, seed=3)):
        np.testing.assert_array_equal(x1, x2)

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


def test_uint8_source_parity():
    """uint8 storage assembles the same floats as the float path."""
    n = 48
    u = RNG.integers(0, 256, (n, 3, 8, 8)).astype(np.uint8)
    f = u.astype(np.float32) / 255.0
    y = RNG.integers(0, 5, n).astype(np.int32)
    a = NativeBatcher(u, y, seed=5, hflip=True, crop_pad=1)
    b = NativeBatcher(f, y, seed=5, hflip=True, crop_pad=1)
    a.start_epoch(3)
    b.start_epoch(3)
    xa, ya = a.get_batch(0, n)
    xb, yb = b.get_batch(0, n)
    np.testing.assert_allclose(xa, xb, rtol=0, atol=1e-6)
    np.testing.assert_array_equal(ya, yb)


def test_fused_normalize():
    n = 16
    f = RNG.uniform(0, 1, (n, 3, 8, 8)).astype(np.float32)
    y = np.zeros(n, np.int32)
    mean = np.array([0.5, 0.4, 0.3], np.float32)
    std = np.array([0.2, 0.25, 0.3], np.float32)
    nb = NativeBatcher(f, y, mean=mean, std=std)
    nb.start_epoch(0, shuffle=False)
    x, _ = nb.get_batch(0, n)
    want = (f - mean[None, :, None, None]) / std[None, :, None, None]
    np.testing.assert_allclose(x, want, rtol=1e-5, atol=1e-6)


def test_bilinear_resize_matches_numpy():
    """Fused bilinear resize vs a numpy corner-aligned reference."""
    n, h, w, oh, ow = 4, 8, 6, 16, 12
    f = RNG.uniform(0, 1, (n, 3, h, w)).astype(np.float32)
    y = np.zeros(n, np.int32)
    nb = NativeBatcher(f, y, out_shape=(oh, ow))
    nb.start_epoch(0, shuffle=False)
    x, _ = nb.get_batch(0, n)
    assert x.shape == (n, 3, oh, ow)

    gy = np.arange(oh) * (h - 1) / (oh - 1)
    gx = np.arange(ow) * (w - 1) / (ow - 1)
    y0 = np.floor(gy).astype(int); x0 = np.floor(gx).astype(int)
    y1 = np.minimum(y0 + 1, h - 1); x1 = np.minimum(x0 + 1, w - 1)
    ay = (gy - y0)[None, None, :, None]
    ax = (gx - x0)[None, None, None, :]
    v00 = f[:, :, y0][:, :, :, x0]
    v01 = f[:, :, y0][:, :, :, x1]
    v10 = f[:, :, y1][:, :, :, x0]
    v11 = f[:, :, y1][:, :, :, x1]
    want = ((1 - ay) * ((1 - ax) * v00 + ax * v01)
            + ay * ((1 - ax) * v10 + ax * v11))
    np.testing.assert_allclose(x, want, rtol=1e-5, atol=1e-6)

    # resize preserves corners
    np.testing.assert_allclose(x[..., 0, 0], f[..., 0, 0], rtol=1e-6)
    np.testing.assert_allclose(x[..., -1, -1], f[..., -1, -1], rtol=1e-6)

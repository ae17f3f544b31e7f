"""ImageFolder ingest cache (data/ingest.py): uint8 memmap, cache hits,
mtime invalidation, and the lazy float conversion at the loader boundary
(VERDICT r3 item 2)."""

import os

import numpy as np
import pytest

PIL = pytest.importorskip('PIL')
from PIL import Image

from joint_vae_tpu.data import ingest
from joint_vae_tpu.data.ingest import ingest_image_folder
from joint_vae_tpu.data.loaders import (ArrayDataset, DataLoader, get_batch,
                                        to_float)

SHAPE = (3, 8, 8)


def _make_tree(root, n_per_class=6, classes=('cat', 'dog'), seed=0):
    rng = np.random.default_rng(seed)
    for c in classes:
        d = os.path.join(root, c)
        os.makedirs(d, exist_ok=True)
        for i in range(n_per_class):
            arr = rng.integers(0, 256, (10, 10, 3), dtype=np.uint8)
            Image.fromarray(arr).save(os.path.join(d, 'im{:03d}.png'.format(i)))
    return root


def test_ingest_builds_uint8_memmap_matching_direct_decode(tmp_path):
    base = _make_tree(str(tmp_path / 'tree'))
    x, y, classes = ingest_image_folder(base, SHAPE)
    assert isinstance(x, np.memmap) and x.dtype == np.uint8
    assert x.shape == (12,) + SHAPE
    assert classes == ['cat', 'dog']
    np.testing.assert_array_equal(y, [0] * 6 + [1] * 6)
    # bytes match the in-process PIL decode
    direct = ingest._decode_one(
        os.path.join(base, 'cat', 'im000.png'), SHAPE)
    np.testing.assert_array_equal(np.asarray(x[0]), direct)


def test_cache_hit_skips_decode_and_mtime_invalidates(tmp_path, monkeypatch):
    base = _make_tree(str(tmp_path / 'tree'))
    ingest_image_folder(base, SHAPE)

    def boom(path, shape):
        raise AssertionError('decode ran on a cache hit')

    monkeypatch.setattr(ingest, '_decode_one', boom)
    x, y, _ = ingest_image_folder(base, SHAPE)      # hit: no decode
    assert x.shape[0] == 12

    monkeypatch.undo()
    # touching one file changes its mtime_ns -> new key -> re-decode
    p = os.path.join(base, 'cat', 'im000.png')
    st = os.stat(p)
    os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    called = {}
    real = ingest._decode_one

    def spy(path, shape):
        called['yes'] = True
        return real(path, shape)

    monkeypatch.setattr(ingest, '_decode_one', spy)
    ingest_image_folder(base, SHAPE)
    assert called.get('yes')


def test_uint8_dataset_yields_float_batches(tmp_path):
    base = _make_tree(str(tmp_path / 'tree'))
    x, y, classes = ingest_image_folder(base, SHAPE)
    ds = ArrayDataset(x, y, 'tree', classes)
    assert ds.data.dtype == np.uint8          # stored without a float copy
    xb, yb = next(iter(DataLoader(ds, 4, shuffle=False)))
    assert xb.dtype == np.float32
    assert 0.0 <= xb.min() and xb.max() <= 1.0
    np.testing.assert_allclose(xb[0], np.asarray(x[0], np.float32) / 255.0)
    x1, _ = ds[1]
    np.testing.assert_allclose(x1, np.asarray(x[1], np.float32) / 255.0)
    gb, _ = get_batch(ds, 4, seed=0)
    assert gb.dtype == np.float32 and gb.max() <= 1.0


def test_device_dataset_keeps_uint8_storage(tmp_path):
    import jax.numpy as jnp
    from joint_vae_tpu.train.device_data import DeviceDataset
    base = _make_tree(str(tmp_path / 'tree'))
    x, y, _ = ingest_image_folder(base, SHAPE)
    dd = DeviceDataset(ArrayDataset(x, y, 'tree'))
    assert dd.x.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(dd.x), np.asarray(x))


def test_mixture_harmonizes_uint8_and_float(tmp_path):
    from joint_vae_tpu.ft.datasets import MixtureDataset
    base = _make_tree(str(tmp_path / 'tree'))
    x, y, _ = ingest_image_folder(base, SHAPE)
    u8 = ArrayDataset(x, y, 'tree')
    f32 = ArrayDataset(np.full((12,) + SHAPE, 0.5, np.float32),
                       np.zeros(12, np.int32), 'half')
    mix = MixtureDataset(seed=3, a=u8, b=f32)
    assert mix.data.dtype == np.float32
    assert float(mix.data.max()) <= 1.0       # u8 part was rescaled


def test_load_image_folder_uses_cache(tmp_path):
    from joint_vae_tpu.data.loaders import _load_image_folder
    base = _make_tree(str(tmp_path / 'tree'))
    got = _load_image_folder(str(tmp_path / 'tree'), SHAPE, 'train')
    assert got is not None
    x, y = got
    assert x.dtype == np.uint8
    assert os.path.isdir(os.path.join(base, '.jvt_cache'))
    # env escape hatch: direct decode, still uint8, same bytes
    os.environ['JVT_INGEST_CACHE'] = '0'
    try:
        x2, y2 = _load_image_folder(str(tmp_path / 'tree'), SHAPE, 'train')
    finally:
        del os.environ['JVT_INGEST_CACHE']
    np.testing.assert_array_equal(np.asarray(x), x2)
    np.testing.assert_array_equal(y, y2)


def test_parallel_pool_ingest_matches_serial(tmp_path):
    """Force the subprocess-worker path (workers=2, chunk smaller than the
    file count) and compare against the serial decode.  (A fork-based
    multiprocessing pool here deadlocked the forked child on inherited
    locks of the jax-threaded parent — ingest uses plain `python -S`
    subprocess workers instead, which also never import jax.)"""
    base = _make_tree(str(tmp_path / 'tree'), n_per_class=10)
    xs, ys, _ = ingest_image_folder(base, SHAPE, workers=2, chunk=4)
    base2 = _make_tree(str(tmp_path / 'tree2'), n_per_class=10)
    xr, yr, _ = ingest_image_folder(base2, SHAPE, workers=1, chunk=1000)
    np.testing.assert_array_equal(np.asarray(xs), np.asarray(xr))
    np.testing.assert_array_equal(ys, yr)


def test_silent_worker_death_poisons_ingest(tmp_path, monkeypatch):
    """ADVICE r4 (medium): a decode worker killed WITHOUT any stdout
    (OOM-kill, segfault) must fail the ingest — not present a COMPLETE
    cache whose slice is all zeros."""
    import subprocess

    base = _make_tree(str(tmp_path / 'tree'), n_per_class=10)

    class DeadPopen:
        returncode = -9                       # SIGKILL, no output

        def __init__(self, *a, **kw):
            pass

        def communicate(self, timeout=None):
            return '', None

    monkeypatch.setattr(subprocess, 'Popen', DeadPopen)
    with pytest.raises(RuntimeError, match='decode worker exited -9'):
        ingest_image_folder(base, SHAPE, workers=2, chunk=4)
    cdir = os.path.join(base, '.jvt_cache')
    left = os.listdir(cdir) if os.path.isdir(cdir) else []
    assert not any(f.endswith(('.u8', '.json')) for f in left), left
    # and a later honest ingest still works
    x, y, _ = ingest_image_folder(base, SHAPE, workers=1, chunk=1000)
    assert len(x) == 20 and (np.asarray(x).sum() > 0)


def test_split_tree_never_falls_back_to_root(tmp_path):
    """A split-structured tree (only test/ here) requested for another
    split must return None — falling back to the root would read the
    split directories themselves as class folders (bogus 1-class data)."""
    from joint_vae_tpu.data.loaders import _load_image_folder
    root = str(tmp_path / 'tree')
    _make_tree(os.path.join(root, 'test'), n_per_class=2)
    assert _load_image_folder(root, SHAPE, 'train') is None
    got = _load_image_folder(root, SHAPE, 'test')
    assert got is not None and len(got[0]) == 4

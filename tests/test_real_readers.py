"""Real-data readers on tiny fixture files in each supported on-disk format
(ref utils/torch_load.py:150-309: SVHN .mat, FromNumpy .npy, DTD test+val
concat, LSUN folders), plus the require_real no-silent-fallback mode."""

import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import joint_vae_tpu.data.loaders as loaders


@pytest.fixture()
def data_dir(tmp_path, monkeypatch):
    from scripts.prepare_data import cmd_make_fixtures

    class A:
        pass
    a = A()
    a.data_dir = str(tmp_path)
    cmd_make_fixtures(a)
    monkeypatch.setattr(loaders, 'DATA_DIR', str(tmp_path))
    loaders._cache.clear()
    yield str(tmp_path)
    loaders._cache.clear()


def test_svhn_mat_reader(data_dir):
    tr, ts = loaders.get_dataset('svhn', require_real=True)
    assert not ts.synthetic
    assert tr.shape == (3, 32, 32) and len(tr) == 12 and len(ts) == 8
    assert tr.data.min() >= 0 and tr.data.max() <= 1
    assert set(np.unique(ts.targets)) <= set(range(10))  # 10 -> 0 remap


def test_random300k_npy_reader(data_dir):
    _, ts = loaders.get_dataset('random300k', splits=['test'],
                                require_real=True)
    assert not ts.synthetic
    assert ts.shape == (3, 32, 32) and len(ts) == 16
    assert (ts.targets == 0).all()
    # size truncation happens before the float conversion
    loaders._cache.clear()
    _, small = loaders.get_dataset('random300k', splits=['test'], size=4)
    assert len(small) == 4


def test_dtd_reader_concats_test_and_val(data_dir):
    _, ts = loaders.get_dataset('dtd', splits=['test'], require_real=True)
    assert not ts.synthetic
    # fixtures: 2 classes x 1 file in each of test1/val1
    assert len(ts) == 4
    assert ts.shape == (3, 32, 32)
    assert set(np.unique(ts.targets)) == {0, 1}
    tr, _ = loaders.get_dataset('dtd', splits=['train'], require_real=True)
    assert len(tr) == 2


def test_lsun_folder_readers(data_dir):
    for name in ('lsunc', 'lsunr'):
        loaders._cache.clear()
        tr, ts = loaders.get_dataset(name, require_real=True)
        assert not ts.synthetic, name
        assert ts.shape == (3, 32, 32), name
        assert len(ts) == 4 and len(tr) == 4     # 2 cats x 2 imgs
        assert set(np.unique(ts.targets)) == {0, 1}


def test_require_real_raises_on_missing(tmp_path, monkeypatch):
    monkeypatch.setattr(loaders, 'DATA_DIR', str(tmp_path / 'empty'))
    loaders._cache.clear()
    with pytest.raises(FileNotFoundError):
        loaders.get_dataset('svhn', require_real=True)
    # env-driven form
    monkeypatch.setenv('JVT_REQUIRE_REAL', '1')
    loaders._cache.clear()
    with pytest.raises(FileNotFoundError):
        loaders.get_dataset('cifar10')
    # and the soft default still falls back
    monkeypatch.setenv('JVT_REQUIRE_REAL', '0')
    loaders._cache.clear()
    _, ts = loaders.get_dataset('cifar10')
    assert ts.synthetic
    loaders._cache.clear()

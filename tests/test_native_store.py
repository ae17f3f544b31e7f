"""Native .jvr recorder store: format roundtrip, writer parity, integrity.

Covers save_load/native_store.py + native/recstore.cpp — the persistence
tier of the reference's LossRecorder (ref utils/save_load/recorders.py),
re-designed as an mmap-able checksummed container.
"""

import os

import numpy as np
import pytest

from joint_vae_tpu.save_load import native_store as ns
from joint_vae_tpu.save_load.recorders import (LossRecorder, find_record,
                                               record_filename)


@pytest.fixture
def tensors():
    rng = np.random.default_rng(0)
    return {'iws': rng.normal(size=(5, 3, 40)).astype(np.float32),
            'y_true': rng.integers(0, 10, 40).astype(np.int64),
            'logits': rng.normal(size=(10, 40)).astype(np.float32)}


def test_roundtrip(tmp_path, tensors):
    p = str(tmp_path / 'record-x.jvr')
    ns.write_jvr(p, tensors, batch_size=16, recorded_batches=3,
                 last_batch_size=8, seed=42)
    meta, arrs = ns.read_jvr(p)
    assert meta['batch_size'] == 16
    assert meta['recorded_batches'] == 3
    assert meta['last_batch_size'] == 8
    assert meta['seed'] == 42
    for k in tensors:
        np.testing.assert_array_equal(arrs[k], tensors[k])


def test_python_writer_byte_identical(tmp_path, tensors):
    """The pure-python fallback must emit the same bytes as the C writer
    (same header, alignment, crc), so the two can interoperate."""
    if ns.get_lib() is None:
        pytest.skip('native recstore not built')
    pa = str(tmp_path / 'record-a.jvr')
    pb = str(tmp_path / 'record-b.jvr')
    ns.write_jvr(pa, tensors, 16, 3, 8, 42)
    lib, ns._lib, ns._lib_failed = ns._lib, None, True
    try:
        ns.write_jvr(pb, tensors, 16, 3, 8, 42)
    finally:
        ns._lib, ns._lib_failed = lib, False
    with open(pa, 'rb') as fa, open(pb, 'rb') as fb:
        assert fa.read() == fb.read()


def test_peek_matches_header(tmp_path, tensors):
    p = str(tmp_path / 'record-x.jvr')
    ns.write_jvr(p, tensors, 16, 3, 8, seed=None)
    meta = ns.peek_jvr(p)
    assert set(meta['components']) == set(tensors)
    assert meta['seed'] is None
    assert meta['recorded_batches'] == 3


def test_verify_detects_corruption(tmp_path, tensors):
    p = str(tmp_path / 'record-x.jvr')
    ns.write_jvr(p, tensors, 16, 3, 8)
    assert ns.verify_jvr(p)
    raw = bytearray(open(p, 'rb').read())
    raw[-3] ^= 0xFF
    bad = str(tmp_path / 'record-bad.jvr')
    with open(bad, 'wb') as f:
        f.write(bytes(raw))
    assert not ns.verify_jvr(bad)


def test_empty_and_zero_dim(tmp_path):
    p = str(tmp_path / 'record-e.jvr')
    ns.write_jvr(p, {}, 8, 0, 8)
    meta, arrs = ns.read_jvr(p)
    assert arrs == {} and meta['recorded_batches'] == 0
    p2 = str(tmp_path / 'record-z.jvr')
    ns.write_jvr(p2, {'a': np.zeros((3, 0))}, 8, 0, 8)
    _, arrs = ns.read_jvr(p2)
    assert arrs['a'].shape == (3, 0)


def test_recorder_jvr_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    rec = LossRecorder(16)
    for i in range(5):
        n = 16 if i < 4 else 7
        rec.append_batch(total=rng.normal(size=(3, n)),
                         y_true=rng.integers(0, 10, n))
    rec.init_seed_for_dataloader(7)
    p = str(tmp_path / record_filename('svhn'))
    assert p.endswith('.jvr')
    rec.save(p)
    r2 = LossRecorder.load(p)
    assert r2.recorded_samples == rec.recorded_samples == 71
    np.testing.assert_array_equal(r2.get('total'), rec.get('total'))
    assert r2.restore_seed() == 7
    peek = LossRecorder.peek(p)
    assert peek['recorded_samples'] == 71 and peek['seed'] == 7


def test_append_after_load_does_not_touch_mmap(tmp_path):
    """Loaded .jvr tensors are read-only mmap views; appending must grow
    into fresh buffers, never write through the map."""
    rec = LossRecorder(8)
    rec.append_batch(total=np.ones((2, 8)))
    p = str(tmp_path / 'record-s.jvr')
    rec.save(p)
    r2 = LossRecorder.load(p)
    r2.append_batch(total=2 * np.ones((2, 8)))
    assert r2.recorded_samples == 16
    _, arrs = ns.read_jvr(p)
    np.testing.assert_array_equal(arrs['total'], np.ones((2, 8)))


def test_find_record_prefers_newest(tmp_path):
    rec = LossRecorder(4)
    rec.append_batch(total=np.ones((4,)))
    old = str(tmp_path / 'record-s.npz')
    new = str(tmp_path / 'record-s.jvr')
    rec.save(old)
    rec.save(new)
    os.utime(old, (1, 1))
    assert find_record(str(tmp_path), 's') == new
    assert find_record(str(tmp_path), 'missing') is None
    # loadall resolves the duplicate to one (newest) entry
    out = LossRecorder.loadall(str(tmp_path), output='paths')
    assert out == {'s': new}


def test_record_filename_format_env(tmp_path, monkeypatch):
    assert record_filename('x') == 'record-x.jvr'
    monkeypatch.setenv('JVT_RECORDER_FORMAT', 'npz')
    assert record_filename('x') == 'record-x.npz'
    assert record_filename('x', fmt='jvr') == 'record-x.jvr'


def test_npz_recorder_still_loads(tmp_path):
    """Round-1 job dirs persist as npz; both formats stay loadable."""
    rec = LossRecorder(8)
    rec.append_batch(total=np.arange(8, dtype=np.float32))
    p = str(tmp_path / 'record-s.npz')
    rec.save(p)
    r2 = LossRecorder.load(p)
    np.testing.assert_array_equal(r2.get('total'),
                                  np.arange(8, dtype=np.float32))

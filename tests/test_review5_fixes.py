"""Regressions for the fifth code-review batch (data/results/save_load/native).

Covers: native-loader batch ownership, registry classes_from_file
propagation, purge scope, planner misclass-json tier + metadata-only
recorder probing, stale-lock clock reset, atomic recorder save + file
pattern anchoring, accuracy column grouping, and downward OOM probing.
"""

import os
import re
import time

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from joint_vae_tpu.data.loaders import ArrayDataset, DataLoader
from joint_vae_tpu.data.registry import dataset_properties
from joint_vae_tpu.save_load.recorders import LossRecorder
from joint_vae_tpu.save_load.fetch import _Lock
from joint_vae_tpu.utils.device import compute_max_batch_size


# -- native loader yields owned arrays ----------------------------------


def test_native_loader_batches_are_owned():
    from joint_vae_tpu.data.native import available
    if not available():
        pytest.skip('native batcher unavailable')
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (96, 3, 8, 8)).astype(np.float32)
    y = np.arange(96, dtype=np.int32)
    ds = ArrayDataset(x, y, 'd')
    dl = DataLoader(ds, 16, shuffle=False, data_augmentation=['flip'],
                    seed=1)
    assert dl._native is not None
    retained = list(dl)  # consumer keeps every batch for the whole epoch
    assert len(retained) == 6
    # every retained y must still hold its own batch's labels, not the last
    # buffer rotation's
    for i, (_, yb) in enumerate(retained):
        np.testing.assert_array_equal(yb, y[i * 16:(i + 1) * 16])
    # x batches must be pairwise distinct arrays (no shared buffers)
    bufs = {id(b[0].base if b[0].base is not None else b[0])
            for b in retained}
    assert len(bufs) == 6


# -- registry: classes_from_file reaches the folder loader ---------------


def test_classes_from_file_kept_and_resolved():
    props = dataset_properties(reload=True)
    cf = props['imagenet20'].get('classes_from_file')
    assert cf, 'classes_from_file must survive registry normalization'
    assert os.path.isabs(cf) and os.path.exists(cf)
    # the classes themselves were read from it
    assert props['imagenet20']['labels'] == 20


# -- purge_deleted never touches derailed jobs ---------------------------


def test_purge_spares_derailed(tmp_path):
    from joint_vae_tpu.utils.maintenance import purge_deleted
    for name, sentinel in (('a', 'deleted'), ('b', 'derailed'), ('c', None)):
        d = tmp_path / name
        d.mkdir()
        (d / 'params.json').write_text('{}')
        if sentinel:
            (d / sentinel).write_text('')
    gone = purge_deleted(str(tmp_path))
    assert [os.path.basename(g) for g in gone] == ['a']
    assert not (tmp_path / 'a').exists()
    assert (tmp_path / 'b').exists() and (tmp_path / 'c').exists()


# -- recorders: atomic save, anchored pattern, metadata peek -------------


def test_recorder_save_atomic_and_pattern(tmp_path):
    r = LossRecorder(8)
    r.append_batch(total=np.arange(8, dtype=np.float32))
    p = str(tmp_path / 'record-cifar10.npz')
    r.save(p)
    assert os.path.exists(p)
    assert not any(f.endswith('.tmp.npz') for f in os.listdir(tmp_path))
    # stray sibling files must not shadow/crash loadall
    (tmp_path / 'record-cifar10.npz.bak').write_text('junk')
    got = LossRecorder.loadall(str(tmp_path))
    assert set(got) == {'cifar10'}
    assert got['cifar10'].recorded_samples == 8
    assert LossRecorder.FILE_PATTERN.match('record-x.npz.bak') is None


def test_recorder_peek_matches_load(tmp_path):
    r = LossRecorder(8)
    r.append_batch(total=np.arange(8, dtype=np.float32),
                   kl=np.ones((3, 8), np.float32))
    r.append_batch(total=np.arange(5, dtype=np.float32),
                   kl=np.ones((3, 5), np.float32))
    r.init_seed_for_dataloader(42)
    p = str(tmp_path / 'record-s.npz')
    r.save(p)
    meta = LossRecorder.peek(p)
    full = LossRecorder.load(p)
    assert sorted(meta['components']) == sorted(full.keys())
    assert meta['recorded_samples'] == full.recorded_samples == 13
    assert meta['seed'] == 42


def test_planner_uses_peek_not_load(tmp_path, monkeypatch):
    """available_results must not materialize recorder arrays."""
    import joint_vae_tpu.save_load.dictify as dictify

    def boom(*a, **kw):
        raise AssertionError('planner must not LossRecorder.load')

    monkeypatch.setattr(dictify.LossRecorder, 'load', boom)
    # a job with one recorder on disk
    import jax
    from joint_vae_tpu.models.cvnet import CVNetConfig
    from joint_vae_tpu.ops.sigma import SigmaConfig
    from joint_vae_tpu.save_load.jobs import new_job, save_job
    cfg = CVNetConfig(input_shape=(1, 4, 4), num_labels=2, type='cvae',
                      encoder=(8,), decoder=(8,), classifier=(4,),
                      latent_dim=2, sigma=SigmaConfig(value=0.3))
    job = new_job(cfg, key=jax.random.PRNGKey(0))
    job.train_history = {'epochs': 1}
    job.training_parameters['set'] = 'blob'
    save_job(job, str(tmp_path))
    r = LossRecorder(8)
    r.append_batch(total=np.zeros((2, 8), np.float32),
                   kl=np.zeros((2, 8), np.float32),
                   iws=np.zeros((2, 8), np.float32),
                   zdist=np.zeros((2, 8), np.float32),
                   logits=np.zeros((2, 8), np.float32),
                   y_true=np.zeros(8, np.int32))
    sdir = os.path.join(str(tmp_path), 'samples', '0001')
    r.save(os.path.join(sdir, 'record-blob.npz'))
    avail = dictify.available_results(job, testset='blob', oodsets=[],
                                      wanted_epoch=1)
    assert avail[1]['blob']['recorders']['iws'] == 8


def test_planner_finds_nested_misclass_json(tmp_path):
    import jax
    from joint_vae_tpu.models.cvnet import CVNetConfig
    from joint_vae_tpu.ops.sigma import SigmaConfig
    from joint_vae_tpu.save_load.jobs import new_job, save_job
    from joint_vae_tpu.save_load.dictify import available_results
    cfg = CVNetConfig(input_shape=(1, 4, 4), num_labels=2, type='cvae',
                      encoder=(8,), decoder=(8,), classifier=(4,),
                      latent_dim=2, sigma=SigmaConfig(value=0.3))
    job = new_job(cfg, key=jax.random.PRNGKey(0))
    job.train_history = {'epochs': 1}
    job.training_parameters['set'] = 'blob'
    save_job(job, str(tmp_path))
    from joint_vae_tpu.save_load.dictify import (METHODS_PARAMS,
                                                 develop_starred_methods)
    mm = develop_starred_methods(cfg.misclass_methods, METHODS_PARAMS)[0]
    # engines store misclass rates nested under the predict method
    job.testing[1] = {'esty': {'n': 64, 'accuracy': 0.9,
                               mm: {'n': 64, 'auc': 0.8}}}
    avail = available_results(job, testset='blob', oodsets=[],
                              wanted_epoch=1)
    assert avail[1]['blob']['json'][mm] == 64


# -- stale-lock break restarts the staleness clock -----------------------


def test_lock_break_resets_timer(tmp_path):
    path = str(tmp_path / 'reg.json')
    stale = path + '.lock'
    with open(stale, 'w'):
        pass
    lk = _Lock(path, timeout=0.2)
    t0 = time.time()
    with lk:
        # must have waited through one full timeout before breaking, and
        # then acquired a fresh lock
        assert os.path.exists(stale)
    assert time.time() - t0 >= 0.2
    assert not os.path.exists(stale)


# -- results table column grouping ---------------------------------------


def test_accuracy_epoch_not_an_accuracy_metric():
    from joint_vae_tpu.results.tables import results_dataframe, agg_results
    models = [{'job': j, 'set': 'blob', 'arch_code': 'x',
               'accuracy': 0.9 + j / 100, 'accuracy_esty': 0.9,
               'accuracy_epoch': 30 + j} for j in range(2)]
    df = results_dataframe(models, index=['job', 'set'], ood=False)
    acc_cols = [c for c in df.columns if c[0] == 'accuracy']
    assert ('accuracy', 'best') in acc_cols
    assert ('accuracy', 'epoch') not in acc_cols
    assert ('train', 'acc_epoch') in df.columns
    agg = agg_results(df, group_by=['set'])
    # aggregated metric columns must not include epoch numbers
    bad = [c for c in agg.columns if 'epoch' in str(c)]
    assert not bad and len(agg.columns)


# -- OOM probing probes downward too -------------------------------------


def test_max_batch_probes_downward():
    def step(n):
        if n > 16:
            raise RuntimeError('RESOURCE_EXHAUSTED: oom')

    assert compute_max_batch_size(step, start=128, ceiling=1024) == 16

    def tiny(n):
        if n > 1:
            raise RuntimeError('RESOURCE_EXHAUSTED: oom')

    assert compute_max_batch_size(tiny, start=128) == 1

    def never(n):
        raise RuntimeError('RESOURCE_EXHAUSTED: oom')

    assert compute_max_batch_size(never, start=4) == 0

"""Per-method 3-tier reuse: methods covered by stored json or recorded
tensors must trigger ZERO model forwards (ref available_results,
dictify.py:215-382, consumed by cvae.py:1241-1330/1455-1620 + test.py).
"""

import os
import tempfile

import numpy as np
import pytest

import jax

import joint_vae_tpu.evals.engines as engines
from joint_vae_tpu.data.loaders import ArrayDataset
from joint_vae_tpu.models.cvnet import CVNetConfig
from joint_vae_tpu.ops.sigma import SigmaConfig
from joint_vae_tpu.save_load.jobs import new_job, save_job

INPUT_SHAPE = (1, 6, 6)
C = 3
METHODS = ['iws', 'elbo', 'elbo-2s', 'zdist']


def _dataset(name, n=96, seed=0, noise=False):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, C, n).astype(np.int32)
    if noise:
        x = rng.uniform(0, 1, size=(n, *INPUT_SHAPE)).astype(np.float32)
    else:
        base = np.linspace(0.2, 0.8, C)[y][:, None, None, None]
        x = np.clip(base + 0.05 * rng.standard_normal((n, *INPUT_SHAPE)), 0, 1)
    return ArrayDataset(x.astype(np.float32), y, name)


@pytest.fixture()
def populated_job(tmp_path):
    cfg = CVNetConfig(input_shape=INPUT_SHAPE, num_labels=C, type='cvae',
                      encoder=(16,), decoder=(16,), classifier=(8,),
                      latent_dim=4, latent_sampling=1, test_latent_sampling=3,
                      gamma=10.0, beta=1e-2, sigma=SigmaConfig(value=0.3))
    job = new_job(cfg, key=jax.random.PRNGKey(0))
    job.train_history = {'epochs': 1}
    job.training_parameters['set'] = 'testblob'
    save_job(job, str(tmp_path))
    ts = _dataset('testblob')
    ood = _dataset('noise', noise=True, seed=5)
    res = engines.ood_detection_rates(job, ts, [ood], batch_size=32,
                                      method=METHODS)
    acc = engines.accuracy(job, ts, batch_size=32)
    return job, ts, ood, res, acc


def _count_forwards(monkeypatch):
    calls = {'n': 0}
    real = engines.evaluate

    def counting(*a, **kw):
        calls['n'] += 1
        return real(*a, **kw)

    monkeypatch.setattr(engines, 'evaluate', counting)
    return calls


def test_ood_json_tier_zero_forwards(populated_job, monkeypatch):
    job, ts, ood, res, _ = populated_job
    calls = _count_forwards(monkeypatch)
    res2 = engines.ood_detection_rates(job, ts, [ood], batch_size=32,
                                       method=METHODS)
    assert calls['n'] == 0
    for m in METHODS:
        np.testing.assert_allclose(res2['noise'][m]['auc'],
                                   res['noise'][m]['auc'], rtol=1e-6)


def test_ood_recorder_tier_zero_forwards(populated_job, monkeypatch):
    job, ts, ood, res, _ = populated_job
    # json covers all but 'elbo'; its components are in the recorders
    job.ood_results[1]['noise'].pop('elbo')
    calls = _count_forwards(monkeypatch)
    res2 = engines.ood_detection_rates(job, ts, [ood], batch_size=32,
                                       method=METHODS)
    assert calls['n'] == 0
    np.testing.assert_allclose(res2['noise']['elbo']['auc'],
                               res['noise']['elbo']['auc'], rtol=1e-5)
    # and the fresh entry was written back
    assert job.ood_results[1]['noise']['elbo']['n'] == len(ts)


def test_ood_compute_tier_only_for_residue(populated_job, monkeypatch):
    job, ts, ood, _, _ = populated_job
    calls = _count_forwards(monkeypatch)
    # an odin method was never recorded -> needs real forwards
    res = engines.ood_detection_rates(job, ts, [ood], batch_size=32,
                                      method=METHODS + ['odin-1-0.0000'])
    assert calls['n'] > 0
    assert 'odin-1-0.0000' in res['noise']


def test_ood_no_compute_tier_skips_residue(populated_job, monkeypatch):
    job, ts, ood, _, _ = populated_job
    calls = _count_forwards(monkeypatch)
    res = engines.ood_detection_rates(job, ts, [ood], batch_size=32,
                                      method=METHODS + ['odin-1-0.0000'],
                                      from_where=('json', 'recorders'))
    assert calls['n'] == 0
    assert 'odin-1-0.0000' not in res.get('noise', {})
    assert 'iws' in res['noise']


def test_accuracy_json_then_recorder_tier(populated_job, monkeypatch):
    job, ts, _, _, acc = populated_job
    calls = _count_forwards(monkeypatch)
    acc2 = engines.accuracy(job, ts, batch_size=32)
    assert calls['n'] == 0 and acc2 == {m: acc[m] for m in acc2}
    # drop the json: replay from the recorder, still zero forwards
    job.testing[1] = {}
    acc3 = engines.accuracy(job, ts, batch_size=32)
    assert calls['n'] == 0
    for m in ('iws', 'closest', 'esty'):
        np.testing.assert_allclose(acc3[m], acc[m], rtol=1e-6)
    # replay wrote the results back
    assert job.testing[1]['iws']['n'] == len(ts)


def test_misclass_no_compute_without_recorder(tmp_path, monkeypatch):
    cfg = CVNetConfig(input_shape=INPUT_SHAPE, num_labels=C, type='cvae',
                      encoder=(16,), decoder=(16,), classifier=(8,),
                      latent_dim=4, latent_sampling=1,
                      gamma=10.0, beta=1e-2, sigma=SigmaConfig(value=0.3))
    job = new_job(cfg, key=jax.random.PRNGKey(0))
    job.train_history = {'epochs': 1}
    job.training_parameters['set'] = 'testblob'
    save_job(job, str(tmp_path))
    calls = _count_forwards(monkeypatch)
    res = engines.misclassification_detection_rates(
        job, _dataset('testblob'), predict_methods=['iws'],
        misclass_methods=['kl'], batch_size=32,
        from_where=('json', 'recorders'))
    assert res == {} and calls['n'] == 0

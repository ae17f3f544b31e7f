"""Tests for recorders and the accuracy / OOD / misclass / ODIN engines."""

import os
import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from joint_vae_tpu.data.loaders import ArrayDataset
from joint_vae_tpu.evals.engines import (accuracy, ood_detection_rates,
                                         misclassification_detection_rates)
from joint_vae_tpu.evals.odin import make_odin_scores
from joint_vae_tpu.models.cvnet import CVNet, CVNetConfig
from joint_vae_tpu.ops.sigma import SigmaConfig
from joint_vae_tpu.save_load.jobs import new_job, save_job
from joint_vae_tpu.save_load.recorders import LossRecorder, SampleRecorder

INPUT_SHAPE = (1, 6, 6)
C = 3


def _dataset(name, n=96, seed=0, noise=False):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, C, n).astype(np.int32)
    if noise:
        x = rng.uniform(0, 1, size=(n, *INPUT_SHAPE)).astype(np.float32)
    else:
        base = np.linspace(0.2, 0.8, C)[y][:, None, None, None]
        x = np.clip(base + 0.05 * rng.standard_normal((n, *INPUT_SHAPE)), 0, 1)
    ds = ArrayDataset(x.astype(np.float32), y, name)
    return ds


def _job(type_='cvae', tmpdir=None):
    cfg = CVNetConfig(input_shape=INPUT_SHAPE, num_labels=C, type=type_,
                      encoder=(16,), decoder=(16,), classifier=(8,),
                      latent_dim=4, latent_sampling=1, test_latent_sampling=3,
                      gamma=10.0 if type_ in ('cvae', 'vae') else 1.0,
                      beta=1e-2, sigma=SigmaConfig(value=0.3))
    job = new_job(cfg, key=jax.random.PRNGKey(0))
    job.train_history = {'epochs': 1}
    job.training_parameters['set'] = 'testblob'
    if tmpdir:
        save_job(job, tmpdir)
    return job


def test_loss_recorder_roundtrip_and_merge():
    r = LossRecorder(8)
    for i in range(3):
        n = 8 if i < 2 else 5
        r.append_batch(total=np.random.rand(C, n).astype(np.float32),
                       y_true=np.arange(n, dtype=np.int32))
    assert len(r) == 3
    assert r.recorded_samples == 21
    assert r.get('total').shape == (C, 21)
    b = r.get_batch(2, 'total')
    assert b.shape == (C, 5)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, 'record-foo.npz')
        r.save(p)
        r2 = LossRecorder.load(p)
        np.testing.assert_array_equal(r.get('total'), r2.get('total'))
        assert LossRecorder.loadall(d)['foo'].recorded_samples == 21
    merged = r.merge(r2)
    assert merged.recorded_samples == 42


def test_sample_recorder():
    sr = SampleRecorder(mu=None)
    sr.append_batch(mu=np.ones((4, 2)))
    sr.append_batch(mu=np.zeros((3, 2)))
    assert sr.get('mu').shape == (7, 2)


def test_accuracy_engine():
    with tempfile.TemporaryDirectory() as d:
        job = _job('cvae', d)
        ts = _dataset('testblob')
        acc = accuracy(job, ts, batch_size=32)
        assert set(acc) == {'iws', 'closest', 'esty'}
        for v in acc.values():
            assert 0.0 <= v <= 1.0
        assert 1 in job.testing
        assert job.testing[1]['iws']['n'] == len(ts)
        # recorder written
        from joint_vae_tpu.save_load.recorders import find_record
        assert find_record(os.path.join(d, 'samples', '0001'),
                           'testblob') is not None


def test_ood_engine_schema_and_recorder_reuse():
    with tempfile.TemporaryDirectory() as d:
        job = _job('cvae', d)
        ts = _dataset('testblob')
        ood = _dataset('noise', noise=True, seed=5)
        res = ood_detection_rates(job, ts, [ood], batch_size=32,
                                  method=['iws', 'elbo', 'elbo-2s', 'zdist'])
        assert 'noise' in res
        r = res['noise']['iws']
        assert set(r) >= {'epochs', 'n', 'mean', 'std', 'auc', 'tpr', 'fpr',
                          'thresholds'}
        assert 0.0 <= r['auc'] <= 1.0
        assert len(r['fpr']) == 10
        assert job.ood_results[1]['noise']['elbo-2s']['auc'] >= 0.0
        # second run must reuse the recorders and give identical scores
        res2 = ood_detection_rates(job, ts, [ood], batch_size=32,
                                   method=['iws', 'elbo', 'elbo-2s', 'zdist'],
                                   from_where=('recorders',))
        np.testing.assert_allclose(res2['noise']['iws']['auc'],
                                   res['noise']['iws']['auc'], rtol=1e-6)


def test_misclass_engine():
    with tempfile.TemporaryDirectory() as d:
        job = _job('cvae', d)
        ts = _dataset('testblob', n=128)
        res = misclassification_detection_rates(
            job, ts, predict_methods=['iws'], misclass_methods=['kl', 'max'],
            batch_size=32)
        if res:  # needs at least one miss and one hit
            r = res['iws']
            assert 'accuracy' in r
            assert len(r['kl']['precision']) == 10
            assert 0 <= r['kl']['auc'] <= 1


def test_odin_scores_vib():
    cfg = CVNetConfig(input_shape=INPUT_SHAPE, num_labels=C, type='vib',
                      encoder=(16,), classifier=(8,), latent_dim=4,
                      latent_sampling=2, gamma=1.0, beta=1e-2)
    job = new_job(cfg, key=jax.random.PRNGKey(0))
    temps, eps = [1.0, 10.0], [0.0, 0.002]
    fn = make_odin_scores(job.model, temps, eps)
    x = jnp.asarray(_dataset('t', n=16).data)
    out = fn(job.state.variables, x, jax.random.PRNGKey(1))
    assert len(out) == 4
    for k, v in out.items():
        assert k.startswith('odin-')
        assert v.shape == (16,)
        assert np.isfinite(np.asarray(v)).all()
    # eps=0 scores equal the unperturbed temperature-scaled max-softmax
    assert float(jnp.max(out['odin-1-0.0000'])) <= 1.0


def test_ood_engine_with_odin_for_vib():
    with tempfile.TemporaryDirectory() as d:
        cfg = CVNetConfig(input_shape=INPUT_SHAPE, num_labels=C, type='vib',
                          encoder=(16,), classifier=(8,), latent_dim=4,
                          latent_sampling=1, gamma=1.0, beta=1e-2)
        job = new_job(cfg, key=jax.random.PRNGKey(0))
        job.train_history = {'epochs': 1}
        save_job(job, d)
        ts = _dataset('testblob', n=64)
        ood = _dataset('noise', n=64, noise=True, seed=9)
        res = ood_detection_rates(job, ts, [ood], batch_size=32,
                                  method=['baseline', 'logits',
                                          'odin-1-0.0000', 'odin-1-0.0020'])
        assert 'odin-1-0.0020' in res['noise']

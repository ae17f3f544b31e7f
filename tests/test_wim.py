"""WIM fine-tuning tests: ft datasets, score grammar vs hand math, and the
end-to-end finetune flow improving alternate-prior separation."""

import pytest

pytestmark = pytest.mark.slow

import os
import tempfile

import numpy as np

import jax
import jax.numpy as jnp

from joint_vae_tpu.data.loaders import ArrayDataset
from joint_vae_tpu.ft.datasets import (SubSampledDataset, MixtureDataset,
                                       EstimatedLabelsDataset)
from joint_vae_tpu.ft.job import load_wim_job, finetune, wim_scores_for_set
from joint_vae_tpu.ft.wim import WIMJob, wim_measures, K_SIGN
from joint_vae_tpu.models.cvnet import CVNetConfig
from joint_vae_tpu.ops.priors import PriorConfig
from joint_vae_tpu.ops.sigma import SigmaConfig
from joint_vae_tpu.save_load.jobs import new_job, save_job

INPUT_SHAPE = (1, 6, 6)
C = 3


def _dataset(name, n=96, seed=0, noise=False):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, C, n).astype(np.int32)
    if noise:
        x = rng.uniform(0, 1, (n, *INPUT_SHAPE)).astype(np.float32)
    else:
        base = np.linspace(0.2, 0.8, C)[y][:, None, None, None]
        x = np.clip(base + 0.05 * rng.standard_normal((n, *INPUT_SHAPE)),
                    0, 1).astype(np.float32)
    return ArrayDataset(x, y, name)


def _cvae_cfg():
    return CVNetConfig(input_shape=INPUT_SHAPE, num_labels=C, type='cvae',
                       encoder=(16,), decoder=(16,), classifier=(8,),
                       latent_dim=4, latent_sampling=1, test_latent_sampling=2,
                       gamma=10.0, beta=1e-2, sigma=SigmaConfig(value=0.3),
                       prior=PriorConfig(dim=4, num_priors=C, init_mean=2.0))


def test_subsampled_and_bar_disjoint():
    ds = _dataset('d', n=100)
    sub = SubSampledDataset(ds, 30, seed=3, task=0)
    bar = SubSampledDataset(ds, 30, seed=3, task=0).bar()
    assert len(sub) == 30
    # disjointness via row hashing (ref ft/datasets.py:460-470 self-check)
    h = lambda a: {x.tobytes() for x in a}
    assert not (h(sub.data) & h(bar.data))
    # tasks slice disjointly
    t1 = SubSampledDataset(ds, 30, seed=3, task=1)
    assert not (h(sub.data) & h(t1.data))


def test_mixture_dataset_ratios_and_extract():
    a = _dataset('a', n=200, seed=1)
    b = _dataset('b', n=200, seed=2, noise=True)
    mix = MixtureDataset(mix={'a': 0.25, 'b': 0.75}, length=80, a=a, b=b)
    assert len(mix) == 80
    counts = np.bincount(mix.targets, minlength=2)
    assert counts[0] == 20 and counts[1] == 60
    sub = mix.extract_subdataset('b')
    assert len(sub) == 60


def test_estimated_labels_dataset():
    ds = _dataset('d', n=10)
    est = EstimatedLabelsDataset(ds, np.arange(10) % C)
    assert est.estimated.shape == (10,)
    np.testing.assert_array_equal(est.targets, ds.targets)


def test_wim_measures_hand_math():
    cfg = _cvae_cfg()
    rng = np.random.default_rng(0)
    N = 7
    losses = {k: jnp.asarray(rng.normal(size=(C, N)).astype(np.float32))
              for k in ('total', 'kl', 'zdist', 'iws')}
    losses.update({k + '@': jnp.asarray(rng.normal(size=(N,)).astype(np.float32))
                   for k in ('total', 'kl', 'zdist', 'iws')})
    y_est = jnp.asarray(rng.integers(0, C, N))
    out = wim_measures(cfg, losses, ['zdist~', 'zdist@', 'zdist~@',
                                     'elbo~', 'elbo@', 'softzdist~'],
                       y_est=y_est)
    zd = np.asarray(losses['zdist'])
    s = K_SIGN['zdist']
    at_y = (s * zd)[np.asarray(y_est), np.arange(N)]
    np.testing.assert_allclose(np.asarray(out['zdist~']), at_y, rtol=1e-5)
    lse = np.log(np.exp(s * zd - (s * zd).max(0)).sum(0)) + (s * zd).max(0)
    np.testing.assert_allclose(np.asarray(out['zdist@']),
                               lse - s * np.asarray(losses['zdist@']),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out['zdist~@']),
                               at_y - s * np.asarray(losses['zdist@']),
                               rtol=1e-4)
    elbo = -np.asarray(losses['total'])
    np.testing.assert_allclose(np.asarray(out['elbo~']),
                               elbo[np.asarray(y_est), np.arange(N)], rtol=1e-5)
    sm = np.exp(s * zd) / np.exp(s * zd).sum(0)
    np.testing.assert_allclose(np.asarray(out['softzdist~']),
                               sm[np.asarray(y_est), np.arange(N)], rtol=1e-4)


def test_wim_finetune_end_to_end():
    with tempfile.TemporaryDirectory() as d:
        job = new_job(_cvae_cfg(), key=jax.random.PRNGKey(0))
        job.train_history = {'epochs': 1}
        job.training_parameters['set'] = 'blobs'
        save_job(job, d)

        wim = load_wim_job(d, distribution='gaussian', init_mean=8.0,
                           num_priors=1)
        assert wim.alternate_prior_cfg.num_priors == 1
        assert wim.job.ood_results == {}

        tr = _dataset('blobs', n=128)
        te = _dataset('blobs', n=64, seed=4)
        ood = _dataset('noise', n=64, seed=5, noise=True)
        moving = MixtureDataset(mix={'ind': 0.5, 'ood': 0.5}, length=64,
                                ind=te, ood=ood)

        finetune(wim, tr, moving, te, [ood], epochs=1, alpha=0.1,
                 batch_size=32, test_batch_size=32, save_dir=d)

        res = wim.job.ood_results[1]['noise']
        for m in ('elbo', 'zdist~', 'elbo@', 'zdist~@'):
            assert m in res, res.keys()
            assert 0.0 <= res[m]['auc'] <= 1.0
        # pre-tuning baseline saved
        assert os.path.exists(os.path.join(d, 'samples', '0001', 'init',
                                           'ood.json'))
        # wim params persisted
        assert wim.job.training_parameters['wim']['init_mean'] == 8.0
        # record file for array aggregation
        from joint_vae_tpu.save_load.recorders import find_record
        assert find_record(os.path.join(d, 'samples', '0001'),
                           'blobs') is not None

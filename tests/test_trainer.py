"""Trainer-loop integration test on a tiny synthetic dataset: history,
validation split, checkpoint files, resume, early stopping."""

import pytest

pytestmark = pytest.mark.slow

import os
import tempfile

import numpy as np

import jax

from joint_vae_tpu.data.loaders import ArrayDataset
from joint_vae_tpu.models.cvnet import CVNetConfig
from joint_vae_tpu.ops.sigma import SigmaConfig
from joint_vae_tpu.save_load.jobs import new_job, load_job
from joint_vae_tpu.train.optimizers import OptimizerConfig
from joint_vae_tpu.train.trainer import train_model, split_validation
from joint_vae_tpu.utils.print_log import EpochOutput
from joint_vae_tpu.utils.testing import early_stopping_epoch, cache_early_stopping

INPUT_SHAPE = (1, 6, 6)
C = 3


def _dataset(name, n=160, seed=0, noise=False):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, C, n).astype(np.int32)
    if noise:
        x = rng.uniform(0, 1, (n, *INPUT_SHAPE)).astype(np.float32)
    else:
        base = np.linspace(0.2, 0.8, C)[y][:, None, None, None]
        x = np.clip(base + 0.05 * rng.standard_normal((n, *INPUT_SHAPE)),
                    0, 1).astype(np.float32)
    return ArrayDataset(x, y, name)


def test_split_validation_deterministic():
    ds = _dataset('d', n=100)
    tr1, va1 = split_validation(ds, 20, seed=7)
    tr2, va2 = split_validation(ds, 20, seed=7)
    assert len(va1) == 20 and len(tr1) == 80
    np.testing.assert_array_equal(va1.data, va2.data)


def test_train_model_end_to_end_with_resume():
    cfg = CVNetConfig(input_shape=INPUT_SHAPE, num_labels=C, type='cvae',
                      encoder=(16,), decoder=(16,), classifier=(8,),
                      latent_dim=4, latent_sampling=1, test_latent_sampling=2,
                      gamma=10.0, beta=1e-2, sigma=SigmaConfig(value=0.3))
    job = new_job(cfg, OptimizerConfig(lr=5e-3), key=jax.random.PRNGKey(0))
    job.training_parameters['set'] = 'blobs'
    tr = _dataset('blobs')
    te = _dataset('blobs', n=64, seed=1)
    ood = _dataset('noise', n=64, seed=2, noise=True)

    out = EpochOutput(stdout=False)
    with tempfile.TemporaryDirectory() as d:
        train_model(job, tr, te, [ood], epochs=2, batch_size=32,
                    test_batch_size=32, validation=32, save_dir=d,
                    outputs=out, full_test_every=1, ood_detection_every=1)
        assert job.trained == 2
        assert 1 in job.train_history and 2 in job.train_history
        assert 'train_loss' in job.train_history[1]
        assert 'validation_loss' in job.train_history[1]
        assert job.train_history[2]['lr'] == 5e-3  # no decay configured
        # final evals ran
        assert 2 in job.testing and 'iws' in job.testing[2]
        assert 2 in job.ood_results and 'noise' in job.ood_results[2]
        # files exist
        for f in ('params.json', 'train_params.json', 'state.npz',
                  'optimizer.npz', 'history.json'):
            assert os.path.exists(os.path.join(d, f)), f

        # resume two more epochs from disk
        job2 = load_job(d)
        assert job2.trained == 2
        train_model(job2, tr, te, [], epochs=4, batch_size=32,
                    test_batch_size=32, validation=32, save_dir=d, outputs=out)
        assert job2.trained == 4
        assert 4 in job2.train_history

        # loss should not explode across resume
        l2 = job2.train_history[2]['train_loss']['total']
        l4 = job2.train_history[4]['train_loss']['total']
        assert np.isfinite(l4) and l4 < l2 * 1.5


def test_early_stopping_from_history():
    hist = {'epochs': 3,
            1: {'validation_loss': {'total': 5.0}},
            2: {'validation_loss': {'total': 3.0}},
            3: {'validation_loss': {'total': 4.0}}}
    assert early_stopping_epoch(hist) == 2

    class J:
        train_history = hist
        training_parameters = {}
    j = J()
    assert cache_early_stopping(j) == 2
    assert j.training_parameters['early-min-loss'] == 2


def test_frozen_modules_never_train():
    """training_parameters['frozen_modules'] (the --freeze CLI flag) pins
    those modules' params exactly (ref pretrained freezing semantics)."""
    import jax
    import numpy as np
    from joint_vae_tpu.data.loaders import ArrayDataset
    from joint_vae_tpu.models.cvnet import CVNetConfig
    from joint_vae_tpu.ops.priors import PriorConfig
    from joint_vae_tpu.ops.sigma import SigmaConfig
    from joint_vae_tpu.save_load.jobs import new_job
    from joint_vae_tpu.train.optimizers import OptimizerConfig
    from joint_vae_tpu.train.trainer import train_model
    from joint_vae_tpu.utils.print_log import EpochOutput

    cfg = CVNetConfig(input_shape=(3, 8, 8), num_labels=3, type='cvae',
                      features='[x3+1]8-8:2',
                      upsampler='[x3+1]8x2+0-8:2++1-!3x3+1',
                      encoder=(8,), decoder=(36,), classifier=(4,),
                      latent_dim=4, latent_sampling=1, gamma=10.0, beta=1e-2,
                      sigma=SigmaConfig(value=0.3),
                      prior=PriorConfig(dim=4, num_priors=3))
    job = new_job(cfg, OptimizerConfig(lr=1e-2), key=jax.random.PRNGKey(0))
    job.training_parameters.update({'set': 'd', 'epochs': 1, 'batch_size': 16,
                                    'frozen_modules': ['features']})
    rng = np.random.default_rng(0)
    ds = ArrayDataset(rng.uniform(0, 1, (32, 3, 8, 8)).astype(np.float32),
                      rng.integers(0, 3, 32).astype(np.int32), 'd')
    before = jax.device_get(job.state.params)
    train_model(job, ds, None, [], epochs=1, batch_size=16,
                final_test=False, final_ood=False,
                outputs=EpochOutput(stdout=False))
    after = jax.device_get(job.state.params)
    feats_b = jax.tree.leaves(before['features_stack'])
    feats_a = jax.tree.leaves(after['features_stack'])
    for a, b in zip(feats_a, feats_b):
        np.testing.assert_array_equal(a, b)
    enc_b = jax.tree.leaves(before['encoder'])
    enc_a = jax.tree.leaves(after['encoder'])
    assert any(not np.array_equal(a, b) for a, b in zip(enc_a, enc_b))


def test_train_model_device_data_path():
    """train_model(device_data=True): HBM-resident batches through the full
    trainer (history, checkpoints, final evals) — same features as the host
    loader path."""
    cfg = CVNetConfig(input_shape=INPUT_SHAPE, num_labels=C, type='cvae',
                      encoder=(16,), decoder=(16,), classifier=(8,),
                      latent_dim=4, latent_sampling=1, test_latent_sampling=2,
                      gamma=10.0, beta=1e-2, sigma=SigmaConfig(value=0.3))
    job = new_job(cfg, OptimizerConfig(lr=5e-3), key=jax.random.PRNGKey(0))
    job.training_parameters['set'] = 'blobs'
    tr = _dataset('blobs')
    te = _dataset('blobs', n=64, seed=1)
    ood = _dataset('noise', n=64, seed=2, noise=True)
    out = EpochOutput(stdout=False)
    with tempfile.TemporaryDirectory() as d:
        train_model(job, tr, te, [ood], epochs=2, batch_size=32,
                    test_batch_size=32, validation=32, save_dir=d,
                    outputs=out, full_test_every=1, ood_detection_every=1,
                    device_data=True)
        assert job.trained == 2
        assert np.isfinite(job.train_history[2]['train_loss']['total'])
        assert 2 in job.testing and 2 in job.ood_results
        assert os.path.exists(os.path.join(d, 'state.npz'))
        # resume continues on the device-data path too
        job2 = load_job(d)
        train_model(job2, tr, te, [], epochs=3, batch_size=32,
                    test_batch_size=32, validation=32, save_dir=d,
                    outputs=out, device_data=True)
        assert job2.trained == 3 and 3 in job2.train_history

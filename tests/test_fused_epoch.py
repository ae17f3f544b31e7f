"""The fused whole-epoch device program (make_device_epoch_fn) trains the
same trajectory as the per-step dispatch path."""

import pytest

pytestmark = pytest.mark.slow

import numpy as np

import jax
import jax.numpy as jnp

from joint_vae_tpu.data.loaders import ArrayDataset
from joint_vae_tpu.models.cvnet import CVNetConfig
from joint_vae_tpu.ops.priors import PriorConfig
from joint_vae_tpu.ops.sigma import SigmaConfig
from joint_vae_tpu.save_load.jobs import new_job
from joint_vae_tpu.train.optimizers import OptimizerConfig
from joint_vae_tpu.train.device_data import train_epochs_on_device

C = 4


def _dataset(n=64):
    rng = np.random.default_rng(5)
    data = rng.uniform(0, 1, (n, 1, 8, 8)).astype(np.float32)
    y = rng.integers(0, C, n).astype(np.int64)
    return ArrayDataset(data, y, 'shapes-lite')


def _cfg():
    return CVNetConfig(input_shape=(1, 8, 8), num_labels=C, type='cvae',
                       encoder=(16,), decoder=(16,), classifier=(8,),
                       latent_dim=4, latent_sampling=1, test_latent_sampling=2,
                       gamma=10.0, beta=1e-2, sigma=SigmaConfig(value=0.3),
                       prior=PriorConfig(dim=4, num_priors=C, init_mean=2.0))


def _train(fused):
    job = new_job(_cfg(), OptimizerConfig(lr=1e-3),
                  key=jax.random.PRNGKey(0))
    last = train_epochs_on_device(job, _dataset(), epochs=2, batch_size=16,
                                  seed=7, fused=fused)
    return job, last


def test_fused_epoch_matches_per_step():
    job_f, last_f = _train(fused=True)
    job_s, _ = _train(fused=False)
    leaves_f = jax.tree_util.tree_leaves(jax.device_get(job_f.state.params))
    leaves_s = jax.tree_util.tree_leaves(jax.device_get(job_s.state.params))
    for a, b in zip(leaves_f, leaves_s):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)
    assert np.isfinite(last_f['total'])
    assert job_f.train_history['epochs'] == 2
    # fused metrics are epoch means of per-batch means -> finite scalars
    assert set(job_f.train_history[2]['train_loss']) \
        == set(job_s.train_history[2]['train_loss'])


def test_fused_epoch_resumes():
    job, _ = _train(fused=True)
    assert job.trained == 2
    train_epochs_on_device(job, _dataset(), epochs=1, batch_size=16,
                           seed=7, fused=True)
    assert job.train_history['epochs'] == 3

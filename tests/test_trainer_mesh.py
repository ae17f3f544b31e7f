"""train_model(mesh=...) integration on the virtual 8-device mesh."""

import pytest

pytestmark = pytest.mark.slow

import numpy as np

import jax

from joint_vae_tpu.data.loaders import ArrayDataset
from joint_vae_tpu.models.cvnet import CVNetConfig
from joint_vae_tpu.ops.priors import PriorConfig
from joint_vae_tpu.ops.sigma import SigmaConfig
from joint_vae_tpu.parallel.mesh import make_mesh
from joint_vae_tpu.save_load.jobs import new_job
from joint_vae_tpu.train.optimizers import OptimizerConfig
from joint_vae_tpu.train.trainer import train_model
from joint_vae_tpu.utils.print_log import EpochOutput

INPUT_SHAPE = (1, 6, 6)
C = 4


def _dataset(n=128, seed=0):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, C, n).astype(np.int32)
    base = np.linspace(0.2, 0.8, C)[y][:, None, None, None]
    x = np.clip(base + 0.05 * rng.standard_normal((n, *INPUT_SHAPE)),
                0, 1).astype(np.float32)
    return ArrayDataset(x, y, 'blobs')


def test_train_model_on_mesh():
    cfg = CVNetConfig(input_shape=INPUT_SHAPE, num_labels=C, type='cvae',
                      encoder=(16,), decoder=(16,), classifier=(8,),
                      latent_dim=8, latent_sampling=1, gamma=10.0, beta=1e-2,
                      sigma=SigmaConfig(value=0.3),
                      prior=PriorConfig(dim=8, num_priors=C, init_mean=1.0,
                                        learned_means=True))
    job = new_job(cfg, OptimizerConfig(lr=3e-3), key=jax.random.PRNGKey(0))
    job.training_parameters['set'] = 'blobs'
    mesh = make_mesh(8, model_axis=2)

    train_model(job, _dataset(), _dataset(64, 1), [], epochs=2,
                batch_size=32, test_batch_size=32,
                outputs=EpochOutput(stdout=False), mesh=mesh)
    assert job.trained == 2
    l1 = job.train_history[1]['train_loss']['total']
    l2 = job.train_history[2]['train_loss']['total']
    assert np.isfinite(l2) and l2 < l1
    # prior mean stayed sharded over 'model' through the updates
    sh = job.state.params['prior']['mean'].sharding
    from jax.sharding import PartitionSpec as P
    assert getattr(sh, 'spec', None) == P('model')


def test_checkpoint_reshard_roundtrip(tmp_path):
    """Checkpoint written under a ('data' x 'model'=2) mesh restores and
    continues training under a pure-DP mesh (reshard-on-restore)."""
    import jax
    import numpy as np
    from joint_vae_tpu.data.loaders import ArrayDataset
    from joint_vae_tpu.parallel.mesh import make_mesh
    from joint_vae_tpu.save_load.jobs import save_job, load_job
    from joint_vae_tpu.train.trainer import train_model
    from joint_vae_tpu.utils.print_log import EpochOutput

    cfg = CVNetConfig(input_shape=INPUT_SHAPE, num_labels=C, type='cvae',
                      encoder=(16,), decoder=(16,), classifier=(8,),
                      latent_dim=8, latent_sampling=1, gamma=10.0, beta=1e-2,
                      sigma=SigmaConfig(value=0.3),
                      prior=PriorConfig(dim=8, num_priors=C, init_mean=1.0,
                                        learned_means=True))
    job = new_job(cfg, OptimizerConfig(lr=3e-3), key=jax.random.PRNGKey(0))
    job.training_parameters.update({'set': 'blobs', 'epochs': 2,
                                    'batch_size': 16})
    ds = _dataset(32)
    m2 = make_mesh(8, model_axis=2)
    train_model(job, ds, None, [], epochs=1, batch_size=16, mesh=m2,
                final_test=False, final_ood=False,
                outputs=EpochOutput(stdout=False))
    d = str(tmp_path / 'job')
    save_job(job, d)

    job2 = load_job(d)
    m1 = make_mesh(8, model_axis=1)
    train_model(job2, ds, None, [], epochs=2, batch_size=16, mesh=m1,
                final_test=False, final_ood=False,
                outputs=EpochOutput(stdout=False))
    assert job2.trained == 2
    tr = job2.train_history[2]['train_loss']['total']
    assert np.isfinite(tr)

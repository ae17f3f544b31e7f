"""Sharded data feeding on the virtual mesh (single-process path + shard
arithmetic for the multi-process path)."""

import pytest

pytestmark = pytest.mark.slow

import numpy as np

import jax
from jax.sharding import PartitionSpec as P

from joint_vae_tpu.data.loaders import ArrayDataset
from joint_vae_tpu.parallel.mesh import make_mesh
from joint_vae_tpu.parallel.sharded_data import (process_shard, global_batch,
                                                 sharded_loader)


def _ds(n=64):
    rng = np.random.default_rng(0)
    return ArrayDataset(rng.uniform(0, 1, (n, 1, 4, 4)).astype(np.float32),
                        rng.integers(0, 3, n).astype(np.int32), 'd')


def test_process_shard_partition():
    # every process must get EXACTLY the same shard size: the dataset
    # remainder is dropped (a bigger last shard could yield one more batch
    # there and hang the pod's collectives mid-epoch)
    ds = _ds(10)
    shards = [process_shard(ds, i, 3) for i in range(3)]
    assert [len(s) for s in shards] == [3, 3, 3]
    all_rows = np.concatenate([s.data for s in shards])
    np.testing.assert_array_equal(all_rows, ds.data[:9])


def test_process_shard_equal_batch_counts():
    # n=317, 4 procs, local batch 16: every process sees floor(79/16)=4
    # batches — the remainder must never create a 5th on the last process
    ds = _ds(317)
    shards = [process_shard(ds, i, 4) for i in range(4)]
    assert len({len(s) for s in shards}) == 1
    assert all(len(s) // 16 == len(shards[0]) // 16 for s in shards)


def test_global_batch_sharded_over_data():
    mesh = make_mesh(8, model_axis=1)
    ds = _ds(32)
    gx, gy = global_batch(mesh, ds.data, ds.targets)
    assert gx.sharding.spec == P('data', None, None, None)
    assert gx.shape == (32, 1, 4, 4)
    np.testing.assert_array_equal(np.asarray(gx), ds.data)


def test_sharded_loader_feeds_train_step():
    from joint_vae_tpu.models.cvnet import CVNetConfig
    from joint_vae_tpu.ops.sigma import SigmaConfig
    from joint_vae_tpu.save_load.jobs import new_job
    from joint_vae_tpu.train.optimizers import OptimizerConfig, build_optimizer
    from joint_vae_tpu.train.steps import make_train_step
    from joint_vae_tpu.parallel.mesh import state_shardings

    mesh = make_mesh(8, model_axis=1)
    cfg = CVNetConfig(input_shape=(1, 4, 4), num_labels=3, type='cvae',
                      encoder=(8,), decoder=(8,), classifier=(4,),
                      latent_dim=4, latent_sampling=1, gamma=10.0,
                      sigma=SigmaConfig(value=0.3))
    job = new_job(cfg, OptimizerConfig(lr=1e-3), key=jax.random.PRNGKey(0))
    tx = build_optimizer(job.opt_cfg)
    step = make_train_step(job.model, tx, donate=False)
    state = jax.device_put(job.state, state_shardings(mesh, job.state))
    n_batches = 0
    for gx, gy in sharded_loader(mesh, _ds(64), 16, seed=1):
        state, m = step(state, gx, gy)
        n_batches += 1
    assert n_batches == 4
    assert np.isfinite(float(m['total']))


def test_device_dataset_uint8_auto_storage():
    """8-bit-quantized [0,1] data is stored as uint8 on device and
    normalizes back exactly; non-quantized data stays float."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from joint_vae_tpu.data.loaders import ArrayDataset
    from joint_vae_tpu.train.device_data import DeviceDataset

    rng = np.random.default_rng(0)
    q = rng.integers(0, 256, (32, 1, 4, 4)).astype(np.float32) / 255.0
    ds = ArrayDataset(q, rng.integers(0, 3, 32).astype(np.int32), 'q')
    dd = DeviceDataset(ds)
    assert dd.x.dtype == jnp.uint8
    np.testing.assert_allclose(
        np.asarray(dd.x, np.float32) / 255.0, q, rtol=0, atol=1e-7)
    ex, ey = dd.shuffled(jax.random.PRNGKey(0))
    assert ex.dtype == jnp.uint8 and ex.shape == dd.x.shape

    f = rng.uniform(0, 1, (8, 1, 4, 4)).astype(np.float32)
    df = DeviceDataset(ArrayDataset(f, np.zeros(8, np.int32), 'f'))
    assert df.x.dtype == jnp.float32


def test_device_training_resumes_from_trained_epoch():
    """A second train_epochs_on_device call continues at job.trained
    instead of re-running the last epoch (state.epoch is the last trained
    index, not the next one)."""
    import jax
    import numpy as np
    from joint_vae_tpu.data.loaders import ArrayDataset
    from joint_vae_tpu.models.cvnet import CVNetConfig
    from joint_vae_tpu.ops.priors import PriorConfig
    from joint_vae_tpu.ops.sigma import SigmaConfig
    from joint_vae_tpu.save_load.jobs import new_job
    from joint_vae_tpu.train.device_data import train_epochs_on_device
    from joint_vae_tpu.train.optimizers import OptimizerConfig

    cfg = CVNetConfig(input_shape=(1, 4, 4), num_labels=2, type='cvae',
                      encoder=(8,), decoder=(8,), latent_dim=4,
                      latent_sampling=1, gamma=10.0, beta=1e-2,
                      sigma=SigmaConfig(value=0.5),
                      prior=PriorConfig(dim=4, num_priors=2))
    job = new_job(cfg, OptimizerConfig(lr=1e-3), key=jax.random.PRNGKey(0))
    job.training_parameters.update({'set': 'd', 'epochs': 4})
    rng = np.random.default_rng(0)
    ds = ArrayDataset(rng.uniform(0, 1, (32, 1, 4, 4)).astype(np.float32),
                      rng.integers(0, 2, 32).astype(np.int32), 'd')
    train_epochs_on_device(job, ds, epochs=2, batch_size=16)
    h2 = dict(job.train_history[2]['train_loss'])
    assert job.trained == 2
    train_epochs_on_device(job, ds, epochs=2, batch_size=16)
    assert job.trained == 4
    assert set(job.train_history) >= {1, 2, 3, 4, 'epochs'}
    # epoch 2's history untouched by the resumed run
    assert job.train_history[2]['train_loss'] == h2

"""Sharded + async checkpointing (save_load/sharded_checkpoint.py).

Single-process coverage on the 8-virtual-device mesh: chunked save under
('data' x 'model'=2), bitwise restore, restore onto a different mesh shape,
the async writer, and failure surfacing.  True cross-process shard files
are covered by tests/test_multiprocess.py (slow tier).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from joint_vae_tpu.models.cvnet import CVNetConfig
from joint_vae_tpu.ops.priors import PriorConfig
from joint_vae_tpu.ops.sigma import SigmaConfig
from joint_vae_tpu.parallel.mesh import make_mesh, state_shardings
from joint_vae_tpu.save_load.checkpoint import flatten_pytree
from joint_vae_tpu.save_load.jobs import load_job, new_job, save_job
from joint_vae_tpu.save_load.sharded_checkpoint import (
    AsyncCheckpointer, is_sharded_checkpoint, load_checkpoint_sharded,
    save_checkpoint_sharded)
from joint_vae_tpu.train.optimizers import OptimizerConfig


def _job():
    cfg = CVNetConfig(input_shape=(1, 6, 6), num_labels=4, type='cvae',
                      encoder=(16,), decoder=(16,), classifier=(8,),
                      latent_dim=8, latent_sampling=1, gamma=10.0, beta=1e-2,
                      sigma=SigmaConfig(value=0.3),
                      prior=PriorConfig(dim=8, num_priors=4, init_mean=1.0,
                                        learned_means=True))
    return new_job(cfg, OptimizerConfig(lr=3e-3), key=jax.random.PRNGKey(1))


def test_sharded_roundtrip_bitwise(tmp_path):
    tree = {'a': jnp.arange(32, dtype=jnp.float32).reshape(8, 4),
            'b': {'c': jnp.ones((3,), jnp.bfloat16),
                  'n': np.arange(5, dtype=np.int32),
                  's': jnp.asarray(7, jnp.int32)}}
    mesh = make_mesh(8, model_axis=2)
    from jax.sharding import NamedSharding, PartitionSpec as P
    tree['a'] = jax.device_put(tree['a'], NamedSharding(mesh, P('data', 'model')))
    d = str(tmp_path / 'ck')
    save_checkpoint_sharded(d, tree)
    assert is_sharded_checkpoint(d)
    # chunked: the (6,4) leaf must appear as multiple offset chunks
    with np.load(os.path.join(d, 'shard-0.npz')) as z:
        a_chunks = [k for k in z.files if k.startswith('a@')]
    assert len(a_chunks) == 8
    out = load_checkpoint_sharded(d)
    np.testing.assert_array_equal(out['a'], np.arange(32).reshape(8, 4))
    np.testing.assert_array_equal(out['b/c'].astype(np.float32), 1.0)
    np.testing.assert_array_equal(out['b/n'], np.arange(5))
    assert out['b/s'] == 7


def test_save_job_sharded_restores_onto_other_mesh(tmp_path):
    job = _job()
    m2 = make_mesh(8, model_axis=2)
    job.state = jax.device_put(job.state, state_shardings(m2, job.state))
    ref = jax.device_get(flatten_pytree(job.state.params))
    d = str(tmp_path / 'job')
    save_job(job, d, sharded=True)
    assert is_sharded_checkpoint(os.path.join(d, 'state.shards'))
    assert is_sharded_checkpoint(os.path.join(d, 'optimizer.shards'))
    assert not os.path.exists(os.path.join(d, 'state.npz'))

    job2 = load_job(d)
    m1 = make_mesh(8, model_axis=1)
    st = jax.device_put(job2.state, state_shardings(m1, job2.state))
    got = jax.device_get(flatten_pytree(st.params))
    assert set(got) == set(ref)
    for k in ref:
        np.testing.assert_array_equal(got[k], ref[k], err_msg=k)


def test_async_checkpointer_overlap_and_errors(tmp_path):
    job = _job()
    d = str(tmp_path / 'job')
    ck = AsyncCheckpointer()
    save_job(job, d, sharded=True, checkpointer=ck)
    ck.wait()
    job2 = load_job(d)
    ref = jax.device_get(flatten_pytree(job.state.params))
    got = jax.device_get(flatten_pytree(job2.state.params))
    for k in ref:
        np.testing.assert_array_equal(got[k], ref[k], err_msg=k)

    # async snapshot protects against donation: mutate-by-rebind after
    # submit must not affect the bytes written
    ck2 = AsyncCheckpointer()
    tree = {'w': jnp.zeros((4,), jnp.float32)}
    save_checkpoint_sharded(str(tmp_path / 'ck2'), tree, checkpointer=ck2,
                            sync=False)
    ck2.wait()
    out = load_checkpoint_sharded(str(tmp_path / 'ck2'))
    np.testing.assert_array_equal(out['w'], 0.0)

    # worker exceptions surface on wait()
    ck3 = AsyncCheckpointer()

    def boom():
        raise RuntimeError('disk on fire')

    ck3.submit(boom)
    with pytest.raises(RuntimeError, match='disk on fire'):
        ck3.wait()


def test_incomplete_shard_dir_raises(tmp_path):
    tree = {'a': jnp.arange(8, dtype=jnp.float32)}
    mesh = make_mesh(8, model_axis=1)
    from jax.sharding import NamedSharding, PartitionSpec as P
    tree['a'] = jax.device_put(tree['a'], NamedSharding(mesh, P('data')))
    d = str(tmp_path / 'ck')
    save_checkpoint_sharded(d, tree)
    # simulate a crash that lost a chunk: drop one chunk from the shard file
    p = os.path.join(d, 'shard-0.npz')
    with np.load(p) as z:
        arrays = {k: z[k] for k in z.files}
    arrays.pop(sorted(arrays)[0])
    np.savez(p, **arrays)
    with pytest.raises(ValueError, match='unfilled'):
        load_checkpoint_sharded(d)

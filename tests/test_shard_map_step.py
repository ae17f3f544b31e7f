"""Explicit shard_map train step: trains, and with sampling disabled it
matches the single-device step exactly (pmean of per-shard grads == global
gradient when the loss is a batch mean)."""

import pytest

pytestmark = pytest.mark.slow

import numpy as np

import jax
import jax.numpy as jnp

from joint_vae_tpu.models.cvnet import CVNetConfig
from joint_vae_tpu.ops.sigma import SigmaConfig
from joint_vae_tpu.parallel.mesh import make_mesh
from joint_vae_tpu.parallel.shard_steps import (make_shard_map_train_step,
                                                replicate_state, shard_batch)
from joint_vae_tpu.save_load.jobs import new_job
from joint_vae_tpu.train.optimizers import OptimizerConfig, build_optimizer
from joint_vae_tpu.train.steps import make_train_step

INPUT_SHAPE = (1, 6, 6)
C = 4
RNG = np.random.default_rng(0)


def _setup(beta):
    cfg = CVNetConfig(input_shape=INPUT_SHAPE, num_labels=C, type='cvae',
                      encoder=(16,), decoder=(16,), classifier=(8,),
                      latent_dim=8, latent_sampling=1, gamma=10.0, beta=beta,
                      sigma=SigmaConfig(value=0.3))
    job = new_job(cfg, OptimizerConfig(lr=1e-3), key=jax.random.PRNGKey(0))
    tx = build_optimizer(job.opt_cfg)
    return job, tx


def _batch(n=32):
    x = jnp.asarray(RNG.uniform(0, 1, (n, *INPUT_SHAPE)).astype(np.float32))
    y = jnp.asarray(RNG.integers(0, C, n).astype(np.int32))
    return x, y


def test_shard_map_step_trains():
    job, tx = _setup(beta=1e-2)
    mesh = make_mesh(8, model_axis=1)
    step = make_shard_map_train_step(job.model, tx, mesh)
    state = replicate_state(mesh, job.state)
    x, y = _batch(32)
    xb, yb = shard_batch(mesh, x, y)
    losses = []
    for i in range(10):
        state, m = step(state, xb, yb)
        losses.append(float(m['total']))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_shard_map_matches_global_when_deterministic():
    # beta=0 + L=1 disables latent sampling -> both paths are deterministic
    job, tx = _setup(beta=0.0)
    mesh = make_mesh(8, model_axis=1)
    x, y = _batch(32)

    global_step = make_train_step(job.model, tx, donate=False)
    s1, m1 = global_step(job.state, x, y)

    sm_step = make_shard_map_train_step(job.model, tx, mesh,
                                        split_sampling_per_shard=False)
    state = replicate_state(mesh, job.state)
    xb, yb = shard_batch(mesh, x, y)
    s2, m2 = sm_step(state, xb, yb)

    np.testing.assert_allclose(float(m1['total']), float(m2['total']),
                               rtol=1e-5)
    p1 = np.concatenate([np.ravel(l) for l in
                         jax.tree_util.tree_leaves(s1.params)])
    p2 = np.concatenate([np.ravel(l) for l in
                         jax.tree_util.tree_leaves(s2.params)])
    np.testing.assert_allclose(p1, p2, rtol=2e-4, atol=2e-6)


def test_shard_map_sigma_state_matches_global():
    """decay-to-rmse sigma must follow the GLOBAL batch mse, not one shard's
    local value (advisor finding r1)."""
    cfg = CVNetConfig(input_shape=INPUT_SHAPE, num_labels=C, type='cvae',
                      encoder=(16,), decoder=(16,), classifier=(8,),
                      latent_dim=8, latent_sampling=1, gamma=10.0, beta=0.0,
                      sigma=SigmaConfig(value=0.5, decay=0.2, reach=1.0))
    job = new_job(cfg, OptimizerConfig(lr=1e-3), key=jax.random.PRNGKey(0))
    tx = build_optimizer(job.opt_cfg)
    mesh = make_mesh(8, model_axis=1)
    x, y = _batch(32)

    global_step = make_train_step(job.model, tx, donate=False)
    s1, _ = global_step(job.state, x, y)

    sm_step = make_shard_map_train_step(job.model, tx, mesh,
                                        split_sampling_per_shard=False)
    state = replicate_state(mesh, job.state)
    xb, yb = shard_batch(mesh, x, y)
    s2, _ = sm_step(state, xb, yb)

    np.testing.assert_allclose(np.asarray(s2.sigma_state.rmse),
                               np.asarray(s1.sigma_state.rmse), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s2.sigma_state.data),
                               np.asarray(s1.sigma_state.data), rtol=1e-5)

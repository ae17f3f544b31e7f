"""Model variants not covered elsewhere: dropout, uniform prior (uniform
epsilon sampling), batch-norm conv training, coded sigma end-to-end."""

import numpy as np

import jax
import jax.numpy as jnp

from joint_vae_tpu.models.cvnet import CVNet, CVNetConfig
from joint_vae_tpu.models.evaluate import evaluate
from joint_vae_tpu.ops.priors import PriorConfig
from joint_vae_tpu.ops.sigma import SigmaConfig, init_sigma_state
from joint_vae_tpu.save_load.jobs import new_job
from joint_vae_tpu.train.optimizers import OptimizerConfig, build_optimizer
from joint_vae_tpu.train.steps import make_train_step

INPUT_SHAPE = (1, 6, 6)
C = 3
RNG = np.random.default_rng(2)
X = jnp.asarray(RNG.uniform(0, 1, (8, *INPUT_SHAPE)).astype(np.float32))
Y = jnp.asarray(RNG.integers(0, C, 8).astype(np.int32))


def _cfg(**kw):
    base = dict(input_shape=INPUT_SHAPE, num_labels=C, type='cvae',
                encoder=(16,), decoder=(16,), classifier=(8,), latent_dim=4,
                latent_sampling=2, gamma=10.0, beta=1e-2,
                sigma=SigmaConfig(value=0.3))
    base.update(kw)
    return CVNetConfig(**base)


def _run_one_step(cfg):
    job = new_job(cfg, OptimizerConfig(lr=1e-3), key=jax.random.PRNGKey(0))
    tx = build_optimizer(job.opt_cfg)
    step = make_train_step(job.model, tx, donate=False)
    state, m = step(job.state, X, Y)
    assert np.isfinite(float(m['total'])), cfg
    return job, state, m


def test_dropout_training_and_determinism():
    cfg = _cfg(dropout=0.3)
    job, state, m = _run_one_step(cfg)
    # eval is deterministic (dropout off)
    st = init_sigma_state(cfg.sigma_cfg)
    o1 = evaluate(job.model, job.state.variables, X, None,
                  rng=jax.random.PRNGKey(5), sigma_state=st, train=False)
    o2 = evaluate(job.model, job.state.variables, X, None,
                  rng=jax.random.PRNGKey(5), sigma_state=st, train=False)
    np.testing.assert_allclose(np.asarray(o1.losses['total']),
                               np.asarray(o2.losses['total']))
    # train with different rngs differs (dropout active)
    o3 = evaluate(job.model, job.state.variables, X, Y,
                  rng=jax.random.PRNGKey(1), sigma_state=st, train=True)
    o4 = evaluate(job.model, job.state.variables, X, Y,
                  rng=jax.random.PRNGKey(2), sigma_state=st, train=True)
    assert np.abs(np.asarray(o3.losses['total'])
                  - np.asarray(o4.losses['total'])).max() > 0


def test_uniform_prior_model_trains():
    cfg = _cfg(prior=PriorConfig(dim=4, distribution='uniform', tau=5.0,
                                 num_priors=C, init_mean=1.0))
    job, state, m = _run_one_step(cfg)
    st = init_sigma_state(cfg.sigma_cfg)
    out = evaluate(job.model, job.state.variables, X, None,
                   rng=jax.random.PRNGKey(0), sigma_state=st, train=False)
    assert 'iws' in out.losses
    assert np.isfinite(np.asarray(out.losses['iws'])).all()


def test_tilted_prior_vae_wim_config():
    # the [tilted] operating point: vae + tilted prior + forced variance
    cfg = CVNetConfig(input_shape=INPUT_SHAPE, num_labels=C, type='vae',
                      encoder=(16,), decoder=(16,), latent_dim=4,
                      latent_sampling=1, gamma=0.0,
                      encoder_forced_variance=1.0,
                      prior=PriorConfig(dim=4, distribution='tilted', tau=10.0),
                      sigma=SigmaConfig(value=0.7071))
    job, state, m = _run_one_step(cfg)
    assert 'cross_y' not in m  # no classifier for gamma=0 vae


def test_coded_sigma_end_to_end():
    cfg = _cfg(sigma=SigmaConfig(input_dim=INPUT_SHAPE))
    job, state, m = _run_one_step(cfg)
    # coded sigma state records the batch-mean log sigma
    assert np.isfinite(np.asarray(state.sigma_state.data)).all()
    assert 'sigma' in job.state.params['encoder']


def test_batch_norm_conv_cvae():
    cfg = CVNetConfig(input_shape=(3, 8, 8), num_labels=C, type='cvae',
                      features='[x3+1]4-4:2', encoder=(16,), decoder=(16,),
                      classifier=(8,), latent_dim=4, latent_sampling=1,
                      gamma=10.0, batch_norm='encoder',
                      sigma=SigmaConfig(value=0.3))
    job = new_job(cfg, OptimizerConfig(lr=1e-3), key=jax.random.PRNGKey(0))
    assert job.state.batch_stats is not None
    tx = build_optimizer(job.opt_cfg)
    step = make_train_step(job.model, tx, donate=False)
    x = jnp.asarray(RNG.uniform(0, 1, (8, 3, 8, 8)).astype(np.float32))
    state, m = step(job.state, x, Y)
    assert np.isfinite(float(m['total']))

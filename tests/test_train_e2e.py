"""End-to-end training tests: loss decreases, masks freeze what they should,
LR decay applies, checkpoints round-trip bit-exactly (the jax way: same seed
=> same losses — SURVEY.md section 4 implication c)."""

import pytest

pytestmark = pytest.mark.slow

import numpy as np

import jax
import jax.numpy as jnp

from joint_vae_tpu.models.cvnet import CVNet, CVNetConfig
from joint_vae_tpu.models.evaluate import evaluate
from joint_vae_tpu.ops.priors import PriorConfig
from joint_vae_tpu.ops.sigma import SigmaConfig
from joint_vae_tpu.train.optimizers import (OptimizerConfig, build_optimizer,
                                            set_learning_rate, get_learning_rate)
from joint_vae_tpu.train.state import create_train_state
from joint_vae_tpu.train.steps import make_train_step, warmup_weight
from joint_vae_tpu.save_load.jobs import new_job, save_job, load_job

INPUT_SHAPE = (1, 6, 6)
C, N, K = 3, 16, 4


def synthetic_batch(key, n=N):
    """Class-dependent gaussian blobs: learnable structure."""
    ky, kx = jax.random.split(key)
    y = jax.random.randint(ky, (n,), 0, C)
    base = jnp.linspace(0.2, 0.8, C)[y][:, None, None, None]
    x = base + 0.05 * jax.random.normal(kx, (n, *INPUT_SHAPE))
    return jnp.clip(x, 0, 1), y


def make_setup(type_='cvae', **kw):
    kw.setdefault('sigma', SigmaConfig(value=0.3))
    cfg = CVNetConfig(
        input_shape=INPUT_SHAPE, num_labels=C, type=type_,
        encoder=(24,), decoder=(24,), classifier=(8,), latent_dim=K,
        latent_sampling=1, test_latent_sampling=4,
        gamma=10.0 if type_ in ('cvae', 'vae') else 0.0,
        beta=1e-3, **kw)
    model = CVNet(cfg)
    opt = OptimizerConfig(optim_type='adam', lr=1e-2, grad_clipping=100.0)
    state = create_train_state(model, jax.random.PRNGKey(0), opt)
    tx = build_optimizer(opt)
    return model, opt, state, tx


def test_training_decreases_loss():
    model, opt, state, tx = make_setup('cvae')
    step = make_train_step(model, tx, donate=False)
    losses = []
    for i in range(30):
        x, y = synthetic_batch(jax.random.PRNGKey(100 + i))
        state, metrics = step(state, x, y)
        losses.append(float(metrics['total']))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.9, losses[:3] + losses[-3:]


def test_frozen_prior_mean_does_not_move():
    model, opt, state, tx = make_setup('cvae')  # learned_means False by default
    step = make_train_step(model, tx, donate=False)
    before = np.asarray(state.params['prior']['mean'])
    for i in range(3):
        x, y = synthetic_batch(jax.random.PRNGKey(i))
        state, _ = step(state, x, y)
    np.testing.assert_array_equal(before, np.asarray(state.params['prior']['mean']))
    # scalar var param also frozen
    np.testing.assert_array_equal(np.asarray(state.params['prior']['var_param']), 1.0)


def test_learned_means_thaw_at_epoch():
    prior = PriorConfig(dim=K, num_priors=C, learned_means=True,
                        freeze_means=2, init_mean=1.0)
    model, opt, state, tx = make_setup('cvae', prior=prior)
    step = make_train_step(model, tx, donate=False)
    m0 = np.asarray(state.params['prior']['mean'])
    x, y = synthetic_batch(jax.random.PRNGKey(0))
    state, _ = step(state, x, y)  # epoch 0 < freeze_means -> frozen
    np.testing.assert_array_equal(m0, np.asarray(state.params['prior']['mean']))
    state = state.replace(epoch=jnp.asarray(2, jnp.int32))
    state, _ = step(state, x, y)  # epoch 2 >= freeze_means -> thawed
    assert np.abs(m0 - np.asarray(state.params['prior']['mean'])).max() > 0


def test_learned_sigma_gets_gradient():
    model, opt, state, tx = make_setup('vae', sigma=SigmaConfig(value=0.3,
                                                                learned=True))
    assert 'sigma_param' in state.params
    s0 = float(state.params['sigma_param'][0])
    step = make_train_step(model, tx, donate=False)
    for i in range(3):
        x, y = synthetic_batch(jax.random.PRNGKey(i))
        state, _ = step(state, x, y)
    assert float(state.params['sigma_param'][0]) != s0


def test_sigma_rmse_mode_tracks():
    model, opt, state, tx = make_setup('vae', sigma=SigmaConfig(is_rmse=True))
    step = make_train_step(model, tx, donate=False)
    x, y = synthetic_batch(jax.random.PRNGKey(0))
    state, metrics = step(state, x, y)
    assert np.isfinite(float(metrics['total']))
    assert float(state.sigma_state.data[0]) > 0  # tracked batch rmse


def test_lr_decay_injection():
    opt = OptimizerConfig(optim_type='adam', lr=1e-3, lr_decay=0.1)
    tx = build_optimizer(opt)
    params = {'w': jnp.ones((3,))}
    os_ = tx.init(params)
    assert abs(get_learning_rate(os_) - 1e-3) < 1e-9
    os2 = set_learning_rate(os_, opt.lr_at_epoch(5))
    assert abs(get_learning_rate(os2) - 1e-3 * 0.9 ** 5) < 1e-8
    # still usable for updates
    up, _ = tx.update({'w': jnp.ones((3,))}, os2, params)
    assert np.isfinite(np.asarray(up['w'])).all()


def test_warmup_ramp():
    # ref cvae.py:2432: clip((epoch + 1 - start) / (len + 1), 0, 1)
    np.testing.assert_allclose(float(warmup_weight(jnp.asarray(0), (0, 0))), 1.0)
    np.testing.assert_allclose(float(warmup_weight(jnp.asarray(0), (0, 9))), 0.1,
                               rtol=1e-6)
    np.testing.assert_allclose(float(warmup_weight(jnp.asarray(9), (0, 9))), 1.0)
    np.testing.assert_allclose(float(warmup_weight(jnp.asarray(0), (5, 10))), 0.0)


def test_checkpoint_roundtrip_exact():
    model, opt, state, tx = make_setup('cvae')
    step = make_train_step(model, tx, donate=False)
    for i in range(3):
        x, y = synthetic_batch(jax.random.PRNGKey(i))
        state, _ = step(state, x, y)

    job = new_job(model.cfg, opt)
    job.state = state
    job.train_history = {'epochs': 3}
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        save_job(job, d)
        job2 = load_job(d)
        assert job2.model_cfg == model.cfg
        assert job2.opt_cfg == opt
        assert job2.train_history['epochs'] == 3

        # identical eval outputs
        x, y = synthetic_batch(jax.random.PRNGKey(99))
        o1 = evaluate(model, state.variables, x, y, rng=jax.random.PRNGKey(1),
                      sigma_state=state.sigma_state, train=False)
        o2 = evaluate(job2.model, job2.state.variables, x, y,
                      rng=jax.random.PRNGKey(1),
                      sigma_state=job2.state.sigma_state, train=False)
        np.testing.assert_allclose(np.asarray(o1.losses['total']),
                                   np.asarray(o2.losses['total']), rtol=1e-6)

        # training continues identically after resume
        s1, m1 = step(state, x, y)
        s2, m2 = step(job2.state.replace(rng=state.rng), x, y)
        np.testing.assert_allclose(float(m1['total']), float(m2['total']),
                                   rtol=1e-6)


def test_ghost_load_has_no_arrays():
    model, opt, state, tx = make_setup('vae')
    job = new_job(model.cfg, opt)
    job.state = state
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        save_job(job, d)
        ghost = load_job(d, ghost=True)
        assert ghost.state is None
        assert ghost.model_cfg.type == 'vae'


def test_checkpoint_roundtrip_with_batch_stats():
    """BN models: batch_stats must persist through save/load."""
    import tempfile
    cfg = CVNetConfig(input_shape=(3, 8, 8), num_labels=C, type='cvae',
                      features='[x3+1]4-4:2', encoder=(16,), decoder=(16,),
                      classifier=(8,), latent_dim=4, latent_sampling=1,
                      gamma=10.0, batch_norm='encoder',
                      sigma=SigmaConfig(value=0.3))
    from joint_vae_tpu.save_load.jobs import new_job as _new_job
    job = new_job(cfg, OptimizerConfig(lr=1e-3), key=jax.random.PRNGKey(0))
    tx = build_optimizer(job.opt_cfg)
    step = make_train_step(job.model, tx, donate=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (8, 3, 8, 8)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, C, 8).astype(np.int32))
    job.state, _ = step(job.state, x, y)
    assert job.state.batch_stats is not None

    with tempfile.TemporaryDirectory() as d:
        save_job(job, d)
        job2 = load_job(d)
        for a, b in zip(jax.tree_util.tree_leaves(job.state.batch_stats),
                        jax.tree_util.tree_leaves(job2.state.batch_stats)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6)
        # eval outputs identical (uses running BN stats)
        from joint_vae_tpu.models.evaluate import evaluate
        o1 = evaluate(job.model, job.state.variables, x, y,
                      rng=jax.random.PRNGKey(1),
                      sigma_state=job.state.sigma_state, train=False)
        o2 = evaluate(job2.model, job2.state.variables, x, y,
                      rng=jax.random.PRNGKey(1),
                      sigma_state=job2.state.sigma_state, train=False)
        np.testing.assert_allclose(np.asarray(o1.losses['total']),
                                   np.asarray(o2.losses['total']), rtol=1e-5)

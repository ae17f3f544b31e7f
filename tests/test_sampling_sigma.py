"""Tests for reparameterized sampling (L+1, eps0=0) and sigma modes."""

import numpy as np

import jax
import jax.numpy as jnp

from joint_vae_tpu.ops.sampling import reparameterize, draw_epsilon
from joint_vae_tpu.ops.sigma import (
    SigmaConfig, init_sigma_state, sigma_value, update_sigma_rmse,
    update_sigma_coded)


def test_sample_zero_is_mean():
    key = jax.random.PRNGKey(0)
    mu = jnp.arange(12, dtype=jnp.float32).reshape(3, 4)
    lv = jnp.zeros((3, 4))
    z, eps = reparameterize(key, mu, lv, sampling_size=5)
    assert z.shape == (6, 3, 4)
    assert eps.shape == (5, 3, 4)
    np.testing.assert_allclose(np.asarray(z[0]), np.asarray(mu))
    assert np.abs(np.asarray(z[1:]) - np.asarray(mu)).sum() > 0


def test_sampling_disabled_returns_mean():
    z, _ = reparameterize(jax.random.PRNGKey(1), jnp.ones((2, 3)), jnp.zeros((2, 3)),
                          sampling_size=2, is_sampled=False)
    np.testing.assert_allclose(np.asarray(z), 1.0)


def test_uniform_epsilon_unit_variance():
    eps = draw_epsilon(jax.random.PRNGKey(2), (20000,), 1, 'uniform')
    e = np.asarray(eps[1])
    assert abs(e.var() - 1.0) < 0.05
    assert abs(e.mean()) < 0.05
    assert np.abs(e).max() <= np.sqrt(3) + 1e-5


def test_sigma_constant():
    cfg = SigmaConfig(value=0.5)
    st = init_sigma_state(cfg)
    assert not cfg.is_log and not cfg.learned
    np.testing.assert_allclose(float(sigma_value(cfg, st)), 0.5, rtol=1e-6)
    # no decay => update only records rmse
    st2 = update_sigma_rmse(cfg, st, jnp.array(0.1))
    np.testing.assert_allclose(np.asarray(st2.data), np.asarray(st.data))
    np.testing.assert_allclose(float(st2.rmse), 0.1)


def test_sigma_learned_is_log():
    cfg = SigmaConfig(value=0.2, learned=True)
    assert cfg.is_log
    st = init_sigma_state(cfg)
    np.testing.assert_allclose(float(sigma_value(cfg, st)), 0.2, rtol=1e-5)


def test_sigma_rmse_tracks():
    cfg = SigmaConfig(is_rmse=True)
    assert cfg.decay == 1.0 and cfg.reach == 1.0
    st = init_sigma_state(cfg)
    st = update_sigma_rmse(cfg, st, jnp.array(0.7))
    np.testing.assert_allclose(np.asarray(st.data), 0.7, rtol=1e-6)


def test_sigma_decay_with_max_step():
    cfg = SigmaConfig(value=1.0, decay=0.5, reach=2.0, max_step=0.1)
    st = init_sigma_state(cfg)
    st = update_sigma_rmse(cfg, st, jnp.array(1.0))  # delta = .5*(2-1)=.5 -> clip .1
    np.testing.assert_allclose(np.asarray(st.data), 1.1, rtol=1e-6)


def test_sigma_coded_dims():
    cfg = SigmaConfig(input_dim=(3, 32, 32))
    assert cfg.coded and cfg.learned and cfg.is_log
    assert cfg.output_dim == (1, 1, 1)
    cfg2 = SigmaConfig(input_dim=(3, 8, 8), sdim=3 * 8 * 8)
    assert cfg2.output_dim == (3, 8, 8)
    st = update_sigma_coded(cfg, init_sigma_state(cfg), jnp.full((5, 1, 1, 1), 2.0))
    np.testing.assert_allclose(np.asarray(st.data), 2.0)


def test_per_dim_sigma_cli_and_evaluate():
    """--sigma-per-dim and the learned--<init> form (ref train.py:139-154):
    per-dim sigma trains/evaluates with the gaussian NLL broadcast over the
    image shape."""
    import jax
    import numpy as np
    import jax.numpy as jnp
    from joint_vae_tpu.utils.parameters import (get_args,
                                                model_config_from_args)
    from joint_vae_tpu.save_load.jobs import new_job
    from joint_vae_tpu.train.optimizers import OptimizerConfig
    from joint_vae_tpu.models.evaluate import evaluate

    args = get_args(['--dataset', 'mnist', '--type', 'vae', '--sigma',
                     'learned--0.5', '--sigma-per-dim', '-K', '8',
                     '--encoder', '16', '--decoder', '16'], 'train')
    cfg = model_config_from_args(args)
    assert cfg.sigma_cfg.sdim == 784 and cfg.sigma_cfg.learned
    job = new_job(cfg, OptimizerConfig(lr=1e-3), key=jax.random.PRNGKey(0))
    assert job.state.params['sigma_param'].shape == (784,)
    # init value respected (log-space param)
    np.testing.assert_allclose(
        np.exp(np.asarray(job.state.params['sigma_param'][0])), 0.5,
        rtol=1e-6)
    x = jnp.asarray(np.random.default_rng(0)
                    .random((2, *cfg.input_shape)).astype(np.float32))
    out = evaluate(job.model, job.state.variables, x, None,
                   rng=jax.random.PRNGKey(1),
                   sigma_state=job.state.sigma_state, train=False, L=2)
    assert np.isfinite(float(jnp.mean(out.losses['total'])))

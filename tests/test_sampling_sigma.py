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

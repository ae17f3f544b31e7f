"""Golden-value tests for the three prior families vs independent numpy math."""

import math

import numpy as np

import jax
import jax.numpy as jnp

from joint_vae_tpu.ops.priors import (
    PriorConfig, build_prior_config, init_prior_params,
    prior_kl, prior_log_density, mahala, trainable_mask)

RNG = np.random.default_rng(1)
KEY = jax.random.PRNGKey(0)


def _np_gauss_kl(mu, log_var, mean, inv_var_diag, log_det_prior, dim):
    var = np.exp(log_var)
    trace = (var * inv_var_diag).sum(-1)
    log_det = log_var.sum(-1)
    dist = (((mu - mean) ** 2) * inv_var_diag).sum(-1)
    var_kl = trace - log_det + log_det_prior - dim
    return 0.5 * (dist + var_kl), dist, var_kl


def test_gaussian_kl_scalar_standard_normal():
    # standard normal prior: KL = 0.5 * (||mu||^2 + sum(var - logvar - 1))
    K, N = 8, 16
    cfg = PriorConfig(dim=K)
    params = init_prior_params(cfg, KEY)
    mu = RNG.normal(size=(N, K)).astype(np.float32)
    lv = RNG.normal(size=(N, K)).astype(np.float32) * 0.3

    out = prior_kl(cfg, params, jnp.array(mu), jnp.array(lv))
    want = 0.5 * ((mu ** 2).sum(-1) + (np.exp(lv) - lv - 1).sum(-1))
    np.testing.assert_allclose(np.asarray(out['kl']), want, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out['distance']), (mu ** 2).sum(-1), rtol=1e-5)


def test_gaussian_kl_diag_closed_form():
    K, N = 6, 5
    cfg = PriorConfig(dim=K, var_dim='diag')
    params = init_prior_params(cfg, KEY)
    p = RNG.uniform(0.5, 2.0, size=(K,)).astype(np.float32)  # inverse stds
    params = dict(params, var_param=jnp.array(p))
    mu = RNG.normal(size=(N, K)).astype(np.float32)
    lv = RNG.normal(size=(N, K)).astype(np.float32) * 0.2

    inv_var = p ** 2
    ldp = float(np.log(1 / inv_var).sum())
    want_kl, want_d, want_v = _np_gauss_kl(mu, lv, params['mean'][0], inv_var, ldp, K)
    out = prior_kl(cfg, params, jnp.array(mu), jnp.array(lv))
    np.testing.assert_allclose(np.asarray(out['kl']), want_kl, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out['var_kl']), want_v, rtol=1e-4)


def test_gaussian_full_log_density_vs_scipy_style():
    K, N = 4, 7
    cfg = PriorConfig(dim=K, var_dim='full')
    params = init_prior_params(cfg, KEY)
    M = np.tril(RNG.normal(size=(K, K))).astype(np.float32)
    M[np.arange(K), np.arange(K)] = np.abs(M[np.arange(K), np.arange(K)]) + 0.5
    params = dict(params, var_param=jnp.array(M))
    z = RNG.normal(size=(N, K)).astype(np.float32)

    inv_var = M.T @ M          # Sigma^-1
    sigma = np.linalg.inv(inv_var)
    mean = np.asarray(params['mean'][0])
    diff = z - mean
    want = (-0.5 * K * np.log(2 * np.pi)
            - 0.5 * np.einsum('ni,ij,nj->n', diff, inv_var, diff)
            - 0.5 * np.linalg.slogdet(sigma)[1])
    got = np.asarray(prior_log_density(cfg, params, jnp.array(z)))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_conditional_all_classes_matches_gather():
    K, N, C = 5, 9, 4
    cfg = PriorConfig(dim=K, num_priors=C, var_dim='diag', init_mean=1.0)
    params = init_prior_params(cfg, jax.random.PRNGKey(3))
    params = dict(params,
                  var_param=jnp.array(RNG.uniform(0.5, 2, size=(C, K)).astype(np.float32)))
    mu = jnp.array(RNG.normal(size=(N, K)).astype(np.float32))
    lv = jnp.array(RNG.normal(size=(N, K)).astype(np.float32) * 0.2)

    all_out = prior_kl(cfg, params, mu, lv, all_classes=True)
    assert all_out['kl'].shape == (C, N)
    for c in range(C):
        y = jnp.full((N,), c, jnp.int32)
        g = prior_kl(cfg, params, mu, lv, y=y)
        np.testing.assert_allclose(np.asarray(all_out['kl'][c]),
                                   np.asarray(g['kl']), rtol=1e-5)

    z = jnp.array(RNG.normal(size=(3, N, K)).astype(np.float32))
    all_ld = prior_log_density(cfg, params, z, all_classes=True)
    assert all_ld.shape == (C, 3, N)
    for c in range(C):
        y = jnp.full((3, N), c, jnp.int32)
        np.testing.assert_allclose(np.asarray(all_ld[c]),
                                   np.asarray(prior_log_density(cfg, params, z, y=y)),
                                   rtol=1e-4, atol=1e-4)


def test_tilted_kl_and_density():
    K, N, C, tau = 6, 8, 3, 25.0
    cfg = build_prior_config(K, 'tilted', num_priors=C, tau=tau, init_mean=2.0)
    assert cfg.var_dim == 'scalar'
    params = init_prior_params(cfg, KEY)
    mu = RNG.normal(size=(N, K)).astype(np.float32)
    lv = np.zeros((N, K), np.float32)
    y = RNG.integers(0, C, size=(N,))

    out = prior_kl(cfg, params, jnp.array(mu), jnp.array(lv), y=jnp.array(y))
    mean = np.asarray(params['mean'])[y]
    mu_norm = np.sqrt(((mu - mean) ** 2).sum(-1))
    np.testing.assert_allclose(np.asarray(out['kl']),
                               0.5 * (mu_norm - tau) ** 2, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out['var_kl']), 0.0, atol=1e-7)

    z = RNG.normal(size=(N, K)).astype(np.float32)
    ld = np.asarray(prior_log_density(cfg, params, jnp.array(z), y=jnp.array(y)))
    want = (-0.5 * K * np.log(2 * np.pi) - 0.5 * ((z - mean) ** 2).sum(-1)
            - np.sqrt((z ** 2).sum(-1)))
    np.testing.assert_allclose(ld, want, rtol=1e-4)


def test_uniform_prior_formulas():
    K, N, tau = 4, 6, 5.0
    cfg = build_prior_config(K, 'uniform', tau=tau)
    params = init_prior_params(cfg, KEY)
    phi = 0.5 * (1 + math.erf(tau / math.sqrt(2)))
    alpha = math.log(2 * tau) - math.log(2 * phi - 1)
    np.testing.assert_allclose(cfg.uniform_log_rho, alpha, rtol=1e-12)

    # log density: -alpha inside [-tau, tau], gaussian tail outside
    z = np.array([[0.0, 1.0, 6.0, -7.0]] * N, np.float32)[:, :K]
    ld = np.asarray(prior_log_density(cfg, params, jnp.array(z)))
    c = np.log(2 * np.pi)
    per = np.where(np.abs(z) > tau, -c / 2 - z ** 2 / 2, -alpha)
    np.testing.assert_allclose(ld, per.sum(-1), rtol=1e-5)

    # KL replication in numpy (ref module/priors.py:429-476)
    mu = RNG.normal(size=(N, K)).astype(np.float32)
    lv = (RNG.normal(size=(N, K)) * 0.3).astype(np.float32)
    out = prior_kl(cfg, params, jnp.array(mu), jnp.array(lv))
    span = 2 * np.sqrt(3) * np.exp(0.5 * lv)
    mu_c = mu - np.asarray(params['mean'][0])
    dist = mu_c ** 2
    a_, b_ = np.clip(mu_c - span / 2, -tau, tau), np.clip(mu_c + span / 2, -tau, tau)
    elogq = -0.5 * lv - 0.5 * np.log(12)
    negr = (c + dist + span ** 2 / 12) / 2
    negr += (alpha - c / 2) * (b_ - a_) / span
    negr -= (b_ ** 3 - a_ ** 3) / span / 6
    var_kl = (elogq + alpha).sum(-1)
    want_kl = np.maximum(elogq.sum(-1) + negr.sum(-1), var_kl)
    np.testing.assert_allclose(np.asarray(out['kl']), want_kl, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out['var_kl']), 2 * var_kl, rtol=1e-4)


def test_init_and_masks():
    cfg = PriorConfig(dim=10, num_priors=4, init_mean='onehot',
                      learned_means=True, var_dim='full')
    params = init_prior_params(cfg, KEY)
    assert params['mean'].shape == (4, 10)
    np.testing.assert_allclose(np.asarray(params['mean'][:4, :4]), np.eye(4))
    assert params['var_param'].shape == (4, 10, 10)
    assert trainable_mask(cfg) == {'mean': True, 'var_param': True}
    assert trainable_mask(PriorConfig(dim=3)) == {'mean': False, 'var_param': False}

    d = mahala(cfg, params, jnp.zeros((2, 10)), y=jnp.array([0, 1]))
    np.testing.assert_allclose(np.asarray(d), 1.0, rtol=1e-5)

"""Prior-family math parity against the reference's own Prior classes,
executed as an oracle (module/priors.py:35-499) on shared parameter values.

Covers KL components and log-densities for the three families, the
scalar/diag/full variance parameterizations, conditional and unconditional
means, the built-label all-classes expansion, and Mahalanobis distances.
"""

import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from joint_vae_tpu.ops.priors import (build_prior_config, init_prior_params,
                                      prior_kl, prior_log_density, mahala)

torch = pytest.importorskip('torch')

K, C, N = 8, 10, 6
RNG = np.random.default_rng(11)


@pytest.fixture(scope='module')
def ref_priors():
    sys.path.insert(0, '/root/reference')
    try:
        from module.priors import build_prior
    finally:
        sys.path.remove('/root/reference')
    return build_prior


def _pair(ref_build, dist, var_dim='scalar', num_priors=C, tau=None,
          randomize_var=False):
    """(reference prior, our (cfg, params)) with identical parameters."""
    kw = {}
    if tau is not None:
        kw['tau'] = tau
    ref = ref_build(K, dist, num_priors=num_priors, var_dim=var_dim,
                    init_mean=1.0,
                    learned_means=num_priors > 1, **kw)
    if randomize_var:
        with torch.no_grad():
            v = ref._var_parameter
            if var_dim == 'diag':
                v.copy_(torch.tensor(RNG.uniform(0.5, 2.0, v.shape)))
            elif var_dim == 'full':
                t = RNG.uniform(0.2, 1.0, v.shape)
                t = np.tril(t) + 2.0 * np.eye(K)
                v.copy_(torch.tensor(t))
            else:
                v.fill_(1.7)
    cfg = build_prior_config(K, dist, num_priors=num_priors,
                             var_dim=var_dim, init_mean=1.0,
                             learned_means=num_priors > 1, **kw)
    params = init_prior_params(cfg, jax.random.PRNGKey(0))
    params = {'mean': jnp.asarray(ref.mean.detach().numpy()),
              'var_param': jnp.asarray(
                  ref._var_parameter.detach().numpy(), jnp.float32)
              if hasattr(ref, '_var_parameter')
              else params['var_param']}
    return ref, cfg, params


def _mu_lv():
    mu = RNG.normal(0, 1.5, (N, K)).astype(np.float32)
    lv = (RNG.normal(0, 0.4, (N, K))).astype(np.float32)
    y = RNG.integers(0, C, N).astype(np.int64)
    return mu, lv, y


@pytest.mark.parametrize('var_dim', ['scalar', 'diag', 'full'])
def test_gaussian_conditional_kl(ref_priors, var_dim):
    ref, cfg, params = _pair(ref_priors, 'gaussian', var_dim,
                             randomize_var=var_dim != 'scalar')
    mu, lv, y = _mu_lv()
    want = ref.kl(torch.tensor(mu), torch.tensor(lv), torch.tensor(y))
    got = prior_kl(cfg, params, jnp.asarray(mu), jnp.asarray(lv),
                   y=jnp.asarray(y))
    for k in ('kl', 'distance', 'var_kl', 'trace', 'log_det'):
        np.testing.assert_allclose(np.asarray(got[k]),
                                   want[k].detach().numpy(),
                                   rtol=2e-4, atol=2e-4, err_msg=k)


def test_gaussian_unconditional(ref_priors):
    ref, cfg, params = _pair(ref_priors, 'gaussian', 'scalar', num_priors=1)
    mu, lv, _ = _mu_lv()
    want = ref.kl(torch.tensor(mu), torch.tensor(lv), None)
    got = prior_kl(cfg, params, jnp.asarray(mu), jnp.asarray(lv))
    np.testing.assert_allclose(np.asarray(got['kl']),
                               want['kl'].detach().numpy(), rtol=2e-4)
    z = RNG.normal(0, 1, (N, K)).astype(np.float32)
    want_ld = ref.log_density(torch.tensor(z), None)
    got_ld = prior_log_density(cfg, params, jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(got_ld),
                               want_ld.detach().numpy(), rtol=2e-4)


@pytest.mark.parametrize('dist,tau', [('gaussian', None), ('tilted', 25.0),
                                      ('uniform', 5.0)])
def test_conditional_kl_and_density(ref_priors, dist, tau):
    ref, cfg, params = _pair(ref_priors, dist, 'scalar', tau=tau)
    mu, lv, y = _mu_lv()
    want = ref.kl(torch.tensor(mu), torch.tensor(lv), torch.tensor(y))
    got = prior_kl(cfg, params, jnp.asarray(mu), jnp.asarray(lv),
                   y=jnp.asarray(y))
    for k in want:
        if k not in got:
            continue
        np.testing.assert_allclose(np.asarray(got[k]),
                                   want[k].detach().numpy(),
                                   rtol=3e-4, atol=3e-4,
                                   err_msg='{} {}'.format(dist, k))
    z = RNG.normal(0, 2.0, (N, K)).astype(np.float32)
    want_ld = ref.log_density(torch.tensor(z), torch.tensor(y))
    got_ld = prior_log_density(cfg, params, jnp.asarray(z),
                               y=jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(got_ld),
                               want_ld.detach().numpy(),
                               rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize('dist,tau', [('gaussian', None), ('tilted', 25.0),
                                      ('uniform', 5.0)])
def test_all_classes_expansion(ref_priors, dist, tau):
    """Our all_classes path == the reference's built-label expand trick
    (kl recursion on y.ndim == mu.ndim, priors.py:263-267)."""
    ref, cfg, params = _pair(ref_priors, dist, 'scalar', tau=tau)
    mu, lv, _ = _mu_lv()
    y_built = np.tile(np.arange(C)[:, None], (1, N))        # (C, N)
    want = ref.kl(torch.tensor(mu), torch.tensor(lv),
                  torch.tensor(y_built))
    got = prior_kl(cfg, params, jnp.asarray(mu), jnp.asarray(lv),
                   all_classes=True)
    np.testing.assert_allclose(np.asarray(got['kl']),
                               want['kl'].detach().numpy(),
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(got['distance']),
                               want['distance'].detach().numpy(),
                               rtol=3e-4, atol=3e-4)


def test_mahala_full_var(ref_priors):
    ref, cfg, params = _pair(ref_priors, 'gaussian', 'full',
                             randomize_var=True)
    mu, _, y = _mu_lv()
    want = ref.mahala(torch.tensor(mu), torch.tensor(y))
    got = mahala(cfg, params, jnp.asarray(mu), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                               rtol=2e-4, atol=2e-4)

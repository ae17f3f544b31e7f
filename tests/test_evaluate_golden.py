"""Integration golden test: re-derive every loss the evaluation engine
produces from the raw forward tensors using an independent numpy
implementation of the reference formulas (cvae.py:523-917,
module/priors.py:252-342, module/losses.py).

Catches loss-assembly/wiring bugs that per-component tests cannot."""

import numpy as np

import jax
import jax.numpy as jnp

from joint_vae_tpu.models.cvnet import CVNet, CVNetConfig
from joint_vae_tpu.models.evaluate import evaluate
from joint_vae_tpu.ops.priors import PriorConfig
from joint_vae_tpu.ops.sigma import SigmaConfig, init_sigma_state

INPUT_SHAPE = (1, 5, 5)
C, N, K, L = 4, 7, 6, 3
SIGMA = 0.4
BETA = 1.0

RNG = np.random.default_rng(11)


def _setup():
    cfg = CVNetConfig(
        input_shape=INPUT_SHAPE, num_labels=C, type='cvae',
        encoder=(12,), decoder=(12,), classifier=(8,), latent_dim=K,
        latent_sampling=L, test_latent_sampling=L, gamma=7.0, beta=BETA,
        sigma=SigmaConfig(value=SIGMA),
        prior=PriorConfig(dim=K, num_priors=C, init_mean=1.5))
    model = CVNet(cfg)
    x = jnp.asarray(RNG.uniform(0, 1, (N, *INPUT_SHAPE)).astype(np.float32))
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'sampling': jax.random.PRNGKey(1)}, x, None)
    return model, variables, x


def test_label_free_cvae_losses_match_reference_formulas():
    model, variables, x = _setup()
    st = init_sigma_state(model.cfg.sigma_cfg)
    out = evaluate(model, variables, x, None, rng=jax.random.PRNGKey(2),
                   sigma_state=st, train=False)

    mu = np.asarray(out.mu, np.float64)              # (N, K)
    lv = np.asarray(out.log_var, np.float64)         # (N, K)
    z = np.asarray(out.z, np.float64)                # (L+1, N, K)
    x_reco = np.asarray(out.x_reco, np.float64)      # (L+1, N, 1, 5, 5)
    xn = np.asarray(x, np.float64)
    mean = np.asarray(variables['params']['prior']['mean'], np.float64)
    D = np.prod(INPUT_SHAPE)

    # --- wmse / cross_x (ref cvae.py:648-652, 773-775) ---
    wmse_l = (((x_reco[1:] - xn[None]) / SIGMA) ** 2).mean(axis=(-1, -2, -3))
    wmse = wmse_l.mean(0)
    np.testing.assert_allclose(np.asarray(out.losses['wmse']), wmse, rtol=1e-4)
    cross_x = D / 2 * (wmse + np.log(2 * np.pi)) + D * np.log(SIGMA)
    np.testing.assert_allclose(np.asarray(out.losses['cross_x']), cross_x,
                               rtol=1e-4)

    # --- gaussian conditional KL, every class (ref priors.py:252-326) ---
    var = np.exp(lv)
    dist = ((mu[None] - mean[:, None]) ** 2).sum(-1)          # (C, N)
    trace = var.sum(-1)[None]                                 # prior var = 1
    var_kl = trace - lv.sum(-1)[None] + 0.0 - K
    kl = 0.5 * (dist + var_kl)
    np.testing.assert_allclose(np.asarray(out.losses['kl']), kl, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.losses['zdist']), dist, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.losses['var_kl']),
                               np.broadcast_to(var_kl, (C, N)), rtol=1e-4)

    # --- IWAE (ref cvae.py:679-870) ---
    eps = (z[1:] - mu[None]) / np.exp(0.5 * lv)[None]
    eps_norm = (eps ** 2).sum(-1)                              # (L, N)
    log_px = -D / 2 * (wmse_l + np.log(2 * np.pi)) - D * np.log(SIGMA)
    zc = z[1:, None] - mean[None, :, None]                     # (L, C, N, K)
    log_pzy = (-K / 2 * np.log(2 * np.pi) - 0.5 * (zc ** 2).sum(-1))
    log_inv_q = 0.5 * (eps_norm + lv.sum(-1)[None]) + K / 2 * np.log(2 * np.pi)
    liw = log_px[:, None] + log_pzy + log_inv_q[:, None]       # (L, C, N)
    m = liw.max(0)
    iws = np.exp(liw - m[None]).mean(0) + m                    # ref quirk
    np.testing.assert_allclose(np.asarray(out.losses['iws']), iws,
                               rtol=1e-4, atol=1e-4)

    # --- cross_y: -log(softmax+1e-6) avg over samples 1: (losses.py:62-71) ---
    logits_all = model.apply(
        variables, jnp.asarray(z.astype(np.float32)),
        method=lambda mdl, zz: mdl.classify(zz))
    la = np.asarray(logits_all, np.float64)                    # (L+1, N, C)
    sm = np.exp(la) / np.exp(la).sum(-1, keepdims=True)
    cross_y = np.moveaxis(-np.log(sm + 1e-6)[1:].mean(0), -1, 0)
    np.testing.assert_allclose(np.asarray(out.losses['cross_y']), cross_y,
                               rtol=1e-3, atol=1e-5)

    # --- total: cross_x + beta*kl, NO cross_y at eval (cvae.py:744-902) ---
    total = cross_x[None] + BETA * kl
    np.testing.assert_allclose(np.asarray(out.losses['total']), total,
                               rtol=1e-4)

    # --- dzdist (cvae.py:747-754) ---
    dict_mean = mean.mean(0)
    dz = ((mu - dict_mean) ** 2).sum(-1) + ((mean ** 2).sum(1).mean()
                                            - (dict_mean ** 2).sum())
    np.testing.assert_allclose(np.asarray(out.losses['dzdist']), dz, rtol=1e-4)


def test_train_mode_total_includes_gamma_cross_y():
    model, variables, x = _setup()
    st = init_sigma_state(model.cfg.sigma_cfg)
    y = jnp.asarray(RNG.integers(0, C, N).astype(np.int32))
    out = evaluate(model, variables, x, y, rng=jax.random.PRNGKey(3),
                   sigma_state=st, train=True, with_beta=True,
                   gamma_weighting=0.5)
    want = (np.asarray(out.losses['cross_x'])
            + 0.5 * 7.0 * np.asarray(out.losses['cross_y'])
            + BETA * np.asarray(out.losses['kl']))
    np.testing.assert_allclose(np.asarray(out.losses['total']), want,
                               rtol=1e-5)


def test_xvae_y_coded_iws_alignment():
    """xvae per-class eval: inputs expand along C before the encoder; verify
    the (L, C, N) IWAE axis algebra against a manual recomputation."""
    C2, N2, K2, L2 = 3, 5, 4, 2
    cfg = CVNetConfig(
        input_shape=INPUT_SHAPE, num_labels=C2, type='xvae', y_is_coded=True,
        encoder=(10,), decoder=(10,), classifier=(6,), latent_dim=K2,
        latent_sampling=L2, test_latent_sampling=L2, gamma=1.0, beta=1.0,
        sigma=SigmaConfig(value=SIGMA),
        prior=PriorConfig(dim=K2, num_priors=C2, init_mean=1.0))
    model = CVNet(cfg)
    x = jnp.asarray(RNG.uniform(0, 1, (N2, *INPUT_SHAPE)).astype(np.float32))
    variables = model.init({'params': jax.random.PRNGKey(4),
                            'sampling': jax.random.PRNGKey(5)},
                           x, jnp.zeros(N2, jnp.int32))
    st = init_sigma_state(cfg.sigma_cfg)
    out = evaluate(model, variables, x, None, rng=jax.random.PRNGKey(6),
                   sigma_state=st, train=False)

    z = np.asarray(out.z, np.float64)              # (L+1, C, N, K)
    mu = np.asarray(out.mu, np.float64)            # (C, N, K)
    lv = np.asarray(out.log_var, np.float64)
    x_reco = np.asarray(out.x_reco, np.float64)    # (L+1, C, N, ...)
    mean = np.asarray(variables['params']['prior']['mean'], np.float64)
    D = np.prod(INPUT_SHAPE)
    xn = np.asarray(x, np.float64)

    assert z.shape == (L2 + 1, C2, N2, K2)
    wmse_l = (((x_reco[1:] - xn[None, None]) / SIGMA) ** 2).mean(
        axis=(-1, -2, -3))                          # (L, C, N)
    log_px = -D / 2 * (wmse_l + np.log(2 * np.pi)) - D * np.log(SIGMA)
    zc = z[1:] - mean[None, :, None]                # (L, C, N, K)
    log_pzy = -K2 / 2 * np.log(2 * np.pi) - 0.5 * (zc ** 2).sum(-1)
    eps = (z[1:] - mu[None]) / np.exp(0.5 * lv)[None]
    log_inv_q = (0.5 * ((eps ** 2).sum(-1) + lv.sum(-1)[None])
                 + K2 / 2 * np.log(2 * np.pi))
    liw = log_px + log_pzy + log_inv_q
    m = liw.max(0)
    want_iws = np.exp(liw - m[None]).mean(0) + m
    np.testing.assert_allclose(np.asarray(out.losses['iws']), want_iws,
                               rtol=1e-4, atol=1e-4)
    # total = cross_x + gamma*cross_y + kl: xvae includes cross_y even at
    # eval (cross_y_weight is unconditional for non-cvae/vae, ref
    # cvae.py:557-562)
    var = np.exp(lv)
    dist = ((mu - mean[:, None]) ** 2).sum(-1)
    var_kl = var.sum(-1) - lv.sum(-1) - K2
    kl = 0.5 * (dist + var_kl)
    cross_x = D / 2 * (wmse_l.mean(0) + np.log(2 * np.pi)) + D * np.log(SIGMA)
    cross_y = np.asarray(out.losses['cross_y'])
    np.testing.assert_allclose(np.asarray(out.losses['total']),
                               cross_x + 1.0 * cross_y + kl, rtol=1e-4)

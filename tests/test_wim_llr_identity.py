"""Analytic structure of the WIM LLR (k@) family for Gaussian priors.

When BOTH the original and the alternate prior are Gaussian with the same
(co)variance — the WIM default: a frozen unit-variance prior plus a frozen
mean-shifted unit-variance alternate (ref ft/wim.py:95-105) — the three
LLR scores collapse to positive multiples of ONE discriminator:

    kl − kl@     = ½ (zdist − zdist@)          (var_kl twin-invariant,
                                                ops/priors.py _gaussian_kl)
    total − total@ = β (kl − kl@)              (reconstruction + CE cancel;
                                                β = 1 at eval time, where
                                                with_beta=False)

so  kl@-score == zdist@-score == elbo@-score  exactly at eval time, and
all three produce the SAME ROC/AUROC.  docs/QUALITY.md uses this to
interpret the WIM-inversion study (scripts/wim_inversion_study.py): on a
Gaussian-prior VAE there is only one LLR method, not three.

The identity is Gaussian-specific: with a tilted original prior (the
reference's sota.csv headline config, ref config.ini [tilted]) the kl is
½(‖µ‖−τ)² (ops/priors.py _tilted_kl) and the collapse breaks — asserted
below as the contrast case.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from joint_vae_tpu.ft.wim import WIMJob, wim_measures
from joint_vae_tpu.models.cvnet import CVNetConfig
from joint_vae_tpu.ops.priors import PriorConfig
from joint_vae_tpu.ops.sigma import SigmaConfig
from joint_vae_tpu.save_load.jobs import new_job
from joint_vae_tpu.train.optimizers import OptimizerConfig

INPUT_SHAPE = (1, 6, 6)
BETA = 0.5


def _twin_losses(prior_kwargs, alt_kwargs, n=32, seed=0):
    cfg = CVNetConfig(input_shape=INPUT_SHAPE, num_labels=1, type='vae',
                      encoder=(16,), decoder=(16,), latent_dim=4,
                      latent_sampling=1, test_latent_sampling=4,
                      gamma=0.0, beta=BETA, sigma=SigmaConfig(value=0.3),
                      prior=PriorConfig(dim=4, **prior_kwargs))
    job = new_job(cfg, OptimizerConfig(lr=1e-3), key=jax.random.PRNGKey(0))
    wim = WIMJob(job=job)
    wim.set_alternate_prior(key=jax.random.PRNGKey(7), **alt_kwargs)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(0, 1, (n, *INPUT_SHAPE)).astype(np.float32))
    _, _, losses, _ = wim.evaluate_on_both_priors(
        {'params': job.state.params}, x, rng=jax.random.PRNGKey(3),
        sigma_state=job.state.sigma_state)
    return cfg, {k: np.asarray(v, np.float64) for k, v in losses.items()}


def test_gaussian_llr_scores_collapse():
    cfg, lo = _twin_losses({}, dict(init_mean=3.0, num_priors=1))
    d_kl = lo['kl'] - lo['kl@']
    d_zdist = lo['zdist'] - lo['zdist@']
    d_total = lo['total'] - lo['total@']
    np.testing.assert_allclose(d_kl, 0.5 * d_zdist, rtol=1e-5, atol=1e-6)
    # eval-time total is cross_x + 1.0 * kl (with_beta=False), so the
    # reconstruction term cancels and d_total == d_kl
    np.testing.assert_allclose(d_total, d_kl, rtol=1e-4,
                               atol=2e-3 * np.abs(lo['total']).max())

    # the three wim_measures LLRs coincide -> same ROC
    m = wim_measures(cfg, {k: jnp.asarray(v) for k, v in lo.items()},
                     ['kl@', 'zdist@', 'elbo@'])
    kl_s = np.asarray(m['kl@'], np.float64)
    np.testing.assert_allclose(np.asarray(m['zdist@'], np.float64), kl_s,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m['elbo@'], np.float64), kl_s,
                               rtol=1e-4,
                               atol=2e-3 * np.abs(lo['total']).max())
    # and identical sample rankings (== identical ROC curves)
    assert (np.argsort(kl_s) == np.argsort(
        np.asarray(m['zdist@'], np.float64))).all()


def test_tilted_prior_breaks_the_collapse():
    cfg, lo = _twin_losses(dict(distribution='tilted', tau=2.0),
                           dict(init_mean=3.0, num_priors=1))
    m = wim_measures(cfg, {k: jnp.asarray(v) for k, v in lo.items()},
                     ['kl@', 'zdist@'])
    kl_s = np.asarray(m['kl@'], np.float64)
    zd_s = np.asarray(m['zdist@'], np.float64)
    assert not np.allclose(kl_s, zd_s, rtol=1e-3), \
        'tilted original prior should decouple kl@ from zdist@'
    # rankings genuinely differ, not just a scale change
    assert (np.argsort(kl_s) != np.argsort(zd_s)).any()

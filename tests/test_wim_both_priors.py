"""WIMJob.evaluate_on_both_priors produces the @-suffixed loss twins with
the right shapes (the context-manager behavior of ref ft/wim.py:114-130)."""

import pytest

pytestmark = pytest.mark.slow

import numpy as np

import jax
import jax.numpy as jnp

from joint_vae_tpu.ft.wim import WIMJob
from joint_vae_tpu.models.cvnet import CVNetConfig
from joint_vae_tpu.ops.priors import PriorConfig
from joint_vae_tpu.ops.sigma import SigmaConfig
from joint_vae_tpu.save_load.jobs import new_job


def test_both_priors_loss_twins():
    C, N, K = 3, 6, 4
    cfg = CVNetConfig(input_shape=(1, 6, 6), num_labels=C, type='cvae',
                      encoder=(12,), decoder=(12,), classifier=(6,),
                      latent_dim=K, latent_sampling=1, test_latent_sampling=2,
                      gamma=10.0, beta=1.0, sigma=SigmaConfig(value=0.3),
                      prior=PriorConfig(dim=K, num_priors=C, init_mean=1.0))
    job = new_job(cfg, key=jax.random.PRNGKey(0))
    wim = WIMJob(job=job)
    wim.set_alternate_prior(init_mean=5.0, num_priors=1)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (N, 1, 6, 6)).astype(np.float32))
    x_reco, logits, losses, measures = wim.evaluate_on_both_priors(
        job.state.variables, x, rng=jax.random.PRNGKey(1),
        sigma_state=job.state.sigma_state)

    # original-prior losses per class; alternate-prior twins unconditional
    assert losses['kl'].shape == (C, N)
    assert losses['kl@'].shape == (N,)
    assert losses['total'].shape == (C, N)
    assert losses['total@'].shape == (N,)
    # cross_x identical under both priors (same reconstruction)
    np.testing.assert_allclose(np.asarray(losses['cross_x']),
                               np.asarray(losses['cross_x@']), rtol=1e-6)
    # kl against the shifted alternate prior must be much larger
    assert float(losses['kl@'].mean()) > float(losses['kl'].min(0).mean())


def test_wim_methods_through_engine_scoring():
    """needed_components covers the WIM grammar and batch_dist_measures
    delegates k~ / k@ / k~@ to wim_measures (recorder-tier replay of a WIM
    job's records must not crash, and must match direct wim scoring)."""
    import numpy as np
    import jax.numpy as jnp
    from joint_vae_tpu.save_load.dictify import needed_components
    from joint_vae_tpu.ops.scores import batch_dist_measures
    from joint_vae_tpu.ft.wim import wim_measures
    from joint_vae_tpu.models.cvnet import CVNetConfig
    from joint_vae_tpu.ops.priors import PriorConfig
    from joint_vae_tpu.ops.sigma import SigmaConfig

    assert needed_components('kl~') == ['kl', 'y_est_already']
    assert needed_components('kl@') == ['kl', 'kl@']
    assert needed_components('kl~@') == ['kl', 'kl@', 'y_est_already']
    assert needed_components('elbo~@') == ['total', 'total@',
                                           'y_est_already']
    assert needed_components('elbo~') == ['total', 'y_est_already']

    cfg = CVNetConfig(input_shape=(1, 4, 4), num_labels=3, type='cvae',
                      encoder=(8,), decoder=(8,), latent_dim=4,
                      latent_sampling=1, sigma=SigmaConfig(value=0.5),
                      prior=PriorConfig(dim=4, num_priors=3))
    rng = np.random.default_rng(0)
    C, N = 3, 16
    losses = {'kl': jnp.asarray(rng.normal(size=(C, N)).astype(np.float32)),
              'kl@': jnp.asarray(rng.normal(size=(N,)).astype(np.float32)),
              'total': jnp.asarray(rng.normal(size=(C, N))
                                   .astype(np.float32)),
              'total@': jnp.asarray(rng.normal(size=(N,))
                                    .astype(np.float32)),
              'y_est_already': jnp.asarray(rng.integers(0, C, N)
                                           .astype(np.int32))}
    methods = ('kl~', 'kl@', 'kl~@', 'elbo@')
    got = batch_dist_measures(cfg, None, losses, methods)
    want = wim_measures(cfg, losses, list(methods),
                        y_est=losses['y_est_already'])
    for m in methods:
        np.testing.assert_allclose(np.asarray(got[m]), np.asarray(want[m]),
                                   rtol=1e-6)

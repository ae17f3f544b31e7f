"""Regressions for the tenth code-review batch (models/train/ops/serve).

Covers: WIM bn_eval freezing only BatchNorm (dropout stays live), the
Scorer honoring two-sided upper thresholds, and CVNetConfig.from_dict not
mutating the caller's nested sigma dict.
"""

import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np

from joint_vae_tpu.models.cvnet import CVNetConfig
from joint_vae_tpu.ops.priors import PriorConfig
from joint_vae_tpu.ops.sigma import SigmaConfig
from joint_vae_tpu.save_load.jobs import new_job
from joint_vae_tpu.train.optimizers import OptimizerConfig

INPUT_SHAPE = (1, 8, 8)
C = 3


def _job(dropout=0.0):
    cfg = CVNetConfig(input_shape=INPUT_SHAPE, num_labels=C, type='cvae',
                      encoder=(16,), decoder=(16,), classifier=(4,),
                      latent_dim=4, latent_sampling=1, test_latent_sampling=2,
                      gamma=10.0, beta=1e-2, dropout=dropout,
                      sigma=SigmaConfig(value=0.3),
                      prior=PriorConfig(dim=4, num_priors=C))
    return new_job(cfg, OptimizerConfig(lr=1e-3), key=jax.random.PRNGKey(0))


def test_bn_eval_keeps_dropout_live():
    """bn_eval freezes only BatchNorm (ref ft/job.py:98-111); with
    dropout>0 the bn_eval forward must differ from the deterministic eval
    forward given the same rng."""
    from joint_vae_tpu.models.evaluate import evaluate

    job = _job(dropout=0.5)
    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (8, *INPUT_SHAPE)).astype(np.float32))
    y = jnp.zeros(8, jnp.int32)
    k = jax.random.PRNGKey(3)
    wim_out = evaluate(job.model, job.state.variables, x, y, rng=k,
                       sigma_state=job.state.sigma_state, train=True,
                       bn_eval=True)
    det_out = evaluate(job.model, job.state.variables, x, y, rng=k,
                       sigma_state=job.state.sigma_state, train=False,
                       L=job.model_cfg.latent_sampling)
    d = float(jnp.max(jnp.abs(wim_out.mu - det_out.mu)))
    assert d > 1e-6, 'dropout was silently deterministic under bn_eval'
    # and a dropout-free model agrees exactly on mu between the two modes
    job0 = _job(dropout=0.0)
    a = evaluate(job0.model, job0.state.variables, x, y, rng=k,
                 sigma_state=job0.state.sigma_state, train=True,
                 bn_eval=True)
    b = evaluate(job0.model, job0.state.variables, x, y, rng=k,
                 sigma_state=job0.state.sigma_state, train=False,
                 L=job0.model_cfg.latent_sampling)
    np.testing.assert_allclose(np.asarray(a.mu), np.asarray(b.mu),
                               rtol=1e-5, atol=1e-6)


def test_scorer_two_sided_upper_bound():
    from joint_vae_tpu.serve import Scorer, calibrated_thresholds

    job = _job()
    x = np.random.default_rng(1).uniform(
        0, 1, (8, *INPUT_SHAPE)).astype(np.float32)

    def _entry(lo, up):
        return {'tpr': [0.95], 'thresholds': [lo], 'thresholds_up': [up],
                'auc': 0.9, 'fpr': [0.1], 'n': 8}

    # impossible band: everything must be rejected through the upper bound
    job.ood_results = {1: {'noise': {'elbo': _entry(-1e30, -1e29)}}}
    thr = calibrated_thresholds(job, ('elbo',))
    assert thr['elbo'] == (-1e30, -1e29)
    s = Scorer(job, methods=('elbo',))
    out = s(x)
    assert not out['in_distribution'].any()

    # open band accepts
    job.ood_results = {1: {'noise': {'elbo': _entry(-1e30, 1e30)}}}
    s2 = Scorer(job, methods=('elbo',))
    assert s2(x)['in_distribution'].all()


def test_from_dict_does_not_mutate_sigma():
    sigma = {'value': 0.3, 'value_': 0.25, 'input_dim': [1, 8, 8]}
    d = {'input_shape': list(INPUT_SHAPE), 'num_labels': C, 'type': 'cvae',
         'encoder': [8], 'decoder': [8], 'latent_dim': 4, 'sigma': sigma}
    CVNetConfig.from_dict(d)
    assert sigma == {'value': 0.3, 'value_': 0.25, 'input_dim': [1, 8, 8]}, \
        'from_dict mutated the caller dict'

"""ODIN consistency: at eps=0 the perturbed score equals the plain
temperature-scaled max-softmax (baseline-T); xvae per-class OOD engine."""

import numpy as np

import jax
import jax.numpy as jnp

from joint_vae_tpu.data.loaders import ArrayDataset
from joint_vae_tpu.evals.engines import ood_detection_rates
from joint_vae_tpu.evals.odin import make_odin_scores
from joint_vae_tpu.models.cvnet import CVNetConfig
from joint_vae_tpu.models.evaluate import evaluate
from joint_vae_tpu.ops.scores import batch_dist_measures
from joint_vae_tpu.ops.sigma import SigmaConfig
from joint_vae_tpu.save_load.jobs import new_job

INPUT_SHAPE = (1, 6, 6)
C = 3
RNG = np.random.default_rng(1)


def test_odin_eps0_equals_baseline():
    cfg = CVNetConfig(input_shape=INPUT_SHAPE, num_labels=C, type='vib',
                      encoder=(16,), classifier=(8,), latent_dim=4,
                      latent_sampling=2, gamma=1.0, beta=1e-2)
    job = new_job(cfg, key=jax.random.PRNGKey(0))
    x = jnp.asarray(RNG.uniform(0, 1, (12, *INPUT_SHAPE)).astype(np.float32))
    key = jax.random.PRNGKey(3)

    # single-eps grid keeps the batched forward the same shape as the plain
    # one, so the latent sampling stream matches exactly
    odin0 = make_odin_scores(job.model, temps=[10.0], eps_grid=[0.0])
    scores0 = odin0(job.state.variables, x, key)

    out = evaluate(job.model, job.state.variables, x, None, rng=key,
                   sigma_state=job.state.sigma_state, train=False)
    base = batch_dist_measures(cfg, out.logits, dict(out.losses),
                               ['baseline-10'])['baseline-10']
    np.testing.assert_allclose(np.asarray(scores0['odin-10-0.0000']),
                               np.asarray(base), rtol=1e-4, atol=1e-5)

    # full grid: eps moves the score monotonically away from eps=0
    odin = make_odin_scores(job.model, temps=[10.0], eps_grid=[0.0, 0.002])
    scores = odin(job.state.variables, x, key)
    assert np.abs(np.asarray(scores['odin-10-0.0020'])
                  - np.asarray(scores['odin-10-0.0000'])).max() > 0


def test_xvae_ood_engine():
    cfg = CVNetConfig(input_shape=INPUT_SHAPE, num_labels=C, type='xvae',
                      y_is_coded=True, encoder=(16,), decoder=(16,),
                      classifier=(8,), latent_dim=4, latent_sampling=1,
                      test_latent_sampling=2, sigma=SigmaConfig(value=0.3))
    job = new_job(cfg, key=jax.random.PRNGKey(0))
    job.train_history = {'epochs': 1}
    n = 64
    y = RNG.integers(0, C, n).astype(np.int32)
    base = np.linspace(0.2, 0.8, C)[y][:, None, None, None]
    te = ArrayDataset(np.clip(base + 0.05 * RNG.standard_normal(
        (n, *INPUT_SHAPE)), 0, 1).astype(np.float32), y, 'blobs')
    ood = ArrayDataset(RNG.uniform(0, 1, (n, *INPUT_SHAPE)).astype(np.float32),
                       np.zeros(n, np.int32), 'noise')
    res = ood_detection_rates(job, te, [ood], batch_size=32,
                              recording=False)  # xvae methods: max/mean/std
    assert set(res['noise']) == {'max', 'mean', 'std'}
    for m, r in res['noise'].items():
        assert 0.0 <= r['auc'] <= 1.0

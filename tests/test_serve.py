"""Serving scorer: compiled classify + OOD gate with calibrated thresholds."""

import numpy as np

import jax

from joint_vae_tpu.data.loaders import ArrayDataset
from joint_vae_tpu.evals.engines import ood_detection_rates
from joint_vae_tpu.models.cvnet import CVNetConfig
from joint_vae_tpu.ops.sigma import SigmaConfig
from joint_vae_tpu.save_load.jobs import new_job
from joint_vae_tpu.serve import Scorer, calibrated_thresholds

INPUT_SHAPE = (1, 6, 6)
C = 3
RNG = np.random.default_rng(0)


def _ds(name, n=96, noise=False, seed=0):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, C, n).astype(np.int32)
    if noise:
        x = rng.uniform(0, 1, (n, *INPUT_SHAPE)).astype(np.float32)
    else:
        base = np.linspace(0.2, 0.8, C)[y][:, None, None, None]
        x = np.clip(base + 0.05 * rng.standard_normal((n, *INPUT_SHAPE)),
                    0, 1).astype(np.float32)
    return ArrayDataset(x, y, name)


def test_scorer_and_thresholds():
    cfg = CVNetConfig(input_shape=INPUT_SHAPE, num_labels=C, type='cvae',
                      encoder=(16,), decoder=(16,), classifier=(8,),
                      latent_dim=4, latent_sampling=1, test_latent_sampling=3,
                      gamma=10.0, beta=1e-2, sigma=SigmaConfig(value=0.3))
    job = new_job(cfg, key=jax.random.PRNGKey(0))
    job.train_history = {'epochs': 1}
    te = _ds('blobs')
    ood = _ds('noise', noise=True, seed=5)
    ood_detection_rates(job, te, [ood], batch_size=32,
                        method=['elbo'], recording=False)

    thr = calibrated_thresholds(job, ('elbo',), tpr=0.95)
    lo, up = thr['elbo']
    assert np.isfinite(lo)
    assert up == float('inf')      # one-sided method: open upper bound

    scorer = Scorer(job, methods=('elbo',))
    out = scorer(te.data[:32])
    assert out['label'].shape == (32,)
    assert out['confidence'].shape == (32,)
    assert out['in_distribution'].dtype == bool
    # the gate was calibrated at TPR 0.95 on this very set: most ind accepted
    assert out['in_distribution'].mean() > 0.8
    # untrained model may not reject ood strongly; just check it runs
    out2 = scorer(ood.data[:32])
    assert out2['scores']['elbo'].shape == (32,)

    # missing results -> -inf threshold (accept everything)
    job2 = new_job(cfg, key=jax.random.PRNGKey(1))
    thr2 = calibrated_thresholds(job2, ('elbo',))
    assert thr2['elbo'] == (float('-inf'), float('inf'))


def test_recorder_mat_export(tmp_path):
    import pytest
    scipy = pytest.importorskip('scipy.io')
    from joint_vae_tpu.save_load.recorders import LossRecorder
    r = LossRecorder(4)
    r.append_batch(total=np.ones((2, 4), np.float32),
                   y_true=np.arange(4, dtype=np.int32))
    p = str(tmp_path / 'rec.mat')
    r.save_mat(p)
    d = scipy.loadmat(p)
    assert d['total'].shape == (2, 4)

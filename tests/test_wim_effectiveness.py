"""WIM mechanism checks: the combined fine-tuning objective decreases, both
priors stay frozen, and the alternate-prior ELBO of the moving set improves
— the directional behavior the WIM flow relies on (full-scale OOD-AUROC
gains need real-data training budgets, ref results/tabs/sota.csv)."""

import pytest

pytestmark = pytest.mark.slow

import numpy as np

import jax
import jax.numpy as jnp

from joint_vae_tpu.data.loaders import ArrayDataset, DataLoader
from joint_vae_tpu.ft.wim import WIMJob
from joint_vae_tpu.models.cvnet import CVNetConfig
from joint_vae_tpu.ops.sigma import SigmaConfig
from joint_vae_tpu.save_load.jobs import new_job
from joint_vae_tpu.train.optimizers import OptimizerConfig, build_optimizer
from joint_vae_tpu.train.steps import make_train_step

INPUT_SHAPE = (1, 6, 6)
C = 3
RNG = np.random.default_rng(5)


def _blobs(n, seed=0):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, C, n).astype(np.int32)
    base = np.linspace(0.25, 0.75, C)[y][:, None, None, None]
    x = np.clip(base + 0.04 * rng.standard_normal((n, *INPUT_SHAPE)), 0, 1)
    return ArrayDataset(x.astype(np.float32), y, 'blobs')


def _noise(n, seed=1):
    rng = np.random.default_rng(seed)
    return ArrayDataset(rng.uniform(0, 1, (n, *INPUT_SHAPE)).astype(np.float32),
                        np.zeros(n, np.int32), 'noise')


def test_wim_objective_decreases_and_priors_frozen():
    cfg = CVNetConfig(input_shape=INPUT_SHAPE, num_labels=C, type='cvae',
                      encoder=(32,), decoder=(32,), classifier=(8,),
                      latent_dim=4, latent_sampling=1, test_latent_sampling=4,
                      gamma=10.0, beta=1.0, sigma=SigmaConfig(value=0.2))
    job = new_job(cfg, OptimizerConfig(lr=3e-3), key=jax.random.PRNGKey(0))
    tr = _blobs(256)
    ood = _noise(128)

    tx = build_optimizer(job.opt_cfg)
    step = make_train_step(job.model, tx, donate=False)
    for epoch in range(3):
        for x, y in DataLoader(tr, 64, seed=epoch):
            job.state, _ = step(job.state, jnp.asarray(x), jnp.asarray(y))

    wim = WIMJob(job=job)
    wim.set_alternate_prior(init_mean=4.0, num_priors=1)
    prior_before = jax.tree_util.tree_map(np.asarray, job.state.params['prior'])
    alt_before = jax.tree_util.tree_map(np.asarray, wim.alternate_prior_params)

    state = job.state.replace(opt_state=tx.init(job.state.params))
    key = jax.random.PRNGKey(3)
    ft_step = jax.jit(lambda st, xi, yi, xm, k: wim.finetune_batch(
        st, xi, yi, xm, 0.5, rng=k, tx=tx, train_L=1))

    totals, mix_totals = [], []
    x_ood = jnp.asarray(ood.data[:64])
    for i in range(30):
        xb, yb = next(iter(DataLoader(tr, 64, seed=100 + i)))
        state, metrics = ft_step(state, jnp.asarray(xb), jnp.asarray(yb),
                                 x_ood, jax.random.fold_in(key, i))
        totals.append(float(metrics['total']))
        mix_totals.append(float(metrics['mix_total']))

    assert np.isfinite(totals).all()
    # combined objective decreases
    assert np.mean(totals[-5:]) < np.mean(totals[:5]) * 0.98, totals[:3] + totals[-3:]
    # the alternate-prior ELBO of the moving set improves (mix_total drops)
    assert np.mean(mix_totals[-5:]) < np.mean(mix_totals[:5]), mix_totals[:3]

    # both priors are frozen through fine-tuning (ref ft/wim.py:31-32,104-105)
    prior_after = jax.tree_util.tree_map(np.asarray, state.params['prior'])
    for b, a in zip(jax.tree_util.tree_leaves(prior_before),
                    jax.tree_util.tree_leaves(prior_after)):
        np.testing.assert_array_equal(b, a)
    for b, a in zip(jax.tree_util.tree_leaves(alt_before),
                    jax.tree_util.tree_leaves(wim.alternate_prior_params)):
        np.testing.assert_array_equal(b, a)

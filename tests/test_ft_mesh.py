"""Mesh-integrated fine-tuning (VERDICT r4 item 1): the WIM and Poscod
flows take a ``mesh=`` exactly like train_model — state placed with the
framework's sharding rules, batches sharded over 'data' — and produce the
same trajectory/results as the plain single-device path (same data order,
same rng folds; only collective reduction order differs).

Fast tier: virtual 4-device CPU mesh ('data'=2 x 'model'=2).  The true
multi-process WIM validation is tests/test_multiprocess.py (slow tier).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from joint_vae_tpu.data.loaders import ArrayDataset
from joint_vae_tpu.ft.datasets import MixtureDataset
from joint_vae_tpu.ft.job import finetune
from joint_vae_tpu.ft.poscod import PoscodJob
from joint_vae_tpu.ft.wim import WIMJob
from joint_vae_tpu.models.cvnet import CVNetConfig
from joint_vae_tpu.ops.priors import PriorConfig
from joint_vae_tpu.ops.sigma import SigmaConfig
from joint_vae_tpu.parallel.mesh import make_mesh
from joint_vae_tpu.save_load.jobs import new_job
from joint_vae_tpu.train.optimizers import OptimizerConfig

INPUT_SHAPE = (1, 6, 6)
C = 4


def _dataset(name, n=64, seed=0, noise=False):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, C, n).astype(np.int32)
    if noise:
        x = rng.uniform(0, 1, (n, *INPUT_SHAPE)).astype(np.float32)
    else:
        base = np.linspace(0.2, 0.8, C)[y][:, None, None, None]
        x = np.clip(base + 0.05 * rng.standard_normal((n, *INPUT_SHAPE)),
                    0, 1).astype(np.float32)
    return ArrayDataset(x, y, name)


def _wim_of(job):
    wim = WIMJob(job=job)
    wim.set_alternate_prior(key=jax.random.PRNGKey(3),
                            distribution='gaussian', init_mean=8.0,
                            num_priors=1)
    return wim


def _job():
    cfg = CVNetConfig(input_shape=INPUT_SHAPE, num_labels=C, type='cvae',
                      encoder=(16,), decoder=(16,), classifier=(8,),
                      latent_dim=4, latent_sampling=1, test_latent_sampling=2,
                      gamma=10.0, beta=1e-2, sigma=SigmaConfig(value=0.3),
                      prior=PriorConfig(dim=4, num_priors=C, init_mean=2.0,
                                        learned_means=True))
    job = new_job(cfg, OptimizerConfig(lr=3e-3), key=jax.random.PRNGKey(0))
    job.train_history = {'epochs': 1}
    job.training_parameters['set'] = 'blobs'
    return job


def _run_wim(mesh):
    job = _job()
    wim = _wim_of(job)
    tr = _dataset('blobs', n=64)
    te = _dataset('blobs', n=32, seed=4)
    ood = _dataset('noise', n=32, seed=5, noise=True)
    moving = MixtureDataset(mix={'ind': 0.5, 'ood': 0.5}, length=32,
                            ind=te, ood=ood)
    finetune(wim, tr, moving, te, [ood], epochs=1, alpha=0.1,
             batch_size=16, test_batch_size=16, seed=0, mesh=mesh)
    return wim


def test_wim_finetune_mesh_matches_plain():
    """finetune(mesh=('data'=2 x 'model'=2)) must reproduce the plain path:
    identical data order and rng folds -> params and OOD results match to
    reduction-order tolerance.  The prior dictionary (C=4 means) and the
    classifier head actually shard over 'model' here."""
    plain = _run_wim(None)
    mesh = make_mesh(4, model_axis=2)
    sharded = _run_wim(mesh)

    # sharded state leaves really live on the mesh
    pm = sharded.job.state.params['prior']['mean']
    assert isinstance(pm, jax.Array) and pm.sharding.mesh == mesh

    flat_p = jax.tree_util.tree_leaves_with_path(plain.job.state.params)
    flat_s = dict(jax.tree_util.tree_leaves_with_path(
        sharded.job.state.params))
    for path, v in flat_p:
        np.testing.assert_allclose(
            np.asarray(flat_s[path]), np.asarray(v), rtol=5e-5, atol=1e-6,
            err_msg=jax.tree_util.keystr(path))

    e = plain.job.trained
    for m, r in plain.job.ood_results[e]['noise'].items():
        got = sharded.job.ood_results[e]['noise'][m]
        assert abs(got['auc'] - r['auc']) <= 5e-3, (m, got['auc'], r['auc'])


def test_poscod_finetune_mesh_matches_plain():
    te = _dataset('blobs', n=32, seed=4)
    ood = _dataset('noise', n=32, seed=5, noise=True)

    def run(mesh):
        pc = PoscodJob(job=_job())
        pc.finetune(te, ood, epochs=2, batch_size=16, seed=0, mesh=mesh)
        return pc, pc.llr_scores(ood, batch_size=16, mesh=mesh)

    pc_plain, s_plain = run(None)
    pc_mesh, s_mesh = run(make_mesh(4, model_axis=2))
    np.testing.assert_allclose(np.asarray(pc_mesh.head['w']),
                               np.asarray(pc_plain.head['w']),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(s_mesh, s_plain, rtol=1e-4, atol=1e-5)


def test_misclass_engine_takes_mesh():
    """ADVICE r4: misclassification_detection_rates' compute tier feeds
    mesh-sharded batches when given a mesh (same plumbing as accuracy)."""
    from joint_vae_tpu.evals.engines import misclassification_detection_rates
    job = _job()
    te = _dataset('blobs', n=32, seed=4)
    mesh = make_mesh(4, model_axis=2)
    from joint_vae_tpu.parallel.mesh import ensure_placed
    job.state = ensure_placed(job.state, mesh)
    res = misclassification_detection_rates(
        job, te, batch_size=16, from_where=('compute',), mesh=mesh)
    plain = misclassification_detection_rates(
        _job(), te, batch_size=16, from_where=('compute',))
    assert set(res) == set(plain) and res
    for pm in res:
        for m, r in res[pm].items():
            if isinstance(r, dict) and 'auc' in r:
                assert abs(r['auc'] - plain[pm][m]['auc']) <= 5e-3

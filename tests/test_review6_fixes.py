"""Regressions for the sixth code-review batch (ft/optimizer/step fixes).

Covers: SubSampledDataset length-0 and task wraparound semantics, the
LR-injection walk over namedtuple optimizer states, weight-decay updates
never moving mask-frozen params (device step and WIM step), the OOD
result 'n' counting OOD samples, and kl-argmin pseudo-labels recorded for
the '~' replay tier.
"""

import pytest

pytestmark = pytest.mark.slow

import os
import tempfile

import numpy as np

import jax
import jax.numpy as jnp

from joint_vae_tpu.data.loaders import ArrayDataset
from joint_vae_tpu.ft.datasets import MixtureDataset, SubSampledDataset
from joint_vae_tpu.ft.job import finetune, load_wim_job
from joint_vae_tpu.models.cvnet import CVNetConfig
from joint_vae_tpu.ops.priors import PriorConfig
from joint_vae_tpu.ops.sigma import SigmaConfig
from joint_vae_tpu.save_load.jobs import new_job, save_job
from joint_vae_tpu.save_load.recorders import LossRecorder
from joint_vae_tpu.train.optimizers import (OptimizerConfig, build_optimizer,
                                            get_learning_rate,
                                            set_learning_rate)

INPUT_SHAPE = (1, 6, 6)
C = 3


def _dataset(name, n=96, seed=0, noise=False):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, C, n).astype(np.int32)
    if noise:
        x = rng.uniform(0, 1, (n, *INPUT_SHAPE)).astype(np.float32)
    else:
        base = np.linspace(0.2, 0.8, C)[y][:, None, None, None]
        x = np.clip(base + 0.05 * rng.standard_normal((n, *INPUT_SHAPE)),
                    0, 1).astype(np.float32)
    return ArrayDataset(x, y, name)


def _cvae_cfg():
    return CVNetConfig(input_shape=INPUT_SHAPE, num_labels=C, type='cvae',
                       encoder=(16,), decoder=(16,), classifier=(8,),
                       latent_dim=4, latent_sampling=1, test_latent_sampling=2,
                       gamma=10.0, beta=1e-2, sigma=SigmaConfig(value=0.3),
                       prior=PriorConfig(dim=4, num_priors=C, init_mean=2.0))


# -- SubSampledDataset: length=0 is empty, task index wraps --------------


def test_subsampled_length_zero_is_empty():
    ds = _dataset('d', n=50)
    sub = SubSampledDataset(ds, 0, seed=1, task=0)
    assert len(sub) == 0
    assert sub.data.shape[0] == 0


def test_subsampled_task_wraps_modulo():
    ds = _dataset('d', n=100)
    # task 3 starts at offset 90 of a 100-permutation: must wrap, not
    # truncate to 10 samples (ref ft/datasets.py:182 modulo indexing)
    sub = SubSampledDataset(ds, 30, seed=3, task=3)
    assert len(sub) == 30
    h = lambda a: [x.tobytes() for x in a]
    assert len(set(h(sub.data))) == 30  # no duplicate rows within the slice


# -- LR injection over namedtuple optimizer states ------------------------


def test_set_learning_rate_with_clipping_chain():
    cfg = OptimizerConfig(optim_type='adam', lr=0.1, lr_decay=0.5,
                          weight_decay=0.01, grad_clipping=1.0)
    tx = build_optimizer(cfg)
    params = {'w': jnp.ones(3)}
    st = tx.init(params)
    st2 = set_learning_rate(st, 0.05)
    assert abs(get_learning_rate(st2) - 0.05) < 1e-7
    # namedtuple nodes must be reconstructed as their own type, and the
    # state must remain usable by the transformation
    for a, b in zip(jax.tree_util.tree_structure(st).children(),
                    jax.tree_util.tree_structure(st2).children()):
        assert a == b
    updates, _ = tx.update({'w': jnp.ones(3)}, st2, params)
    assert np.isfinite(float(updates['w'][0]))


# -- weight decay never moves mask-frozen params ---------------------------


def test_device_step_weight_decay_respects_frozen_prior():
    from joint_vae_tpu.train.device_data import make_device_train_step
    cfg = _cvae_cfg()   # num_priors=C, learned_means=False -> frozen means
    ocfg = OptimizerConfig(optim_type='adam', lr=0.05, weight_decay=0.5)
    job = new_job(cfg, ocfg, key=jax.random.PRNGKey(0))
    tx = build_optimizer(ocfg)
    step = make_device_train_step(job.model, tx, 16)
    ds = _dataset('d', n=32)
    ex = jnp.asarray(ds.data)
    ey = jnp.asarray(ds.targets)
    # the step donates its input state: snapshot params on host first
    before = jax.device_get(job.state.params['prior'])
    b0 = jax.device_get(job.state.params['encoder'])
    state, _ = step(job.state, ex, ey, 0)
    after = jax.device_get(state.params['prior'])
    jax.tree_util.tree_map(np.testing.assert_array_equal, before, after)
    # sanity: trainable params did move
    a0 = jax.device_get(state.params['encoder'])
    diffs = [np.abs(x - y).max() for x, y in
             zip(jax.tree_util.tree_leaves(b0), jax.tree_util.tree_leaves(a0))]
    assert max(diffs) > 0


def test_wim_step_weight_decay_respects_frozen_prior():
    with tempfile.TemporaryDirectory() as d:
        job = new_job(_cvae_cfg(), key=jax.random.PRNGKey(0))
        job.train_history = {'epochs': 1}
        job.training_parameters['set'] = 'blobs'
        save_job(job, d)
        wim = load_wim_job(d, distribution='gaussian', init_mean=8.0,
                           num_priors=1)
        tx = build_optimizer(OptimizerConfig(optim_type='adam', lr=0.05,
                                             weight_decay=0.5))
        state = wim.job.state.replace(opt_state=tx.init(wim.job.state.params))
        ds = _dataset('blobs', n=16)
        x = jnp.asarray(ds.data)
        y = jnp.asarray(ds.targets)
        before = jax.device_get(state.params['prior'])
        state2, _ = wim.finetune_batch(state, x, y, x, alpha=0.5,
                                       rng=jax.random.PRNGKey(1), tx=tx)
        after = jax.device_get(state2.params['prior'])
        jax.tree_util.tree_map(np.testing.assert_array_equal, before, after)


# -- finetune: OOD 'n' counts OOD samples; pseudo-labels recorded ----------


def test_finetune_ood_n_and_recorded_pseudo_labels():
    with tempfile.TemporaryDirectory() as d:
        job = new_job(_cvae_cfg(), key=jax.random.PRNGKey(0))
        job.train_history = {'epochs': 1}
        job.training_parameters['set'] = 'blobs'
        save_job(job, d)
        wim = load_wim_job(d, distribution='gaussian', init_mean=8.0,
                           num_priors=1)
        tr = _dataset('blobs', n=128)
        te = _dataset('blobs', n=64, seed=4)
        ood = _dataset('noise', n=48, seed=5, noise=True)
        moving = MixtureDataset(mix={'ind': 0.5, 'ood': 0.5}, length=64,
                                ind=te, ood=ood)
        finetune(wim, tr, moving, te, [ood], epochs=1, alpha=0.1,
                 batch_size=32, test_batch_size=16, save_dir=d)
        res = wim.job.ood_results[1]['noise']
        for m, r in res.items():
            assert r['n'] == 48, (m, r['n'])   # OOD count, not ind count
        # the OOD recorder must carry kl-argmin pseudo-labels so the '~'
        # methods can be replayed from the recorders tier
        from joint_vae_tpu.save_load.recorders import find_record
        rec = LossRecorder.load(
            find_record(os.path.join(d, 'samples', '0001'), 'noise'))
        assert 'y_est_already' in rec.keys()
        y_est = rec.get('y_est_already')
        assert y_est.shape[-1] == 48
        kl = rec.get('kl')
        np.testing.assert_array_equal(np.asarray(y_est).ravel(),
                                      np.argmin(np.asarray(kl), axis=0))

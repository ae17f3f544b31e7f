"""Regression tests for the round-1 advisor/judge findings.

- Adam weight decay must be L2-in-gradient (torch optim.Adam semantics,
  ref module/optimizers.py:41-49), not decoupled AdamW.
- --prior uniform must NOT inherit the tilted tau default (ref
  train.py:182-183: tau only forwarded for tilted).
- Resumed jobs continue the saved sampling rng stream.
- arch_code is a stable digest, not a per-process salted hash.
- Frozen params receive no update at all, even with weight decay.
- roc_curve 'around-mean' with validation>0 uses a random-split center and
  sweeps only the remaining in-scores (ref utils/roc_curves.py:49-70).
"""

import os
import zlib

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from joint_vae_tpu.train.optimizers import OptimizerConfig, build_optimizer


def test_adam_weight_decay_matches_torch():
    torch = pytest.importorskip('torch')
    rng = np.random.default_rng(3)
    p0 = rng.normal(size=(7,)).astype(np.float32)
    g = rng.normal(size=(7,)).astype(np.float32)
    lr, wd = 1e-2, 0.3

    tp = torch.nn.Parameter(torch.tensor(p0))
    opt = torch.optim.Adam([tp], lr=lr, weight_decay=wd)
    for _ in range(3):
        opt.zero_grad()
        tp.grad = torch.tensor(g)
        opt.step()
    expected = tp.detach().numpy()

    tx = build_optimizer(OptimizerConfig(optim_type='adam', lr=lr,
                                         weight_decay=wd))
    params = {'w': jnp.asarray(p0)}
    state = tx.init(params)
    for _ in range(3):
        updates, state = tx.update({'w': jnp.asarray(g)}, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    np.testing.assert_allclose(np.asarray(params['w']), expected,
                               rtol=1e-5, atol=1e-6)


def test_uniform_prior_keeps_family_default_tau():
    from joint_vae_tpu.utils.parameters import (get_args,
                                                model_config_from_args)
    argv = ['--dataset', 'cifar10', '--type', 'vae', '--latent-dim', '8',
            '--prior', 'uniform']
    args = get_args(argv, what='train')
    cfg = model_config_from_args(args)
    assert cfg.prior.tau == 5.0          # family default, not tilted's 25

    args = get_args(argv[:-1] + ['tilted'], what='train')
    cfg = model_config_from_args(args)
    assert cfg.prior.tau == args.tilted_tau


def test_arch_code_is_stable_digest():
    from joint_vae_tpu.save_load.dictify import make_dict_from_model
    from joint_vae_tpu.save_load.jobs import new_job
    from joint_vae_tpu.models.cvnet import CVNetConfig
    cfg = CVNetConfig(input_shape=(1, 4, 4), num_labels=3, type='cvae',
                      encoder=(8,), decoder=(8,), latent_dim=4)
    job = new_job(cfg)
    d = make_dict_from_model(job)
    assert d['arch_code'] == format(zlib.crc32(d['arch'].encode()), 'x')


def test_resume_restores_rng(tmp_path):
    from joint_vae_tpu.models.cvnet import CVNetConfig
    from joint_vae_tpu.save_load.jobs import load_job, new_job, save_job
    cfg = CVNetConfig(input_shape=(1, 4, 4), num_labels=3, type='cvae',
                      encoder=(8,), decoder=(8,), latent_dim=4)
    job = new_job(cfg, key=jax.random.PRNGKey(7))
    job.state = job.state.replace(rng=jax.random.PRNGKey(12345))
    save_job(job, str(tmp_path / 'j'))
    loaded = load_job(str(tmp_path / 'j'))
    np.testing.assert_array_equal(np.asarray(loaded.state.rng),
                                  np.asarray(job.state.rng))


def test_frozen_params_get_no_weight_decay():
    """A non-learned prior mean must stay bit-identical through a train step
    even with weight decay in the optimizer (torch requires_grad semantics)."""
    from joint_vae_tpu.models.cvnet import CVNetConfig
    from joint_vae_tpu.save_load.jobs import new_job
    from joint_vae_tpu.train.optimizers import build_optimizer
    from joint_vae_tpu.train.steps import make_train_step
    from joint_vae_tpu.ops.priors import build_prior_config
    prior = build_prior_config(4, 'gaussian', num_priors=3, init_mean=1.0,
                               learned_means=False)
    cfg = CVNetConfig(input_shape=(1, 4, 4), num_labels=3, type='cvae',
                      encoder=(8,), decoder=(8,), latent_dim=4, prior=prior)
    opt_cfg = OptimizerConfig(optim_type='adam', lr=1e-2, weight_decay=0.5)
    job = new_job(cfg, opt_cfg, key=jax.random.PRNGKey(0))
    tx = build_optimizer(opt_cfg)
    step = make_train_step(job.model, tx, donate=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (8, 1, 4, 4)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 3, 8).astype(np.int32))
    means0 = np.asarray(job.state.params['prior']['mean'])
    state, _ = step(job.state, x, y)
    state, _ = step(state, x, y)
    np.testing.assert_array_equal(np.asarray(state.params['prior']['mean']),
                                  means0)


def test_roc_around_mean_validation_split():
    from joint_vae_tpu.ops.roc import roc_curve
    rng = np.random.default_rng(5)
    ins = jnp.asarray(rng.normal(0, 1, 512).astype(np.float32))
    outs = jnp.asarray(rng.normal(3, 1, 512).astype(np.float32))

    r0 = roc_curve(ins, outs, two_sided='around-mean')
    # validation split: different keys -> different centers -> (slightly)
    # different curves, but both remain sane
    r1 = roc_curve(ins, outs, two_sided='around-mean', validation=128,
                   key=jax.random.key(1))
    r2 = roc_curve(ins, outs, two_sided='around-mean', validation=128,
                   key=jax.random.key(2))
    for r in (r0, r1, r2):
        assert 0.85 <= float(r['auc']) <= 1.0
    # the sweep must exclude the validation items: n reported is the total,
    # but the kept tpr points are computed on 512-128 items
    assert int(r1['n']) == 512
    # fractional validation
    r3 = roc_curve(ins, outs, two_sided='around-mean', validation=0.25,
                   key=jax.random.key(1))
    np.testing.assert_allclose(float(r3['auc']), float(r1['auc']), atol=1e-6)


def test_roc_a_p_q_validation_interpolates():
    from joint_vae_tpu.ops.roc import roc_curve
    rng = np.random.default_rng(6)
    ins = jnp.asarray(rng.normal(0, 1, 400).astype(np.float32))
    outs = jnp.asarray(rng.normal(2.5, 1, 400).astype(np.float32))
    r0 = roc_curve(ins, outs, two_sided=(1, 1))
    r1 = roc_curve(ins, outs, two_sided=(1, 1), validation=200,
                   key=jax.random.key(0))
    assert 0.8 <= float(r0['auc']) <= 1.0
    assert 0.8 <= float(r1['auc']) <= 1.0
    # with a large validation sample the interpolated threshold base tracks
    # the full distribution: aucs agree loosely
    assert abs(float(r0['auc']) - float(r1['auc'])) < 0.1

"""Pretrained transfer + freezing, HSV representation, resnet features."""

import pytest

pytestmark = pytest.mark.slow

import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp

from joint_vae_tpu.models.cvnet import CVNet, CVNetConfig
from joint_vae_tpu.models.representation import rgb2hsv, hsv2rgb
from joint_vae_tpu.models.resnet import ResNetFeatures
from joint_vae_tpu.ops.sigma import SigmaConfig
from joint_vae_tpu.save_load.jobs import new_job, save_job
from joint_vae_tpu.save_load.transfer import transfer_pretrained
from joint_vae_tpu.train.optimizers import OptimizerConfig, build_optimizer
from joint_vae_tpu.train.steps import make_train_step

RNG = np.random.default_rng(0)


def _conv_cfg(**kw):
    return CVNetConfig(
        input_shape=(3, 8, 8), num_labels=3, type='cvae',
        features='[x3+1]4-4:2', upsampler='[x3+1]4x2+0-4:2++1-!3x3+1',
        encoder=(16,), decoder=(18,), classifier=(8,), latent_dim=4,
        latent_sampling=1, gamma=10.0, sigma=SigmaConfig(value=0.3), **kw)


def test_hsv_roundtrip():
    x = jnp.asarray(RNG.uniform(0.05, 0.95, (4, 3, 5, 5)).astype(np.float32))
    hsv = rgb2hsv(x)
    assert hsv.shape == x.shape
    back = hsv2rgb(hsv)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=2e-2)


def test_hsv_representation_model():
    cfg = _conv_cfg(representation='hsv')
    job = new_job(cfg, key=jax.random.PRNGKey(0))
    x = jnp.asarray(RNG.uniform(0, 1, (4, 3, 8, 8)).astype(np.float32))
    from joint_vae_tpu.models.evaluate import evaluate
    out = evaluate(job.model, job.state.variables, x,
                   jnp.zeros(4, jnp.int32), rng=jax.random.PRNGKey(1),
                   sigma_state=job.state.sigma_state, train=True)
    assert np.isfinite(float(out.losses['total'].mean()))


def test_resnet_features_shapes():
    m = ResNetFeatures(arch='resnet18', width=8)
    x = jnp.zeros((2, 3, 16, 16))
    vs = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(vs, x)
    assert y.shape == (2, 64, 1, 1)
    assert 'batch_stats' in vs


def test_resnet_in_cvnet_trains():
    cfg = CVNetConfig(input_shape=(3, 8, 8), num_labels=3, type='cvae',
                      features='resnet18:8', encoder=(16,), decoder=(16,),
                      classifier=(8,), latent_dim=4, latent_sampling=1,
                      gamma=10.0, sigma=SigmaConfig(value=0.3))
    assert cfg.has_batch_norm
    job = new_job(cfg, key=jax.random.PRNGKey(0))
    assert job.state.batch_stats is not None
    tx = build_optimizer(job.opt_cfg)
    step = make_train_step(job.model, tx, donate=False)
    x = jnp.asarray(RNG.uniform(0, 1, (8, 3, 8, 8)).astype(np.float32))
    y = jnp.asarray(RNG.integers(0, 3, 8).astype(np.int32))
    bs0 = jax.tree_util.tree_leaves(job.state.batch_stats)[0].copy()
    state, m = step(job.state, x, y)
    assert np.isfinite(float(m['total']))
    # batch stats updated
    bs1 = jax.tree_util.tree_leaves(state.batch_stats)[0]
    assert np.abs(np.asarray(bs0) - np.asarray(bs1)).max() > 0


def test_transfer_pretrained_and_freeze():
    with tempfile.TemporaryDirectory() as d:
        donor = new_job(_conv_cfg(), key=jax.random.PRNGKey(1))
        save_job(donor, d)

        def flat(t):
            return np.concatenate([np.ravel(l) for l in
                                   jax.tree_util.tree_leaves(t)])

        job = new_job(_conv_cfg(), key=jax.random.PRNGKey(2))
        before = flat(job.state.params['features_stack'])
        transfer_pretrained(job, features_from=d, upsampler_from=d)
        after = flat(job.state.params['features_stack'])
        donor_flat = flat(donor.state.params['features_stack'])
        assert not np.array_equal(before, after)
        np.testing.assert_array_equal(after, donor_flat)
        assert set(job.training_parameters['frozen_modules']) == \
            {'features_stack', 'imager'}

        # frozen modules receive no updates
        tx = build_optimizer(job.opt_cfg)
        step = make_train_step(job.model, tx, donate=False,
                               frozen_modules=('features_stack', 'imager'))
        x = jnp.asarray(RNG.uniform(0, 1, (8, 3, 8, 8)).astype(np.float32))
        y = jnp.asarray(RNG.integers(0, 3, 8).astype(np.int32))
        state, _ = step(job.state, x, y)
        np.testing.assert_array_equal(flat(state.params['features_stack']),
                                      after)
        # but the encoder did move
        e0 = flat(job.state.params['encoder'])
        e1 = flat(state.params['encoder'])
        assert np.abs(e0 - e1).max() > 0


def test_tv_densenet_output_shape_matches_forward():
    """output_shape uses the exact torchvision spatial arithmetic (floor
    chain, not h//32) — must agree with this very module's forward at
    non-multiple-of-32 sizes (round-4 review finding)."""
    from joint_vae_tpu.models.resnet import DenseNetFeatures
    key = jax.random.PRNGKey(0)
    for hw in ((32, 32), (29, 29), (63, 63), (30, 40)):
        m = DenseNetFeatures(arch='densenet121', input_hw=hw)
        x = jnp.zeros((1, 3) + hw)
        out, _ = jax.eval_shape(m.init_with_output, key, x)
        assert tuple(out.shape[1:]) == m.output_shape, hw


def test_tv_densenet_too_small_input_clear_error():
    """<29px inputs would produce a zero-size map; output_shape (used by
    CVNet.setup) must refuse with a clear message instead."""
    from joint_vae_tpu.models.resnet import DenseNetFeatures
    m = DenseNetFeatures(arch='densenet121', input_hw=(16, 16))
    with pytest.raises(ValueError, match='too small'):
        m.output_shape


def test_densenet_features_in_cvnet():
    from joint_vae_tpu.models.resnet import DenseNetFeatures
    import jax.numpy as jnp
    m = DenseNetFeatures(arch='densenet-tiny', growth=8, init_features=16)
    x = jnp.zeros((2, 3, 16, 16))
    vs = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(vs, x).shape[1:] == m.output_shape

    cfg = CVNetConfig(input_shape=(3, 8, 8), num_labels=3, type='cvae',
                      features='densenet-tiny:4', encoder=(16,), decoder=(16,),
                      classifier=(8,), latent_dim=4, latent_sampling=1,
                      gamma=10.0, sigma=SigmaConfig(value=0.3))
    assert cfg.has_batch_norm
    job = new_job(cfg, key=jax.random.PRNGKey(0))
    tx = build_optimizer(job.opt_cfg)
    step = make_train_step(job.model, tx, donate=False)
    x = jnp.asarray(RNG.uniform(0, 1, (8, 3, 8, 8)).astype(np.float32))
    y = jnp.asarray(RNG.integers(0, 3, 8).astype(np.int32))
    _, m_ = step(job.state, x, y)
    assert np.isfinite(float(m_['total']))

"""Native-layout scoring parity (ConvStack.native_f / evaluate native_scores).

The scoring fast path computes reconstruction losses in the decoder's
native packed-NHWC layout (skipping the depth-to-space + NHWC->NCHW
formatting of every decoded sample); losses must match the canonical
layout exactly up to float reduction order, for the packed (f=2) and
unpacked (JVT_PACK=0) lowerings, in train and eval, with and without
labels, and through gradients.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from __graft_entry__ import _flagship_cfg
from joint_vae_tpu.models.cvnet import CVNetConfig, decode_native_f
from joint_vae_tpu.models.evaluate import evaluate
from joint_vae_tpu.ops.sigma import SigmaConfig
from joint_vae_tpu.save_load.jobs import new_job
from joint_vae_tpu.train.optimizers import OptimizerConfig


@pytest.fixture(scope='module')
def tiny_job():
    cfg = _flagship_cfg(tiny=True)
    return new_job(cfg, OptimizerConfig(lr=1e-3), key=jax.random.PRNGKey(0))


def _batch(cfg, n=6, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(0, 1, (n, *cfg.input_shape)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, cfg.num_labels, n).astype(np.int32))
    return x, y


def _assert_losses_close(o0, o1):
    assert set(o0.losses) == set(o1.losses)
    for k in o0.losses:
        np.testing.assert_allclose(np.asarray(o0.losses[k]),
                                   np.asarray(o1.losses[k]),
                                   rtol=2e-5, atol=1e-5, err_msg=k)


def test_native_f_packed(tiny_job):
    assert decode_native_f(tiny_job.model_cfg) == 2


@pytest.mark.parametrize('train,with_y', [(False, False), (False, True),
                                          (True, True)])
def test_loss_parity(tiny_job, train, with_y):
    cfg = tiny_job.model_cfg
    x, y = _batch(cfg)
    kw = dict(rng=jax.random.PRNGKey(1), sigma_state=tiny_job.state.sigma_state,
              train=train, with_beta=True)
    o0 = evaluate(tiny_job.model, tiny_job.state.variables, x,
                  y if with_y else None, **kw)
    o1 = evaluate(tiny_job.model, tiny_job.state.variables, x,
                  y if with_y else None, native_scores=True, **kw)
    _assert_losses_close(o0, o1)
    # native layout: packed NHWC (hp, wp, f^2 c)
    c, h, w = cfg.input_shape
    assert o1.x_reco.shape[-3:] == (h // 2, w // 2, 4 * c)
    assert o0.x_reco.shape[-3:] == (c, h, w)


def test_grad_parity(tiny_job):
    cfg = tiny_job.model_cfg
    x, y = _batch(cfg)

    def loss(params, native):
        o = evaluate(tiny_job.model, {'params': params}, x, y,
                     rng=jax.random.PRNGKey(1),
                     sigma_state=tiny_job.state.sigma_state,
                     train=True, with_beta=True, native_scores=native)
        return jnp.mean(o.losses['total'])

    g0 = jax.grad(loss)(tiny_job.state.params, False)
    g1 = jax.grad(loss)(tiny_job.state.params, True)
    for (p, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(g0),
                              jax.tree_util.tree_leaves_with_path(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5, err_msg=str(p))


@pytest.mark.parametrize('flags', ['barrier', 'bf16', 'bf16+barrier'])
def test_epilogue_flag_parity(tiny_job, flags):
    """The eval-throughput epilogue variants ('barrier' is numerically
    inert; 'bf16' keeps the sub/square in compute dtype with f32
    accumulation) stay close to the canonical losses."""
    cfg = tiny_job.model_cfg
    x, _ = _batch(cfg)
    kw = dict(rng=jax.random.PRNGKey(1),
              sigma_state=tiny_job.state.sigma_state, train=False)
    o0 = evaluate(tiny_job.model, tiny_job.state.variables, x, None, **kw)
    o1 = evaluate(tiny_job.model, tiny_job.state.variables, x, None,
                  native_scores=flags, **kw)
    assert set(o0.losses) == set(o1.losses)
    # f32 compute dtype on CPU: 'bf16' only engages on low-precision
    # decoders, so parity here is tight for every flag combination
    for k in o0.losses:
        np.testing.assert_allclose(np.asarray(o0.losses[k]),
                                   np.asarray(o1.losses[k]),
                                   rtol=2e-5, atol=1e-5, err_msg=k)


def test_epilogue_bf16_low_precision_mse():
    """mse_loss(low_precision=True) on bf16 inputs: bf16 elementwise, f32
    accumulation — relative error vs the f32 path stays ~1e-2."""
    from joint_vae_tpu.ops.losses import mse_loss
    rng = np.random.default_rng(3)
    out = jnp.asarray(rng.uniform(0, 1, (4, 6, 8, 8, 3)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(0, 1, (6, 8, 8, 3)).astype(np.float32))
    ref = mse_loss(out, tgt, batch_mean=False)
    low = mse_loss(out.astype(jnp.bfloat16), tgt, batch_mean=False,
                   low_precision=True)
    assert low.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(low), np.asarray(ref),
                               rtol=2e-2, atol=1e-3)


def test_pack0_native_is_nhwc(tiny_job, monkeypatch):
    monkeypatch.setenv('JVT_PACK', '0')
    cfg = tiny_job.model_cfg
    assert decode_native_f(cfg) == 1
    x, _ = _batch(cfg)
    kw = dict(rng=jax.random.PRNGKey(1), sigma_state=tiny_job.state.sigma_state,
              train=False)
    o0 = evaluate(tiny_job.model, tiny_job.state.variables, x, None, **kw)
    o1 = evaluate(tiny_job.model, tiny_job.state.variables, x, None,
                  native_scores=True, **kw)
    _assert_losses_close(o0, o1)
    c, h, w = cfg.input_shape
    assert o1.x_reco.shape[-3:] == (h, w, c)


def test_gates_fall_back_to_canonical(tiny_job):
    """per-dim sigma / categorical output / dense imager refuse native."""
    cfg = tiny_job.model_cfg
    x, _ = _batch(cfg)
    import dataclasses
    per_dim = dataclasses.replace(
        cfg, sigma=SigmaConfig(value=0.3, learned=True,
                               sdim=int(np.prod(cfg.input_shape))))
    assert per_dim.sigma_cfg.per_dim
    job = new_job(per_dim, OptimizerConfig(lr=1e-3), key=jax.random.PRNGKey(0))
    o = evaluate(job.model, job.state.variables, x, None,
                 rng=jax.random.PRNGKey(1), sigma_state=job.state.sigma_state,
                 train=False, native_scores=True)
    assert o.x_reco.shape[-3:] == tuple(cfg.input_shape)  # canonical

    cat = dataclasses.replace(cfg, output_distribution='categorical')
    assert decode_native_f(cat) == 0

    dense = dataclasses.replace(cfg, features=None, upsampler=None)
    assert decode_native_f(dense) == 0

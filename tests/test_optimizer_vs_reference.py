"""Optimizer-trajectory parity: our optax chains against the reference's
torch wrapper (module/optimizers.py:14-134) on identical gradients —
covers adam/sgd, L2-in-gradient weight decay (torch semantics, not AdamW),
momentum/nesterov, global-norm clipping, and per-epoch exponential LR
decay via the scheduler."""

import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax.numpy as jnp

from joint_vae_tpu.train.optimizers import (OptimizerConfig, build_optimizer,
                                            set_learning_rate)

torch = pytest.importorskip('torch')

D = 6
RNG = np.random.default_rng(23)
A = RNG.normal(0, 1, (D, D)).astype(np.float32)
B = RNG.normal(0, 1, D).astype(np.float32)
THETA0 = RNG.normal(0, 1, D).astype(np.float32)


@pytest.fixture(scope='module')
def ref_optimizer():
    sys.path.insert(0, '/root/reference')
    try:
        from module.optimizers import Optimizer
    finally:
        sys.path.remove('/root/reference')
    return Optimizer


def _grad(theta):
    return A @ theta + B


def _run_ref(Optimizer, steps, epochs_every=None, **kw):
    p = torch.nn.Parameter(torch.tensor(THETA0.copy()))
    opt = Optimizer([p], **kw)
    for i in range(steps):
        opt.zero_grad()
        p.grad = torch.tensor(_grad(p.detach().numpy()))
        opt.clip([p])
        opt.step()
        if epochs_every and (i + 1) % epochs_every == 0:
            opt.update_lr()
    return p.detach().numpy()


def _run_ours(steps, epochs_every=None, **kw):
    cfg = OptimizerConfig(**kw)
    tx = build_optimizer(cfg)
    theta = jnp.asarray(THETA0.copy())
    state = tx.init(theta)
    epoch = 0
    for i in range(steps):
        g = jnp.asarray(_grad(np.asarray(theta)))
        updates, state = tx.update(g, state, theta)
        theta = theta + updates
        if epochs_every and (i + 1) % epochs_every == 0:
            epoch += 1
            state = set_learning_rate(state, cfg.lr_at_epoch(epoch))
    return np.asarray(theta)


@pytest.mark.parametrize('kw', [
    dict(optim_type='adam', lr=1e-2),
    dict(optim_type='adam', lr=1e-2, weight_decay=0.1),
    dict(optim_type='adam', lr=1e-2, grad_clipping=0.5),
    dict(optim_type='sgd', lr=1e-2),
    dict(optim_type='sgd', lr=1e-2, weight_decay=0.05),
])
def test_trajectory_parity(ref_optimizer, kw):
    want = _run_ref(ref_optimizer, 12, **kw)
    ours = _run_ours(12, **kw)
    np.testing.assert_allclose(ours, want, rtol=1e-4, atol=1e-5)


def test_sgd_momentum_nesterov(ref_optimizer):
    want = _run_ref(ref_optimizer, 12, optim_type='sgd', lr=1e-2,
                    momentum=0.9, nesterov=True)
    ours = _run_ours(12, optim_type='sgd', lr=1e-2, momentum=0.9,
                     nesterov=True)
    np.testing.assert_allclose(ours, want, rtol=1e-4, atol=1e-5)


def test_lr_decay_schedule(ref_optimizer):
    """Per-epoch ExponentialLR(gamma=1-lr_decay) == our injected
    lr_at_epoch (ref optimizers.py:51-53,120-127)."""
    want = _run_ref(ref_optimizer, 12, epochs_every=3, optim_type='adam',
                    lr=1e-2, lr_decay=0.2)
    ours = _run_ours(12, epochs_every=3, optim_type='adam', lr=1e-2,
                     lr_decay=0.2)
    np.testing.assert_allclose(ours, want, rtol=1e-4, atol=1e-5)


def test_default_lrs(ref_optimizer):
    for kind in ('adam', 'sgd'):
        ref = ref_optimizer([torch.nn.Parameter(torch.zeros(2))],
                            optim_type=kind)
        assert OptimizerConfig(optim_type=kind).lr == ref.lr

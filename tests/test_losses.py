"""Golden-value tests for loss primitives vs independent numpy/torch math."""

import numpy as np
import pytest

import jax.numpy as jnp

from joint_vae_tpu.ops.losses import mse_loss, categorical_loss, x_loss

torch = pytest.importorskip('torch')
import torch.nn.functional as F  # noqa: E402


RNG = np.random.default_rng(0)


def test_mse_loss_shapes_and_values():
    L, C, N, D = 4, 3, 5, (1, 7, 7)
    x_t = RNG.normal(size=(N, *D)).astype(np.float32)
    x_o = RNG.normal(size=(L, C, N, *D)).astype(np.float32)

    got = np.asarray(mse_loss(jnp.array(x_o), jnp.array(x_t), ndim=3, batch_mean=False))
    want = ((x_o - x_t[None, None]) ** 2).mean(axis=(-1, -2, -3))
    assert got.shape == (L, C, N)
    np.testing.assert_allclose(got, want, rtol=1e-5)

    got_mean = float(mse_loss(jnp.array(x_o), jnp.array(x_t), ndim=3, batch_mean=True))
    np.testing.assert_allclose(got_mean, want.mean(), rtol=1e-5)


def test_categorical_loss_vs_torch():
    L, N, D = 2, 4, (1, 5, 5)
    x_t = RNG.uniform(size=(N, *D)).astype(np.float32)
    x_o = RNG.normal(size=(L, N, 256, *D)).astype(np.float32)

    got = np.asarray(categorical_loss(jnp.array(x_o), jnp.array(x_t),
                                      ndim=3, batch_mean=False))

    labels = torch.from_numpy(x_t).mul(255).long()
    ce = F.cross_entropy(torch.from_numpy(x_o).view(-1, 256, *D),
                         labels.expand(L, N, *D).reshape(-1, *D),
                         reduction='none').view(L, N, -1).sum(-1)
    np.testing.assert_allclose(got, ce.numpy(), rtol=1e-4)


def test_x_loss_with_labels_vs_torch():
    L1, N, C = 3, 6, 10
    logits = RNG.normal(size=(L1, N, C)).astype(np.float32)
    y = RNG.integers(0, C, size=(N,))

    got = np.asarray(x_loss(jnp.array(y), jnp.array(logits), batch_mean=False))
    want = F.cross_entropy(torch.from_numpy(logits).reshape(-1, C),
                           torch.from_numpy(np.tile(y, L1)),
                           reduction='none').view(L1, N).mean(0)
    assert got.shape == (N,)
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-4, atol=1e-4)

    got_mean = float(x_loss(jnp.array(y), jnp.array(logits), batch_mean=True))
    np.testing.assert_allclose(got_mean, want.numpy().mean(), rtol=1e-4)


def test_x_loss_label_free_per_class():
    # ref module/losses.py:62-71: -log(softmax + 1e-6) averaged over samples 1:
    L1, N, C = 4, 5, 3
    logits = RNG.normal(size=(L1, N, C)).astype(np.float32)
    got = np.asarray(x_loss(None, jnp.array(logits)))
    sm = torch.from_numpy(logits).softmax(-1)
    want = -(sm + 1e-6).log()[1:].mean(0).permute(1, 0).numpy()
    assert got.shape == (C, N)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # single-sample path uses sample 0
    one = logits[:1]
    got1 = np.asarray(x_loss(None, jnp.array(one)))
    want1 = -(torch.from_numpy(one).softmax(-1) + 1e-6).log()[0].permute(1, 0).numpy()
    np.testing.assert_allclose(got1, want1, rtol=1e-4, atol=1e-5)

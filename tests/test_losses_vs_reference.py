"""Loss-primitive parity against the reference's module/losses.py executed
as an oracle on shared tensors (mse / categorical / x_loss incl. the
y-is-None per-class branch, and the running loss_mean updater)."""

import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax.numpy as jnp

from joint_vae_tpu.ops.losses import mse_loss, categorical_loss, x_loss

torch = pytest.importorskip('torch')
RNG = np.random.default_rng(5)


@pytest.fixture(scope='module')
def ref():
    sys.path.insert(0, '/root/reference')
    try:
        import module.losses as m
    finally:
        sys.path.remove('/root/reference')
    return m


def test_mse_parity(ref):
    L, Cc, N, D = 3, 4, 5, (2, 6, 6)
    x_t = RNG.uniform(0, 1, (N, *D)).astype(np.float32)
    x_o = RNG.uniform(0, 1, (L, Cc, N, *D)).astype(np.float32)
    for bm in (True, False):
        want = ref.mse_loss(torch.tensor(x_o), torch.tensor(x_t),
                            batch_mean=bm)
        got = mse_loss(jnp.asarray(x_o), jnp.asarray(x_t), batch_mean=bm)
        np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5)


def test_categorical_parity(ref):
    L, N, D = 2, 3, (1, 4, 4)
    x_t = (RNG.integers(0, 256, (N, *D)) / 255.0).astype(np.float32)
    x_o = RNG.normal(0, 1, (L, N, 256, *D)).astype(np.float32)
    for bm in (True, False):
        want = ref.categorical_loss(torch.tensor(x_o), torch.tensor(x_t),
                                    batch_mean=bm)
        got = categorical_loss(jnp.asarray(x_o), jnp.asarray(x_t),
                               batch_mean=bm)
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   rtol=1e-4, atol=1e-4)


def test_x_loss_parity(ref):
    L1, N, Cc = 4, 6, 10
    logits = RNG.normal(0, 2, (L1, N, Cc)).astype(np.float32)
    y = RNG.integers(0, Cc, N).astype(np.int64)
    for bm in (True, False):
        want = ref.x_loss(torch.tensor(y), torch.tensor(logits),
                          batch_mean=bm)
        got = x_loss(jnp.asarray(y), jnp.asarray(logits), batch_mean=bm)
        np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5,
                                   atol=1e-6)


def test_x_loss_label_free_parity(ref):
    """y=None: -log softmax averaged over samples 1.. with the class-axis
    permute (ref losses.py:63-71), incl. the single-sample branch."""
    for L1 in (1, 4):
        logits = RNG.normal(0, 2, (L1, 3, 5, 10)).astype(np.float32)
        want = ref.x_loss(None, torch.tensor(logits))
        got = x_loss(None, jnp.asarray(logits))
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   rtol=1e-4, atol=1e-6)


def test_loss_mean_parity(ref):
    """Running per-component mean with argmin/argmax label selection
    (ref losses.py:89-110) vs the same math in numpy."""
    vals = RNG.normal(0, 1, (10, 32)).astype(np.float32)
    for comp in ('elbo', 'iws', 'kl'):
        want = ref.loss_mean(comp, torch.tensor(vals), y=None,
                             current_mean=0.5, n=64)
        v = np.asarray(vals)
        y = v.argmax(0) if comp in ('elbo', 'iws') else v.argmin(0)
        # the reference index_select's rows then means the full matrix —
        # mirror its exact (quirky) semantics
        batch_mean = v[y].mean()
        got = (0.5 * 64 + batch_mean * 32) / (64 + 32)
        np.testing.assert_allclose(got, float(want), rtol=1e-5)

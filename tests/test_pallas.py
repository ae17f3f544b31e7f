"""Pallas fused-IWAE kernel parity vs the plain-XLA reference combine
(interpret mode on CPU)."""

import numpy as np

import jax.numpy as jnp

from joint_vae_tpu.ops.pallas_kernels import iws_fused, iws_reference_combine

RNG = np.random.default_rng(0)


def _inputs(L=4, N=32, K=16, C=10):
    z = RNG.normal(size=(L, N, K)).astype(np.float32)
    log_pxq = RNG.normal(size=(L, N)).astype(np.float32) * 5
    mean = RNG.normal(size=(C, K)).astype(np.float32) * 2
    s2 = RNG.uniform(0.5, 2.0, size=(C,)).astype(np.float32)
    ldp = RNG.normal(size=(C,)).astype(np.float32)
    return tuple(jnp.asarray(a) for a in (z, log_pxq, mean, s2, ldp))


def test_fused_matches_reference_refmode():
    args = _inputs()
    got = np.asarray(iws_fused(*args, ref_mode=True, interpret=True))
    want = np.asarray(iws_reference_combine(*args, ref_mode=True))
    assert got.shape == want.shape == (10, 32)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_fused_matches_reference_lme():
    args = _inputs(L=8, N=16, K=8, C=3)
    got = np.asarray(iws_fused(*args, ref_mode=False, interpret=True))
    want = np.asarray(iws_reference_combine(*args, ref_mode=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_fused_padding_correct():
    # C and N not multiples of the tile sizes
    args = _inputs(L=3, N=137, K=16, C=37)
    got = np.asarray(iws_fused(*args, ref_mode=True, interpret=True,
                               block_c=16, block_n=128))
    want = np.asarray(iws_reference_combine(*args, ref_mode=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_fused_single_sample():
    args = _inputs(L=1, N=8, K=4, C=2)
    got = np.asarray(iws_fused(*args, ref_mode=True, interpret=True))
    want = np.asarray(iws_reference_combine(*args, ref_mode=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

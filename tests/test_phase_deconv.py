"""Exact parity of the phase-decomposed transposed conv vs the zero-dilation
lowering, across kernel/stride/padding/output-padding combinations."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from joint_vae_tpu.models.conv import _phase_deconv

RNG = np.random.default_rng(9)


def _dilated_reference(x, kernel, k, p, s, op):
    pad = (k - 1 - p, k - 1 - p + op)
    return lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding=[pad, pad],
        lhs_dilation=(s, s), dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


@pytest.mark.parametrize('k,p,s,op,h', [
    (5, 2, 2, 1, 8),     # deconv32 inner layers
    (4, 1, 2, 0, 7),     # common 4x4 stride-2
    (3, 1, 2, 1, 5),
    (5, 0, 2, 0, 3),
    (3, 0, 3, 0, 4),     # stride 3
    (2, 0, 2, 0, 1),     # 1x1 input expansion (deconv32 head-like)
    (8, 0, 1, 0, 1),     # stride 1 path sanity (no decomposition)
    (5, 2, 2, 0, 6),     # no output padding
    (7, 3, 4, 2, 5),     # large stride + output padding
])
def test_phase_deconv_matches_dilated(k, p, s, op, h):
    cin, cout = 3, 5
    x = jnp.asarray(RNG.normal(size=(2, h, h, cin)).astype(np.float32))
    kernel = jnp.asarray(RNG.normal(size=(k, k, cin, cout)).astype(np.float32))
    want = _dilated_reference(x, kernel, k, p, s, op)
    if s == 1:
        got = _dilated_reference(x, kernel, k, p, s, op)
    else:
        got = _phase_deconv(x, kernel, k, p, s, op)
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_phase_deconv_rectangular():
    x = jnp.asarray(RNG.normal(size=(1, 4, 6, 2)).astype(np.float32))
    kernel = jnp.asarray(RNG.normal(size=(5, 5, 2, 3)).astype(np.float32))
    want = _dilated_reference(x, kernel, 5, 2, 2, 1)
    got = _phase_deconv(x, kernel, 5, 2, 2, 1)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_deconv_stack_unchanged_outputs():
    """The ConvStack deconv layers keep the plan shapes and finite outputs."""
    from joint_vae_tpu.models.conv import conv_stack_plan, ConvStack
    _, plans, out = conv_stack_plan((8, 1, 1), 'deconv32', where='output')
    # deconv32 expects 64 input channels at 1x1? plan starts from given shape
    stack = ConvStack(input_shape=(8, 1, 1), plans=plans, where='output')
    x = jnp.asarray(RNG.uniform(size=(2, 8, 1, 1)).astype(np.float32))
    vs = stack.init(jax.random.PRNGKey(0), x)
    y = stack.apply(vs, x)
    assert y.shape == (2,) + out
    assert np.isfinite(np.asarray(y)).all()

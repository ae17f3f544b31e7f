"""Parity tests for the Pallas same-grid conv (ops/pallas_conv.py).

Runs in interpret mode on CPU (the dispatch auto-interprets off-TPU);
covers the exact geometries the packed decoder lowering produces
(packed f=2 stride-1 convs, subpixel dense convs, unpacked k5 convs),
asymmetric pads, the custom-vjp backward, the dispatch bail-outs, and a
ConvStack-level on/off equivalence on an upsampler stack.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import joint_vae_tpu.ops.pallas_conv as pc

RNG = np.random.default_rng(7)


def _pair(n, h, w, ci, co, th, tw, dtype=jnp.float32):
    x = jnp.asarray(RNG.standard_normal((n, h, w, ci)), dtype)
    k = jnp.asarray(RNG.standard_normal((th, tw, ci, co)) * 0.1, dtype)
    return x, k


@pytest.fixture(autouse=True)
def _enable(monkeypatch):
    monkeypatch.setenv('JVT_PALLAS_CONV', '1')


@pytest.mark.parametrize('geom', [
    # (n, h, w, ci, co, th, tw, ph_lo) — decode-lowering shapes (tiny n)
    (8, 16, 16, 128, 128, 3, 3, 1),   # d5 packed f=2
    (8, 8, 8, 256, 128, 3, 3, 1),     # d3 packed f=2
    (8, 16, 16, 32, 128, 3, 3, 1),    # d4 subpixel dense conv
    (8, 8, 8, 64, 64, 5, 5, 2),       # d1 unpacked k5 'same'
    (16, 8, 8, 32, 12, 3, 3, 1),      # d6 lane-starved head
])
def test_parity_vs_xla(geom):
    n, h, w, ci, co, th, tw, ph = geom
    x, k = _pair(n, h, w, ci, co, th, tw)
    pad = [(ph, th - 1 - ph), (ph, tw - 1 - ph)]
    y = pc.maybe_same_grid_conv(x, k, (1, 1), pad)
    assert y is not None
    ref = pc._xla_conv(x, k, ph, th - 1 - ph, ph, tw - 1 - ph)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_asymmetric_pads():
    x, k = _pair(8, 8, 8, 64, 64, 3, 3)
    for pads in ([(0, 2), (2, 0)], [(2, 0), (0, 2)], [(1, 1), (0, 2)]):
        y = pc.maybe_same_grid_conv(x, k, (1, 1), pads)
        assert y is not None
        ref = pc._xla_conv(x, k, pads[0][0], pads[0][1],
                           pads[1][0], pads[1][1])
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=1e-5, atol=1e-4)


def test_grad_matches_xla_conv():
    x, k = _pair(8, 8, 8, 32, 32, 3, 3)
    pad = [(1, 1), (1, 1)]

    def f_pal(x_, k_):
        return jnp.sum(pc.maybe_same_grid_conv(x_, k_, (1, 1), pad) ** 2)

    def f_xla(x_, k_):
        return jnp.sum(pc._xla_conv(x_, k_, 1, 1, 1, 1) ** 2)

    gx, gk = jax.grad(f_pal, (0, 1))(x, k)
    rx, rk = jax.grad(f_xla, (0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(rk),
                               rtol=1e-5, atol=1e-3)


def test_dispatch_bailouts(monkeypatch):
    x, k = _pair(8, 8, 8, 32, 32, 3, 3)
    ok = [(1, 1), (1, 1)]
    assert pc.maybe_same_grid_conv(x, k, (2, 2), ok) is None      # stride
    assert pc.maybe_same_grid_conv(x, k, (1, 1),
                                   [(2, 2), (1, 1)]) is None      # grid grows
    assert pc.maybe_same_grid_conv(x, k, (1, 1),
                                   [(0, 0), (1, 1)]) is None      # grid shrinks
    small = jnp.zeros((2, 4, 4, 32))
    assert pc.maybe_same_grid_conv(
        small, jnp.zeros((3, 3, 32, 32)), (1, 1), ok) is None     # tiny M
    monkeypatch.setenv('JVT_PALLAS_CONV', '')
    assert pc.maybe_same_grid_conv(x, k, (1, 1), ok) is None      # disabled


def test_batch_tile_choice():
    assert pc._pick_nb(8192, 256, 4096) == 16
    assert pc._pick_nb(6, 256, 4096) == 6
    assert pc._pick_nb(10, 4096, 4096) == 1     # one image above max_m
    assert pc._pick_nb(12, 256, 2048) == 6      # divisor of n


def test_convstack_equivalence(monkeypatch):
    """A packed upsampler stack produces identical outputs (within bf16-free
    f32 tolerance) with the Pallas path on and off — same params."""
    from joint_vae_tpu.models.conv import ConvStack, conv_stack_plan

    arch = '[x5+2]16x8+0-16-16:2++1-8-!3x5+2'
    _, plans, _ = conv_stack_plan((24, 1, 1), arch, where='output')
    stack = ConvStack(input_shape=(24, 1, 1), plans=tuple(plans),
                      where='output')
    z = jnp.asarray(RNG.standard_normal((64, 24, 1, 1)), jnp.float32)
    params = stack.init(jax.random.PRNGKey(0), z)

    monkeypatch.setenv('JVT_PALLAS_CONV', '')
    ref = stack.apply(params, z)
    monkeypatch.setenv('JVT_PALLAS_CONV', '1')
    got = stack.apply(params, z)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)

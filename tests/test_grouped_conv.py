"""Exact parity of the grouped first-conv lowering (models/conv.py::
grouped_conv — im2col matmul over f horizontally adjacent output pixels)
vs the plain conv, at the primitive level and through a full ConvStack."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from joint_vae_tpu.models.conv import grouped_conv

RNG = np.random.default_rng(11)


def _plain(x, kern, k, p):
    return lax.conv_general_dilated(
        x, kern, (1, 1), [(p, p), (p, p)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


@pytest.mark.parametrize('k,cin,cout,h,w,f', [
    (5, 3, 32, 32, 32, 4),     # conv32 c0
    (5, 3, 32, 32, 32, 8),
    (3, 1, 8, 28, 28, 4),      # mnist-ish first conv
    (5, 3, 32, 32, 32, 2),
    (7, 3, 16, 14, 14, 2),
])
def test_grouped_conv_matches_plain(k, cin, cout, h, w, f):
    p = k // 2
    x = jnp.asarray(RNG.standard_normal((4, h, w, cin)), jnp.float32)
    kern = jnp.asarray(RNG.standard_normal((k, k, cin, cout)), jnp.float32)
    ref = _plain(x, kern, k, p)
    got = grouped_conv(x, kern, k=k, p=p, f=f)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_grouped_conv_gradients_match():
    """dw/dx through the kernel-embed must equal the plain conv's."""
    k, p, f = 5, 2, 4
    x = jnp.asarray(RNG.standard_normal((2, 8, 8, 3)), jnp.float32)
    kern = jnp.asarray(RNG.standard_normal((k, k, 3, 16)), jnp.float32)

    def loss(fn, xx, kk):
        return jnp.sum(jnp.sin(fn(xx, kk)))

    g_ref = jax.grad(lambda kk: loss(lambda a, b: _plain(a, b, k, p), x, kern))(kern)
    g_grp = jax.grad(lambda kk: loss(
        lambda a, b: grouped_conv(a, b, k=k, p=p, f=f), x, kern))(kern)
    np.testing.assert_allclose(np.asarray(g_grp), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-4)
    gx_ref = jax.grad(lambda xx: loss(lambda a, b: _plain(a, b, k, p), xx, kern))(x)
    gx_grp = jax.grad(lambda xx: loss(
        lambda a, b: grouped_conv(a, b, k=k, p=p, f=f), xx, kern))(x)
    np.testing.assert_allclose(np.asarray(gx_grp), np.asarray(gx_ref),
                               rtol=1e-5, atol=1e-4)


def test_conv_stack_lowering_agnostic(monkeypatch):
    """The same checkpoint evaluates identically with the grouped lowering
    on and off (JVT_GROUPED_CONV) through a full features stack."""
    from joint_vae_tpu.models.conv import ConvStack, conv_stack_plan

    _, plans, _ = conv_stack_plan((3, 32, 32), '[x5+2]8-8:2-16')
    plans = tuple(plans)
    x = jnp.asarray(RNG.standard_normal((2, 3, 32, 32)), jnp.float32)

    def run():
        stack = ConvStack(input_shape=(3, 32, 32), plans=plans,
                          where='input')
        vs = stack.init(jax.random.PRNGKey(0), x)
        return stack.apply(vs, x), vs

    monkeypatch.delenv('JVT_GROUPED_CONV', raising=False)
    ref, vs_ref = run()
    monkeypatch.setenv('JVT_GROUPED_CONV', 'auto')
    got, vs_got = run()
    # identical parameter trees (the lowering never changes stored shapes)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), vs_ref, vs_got)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_conv_stack_c0_packed_agnostic(monkeypatch):
    """Same checkpoint, same outputs and gradients with the packed-output
    first-conv lowering on and off (JVT_C0_PACKED)."""
    from joint_vae_tpu.models.conv import ConvStack, conv_stack_plan

    _, plans, _ = conv_stack_plan((3, 32, 32), '[x5+2]8-8:2-16')
    plans = tuple(plans)
    x = jnp.asarray(RNG.standard_normal((2, 3, 32, 32)), jnp.float32)

    def run():
        stack = ConvStack(input_shape=(3, 32, 32), plans=plans,
                          where='input')
        vs = stack.init(jax.random.PRNGKey(0), x)
        out = stack.apply(vs, x)
        gw = jax.grad(lambda v: jnp.sum(jnp.sin(
            stack.apply(v, x).astype(jnp.float32))))(vs)
        return out, vs, gw

    monkeypatch.delenv('JVT_GROUPED_CONV', raising=False)
    monkeypatch.delenv('JVT_C0_PACKED', raising=False)
    ref, vs_ref, gw_ref = run()
    monkeypatch.setenv('JVT_C0_PACKED', 'auto')
    got, vs_got, gw_got = run()
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), vs_ref, vs_got)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-3),
        gw_ref, gw_got)

"""Strided features-layer lowerings (round-2c follow-up).

probe_features_r2b settled c0 (packed f_out=2 wins) and rejected
mid-stack *chained* packing; this probe measures the remaining leads:
the strided layers c1 (32->32 k5 s2 @32x32, the most expensive features
layer) and c3 (64->64 k5 s2 @16x16) lowered in isolation with
(a) packed output f_out=2 + immediate unpack — output lanes 32->128 /
64->256 at ~2x MAC inflation (window k+s = 7 taps vs 4 disjoint 5x5);
(b) a *strided* horizontal grouped im2col matmul (f output pixels per
dot row, lanes f*cout) — c0's grouped_conv generalized to stride 2.

All variants training-true: differentiate w.r.t. x AND kernel (these are
mid-stack layers).  Run on the real TPU:
python scripts/probes/probe_features_r2c.py
"""
import sys as _sys
import os as _os
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), '..', '..'))

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from joint_vae_tpu.models.conv import packed_conv, depth_to_space

B = 512
K = 30
OUTER = 10
DT = jnp.bfloat16
rng = np.random.default_rng(0)


def bench(name, f, x, *params):
    """fwd+bwd cost of sum(f(x, *params)), differentiating w.r.t. x and
    every param; every gradient is consumed into the loop carry (an unused
    grad is DCE'd and silently drops out of the measurement)."""
    x = jnp.asarray(x, DT)
    params = [jnp.asarray(p, DT) for p in params]
    argnums = tuple(range(1 + len(params)))

    @jax.jit
    def outer(c, *rest):
        def body(i, cc):
            val, grads = jax.value_and_grad(
                lambda a, *ps: jnp.sum(f(a, *ps).astype(jnp.float32)),
                argnums=argnums)(cc, *rest)
            acc = val
            for g in grads[1:]:
                acc = acc + jnp.sum(g.astype(jnp.float32))
            return cc + 1e-30 * grads[0].astype(cc.dtype) \
                      + 1e-30 * acc.astype(cc.dtype)
        return lax.fori_loop(0, K, body, c)

    c = outer(x, *params)
    float(jnp.sum(c).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(OUTER):
        c = outer(c, *params)
    float(jnp.sum(c).astype(jnp.float32))
    dt = (time.perf_counter() - t0) / (OUTER * K)
    print(f'{name:52s} {dt*1e3:7.3f} ms', flush=True)
    return dt


def conv(x, k_, p, s):
    return lax.conv_general_dilated(
        x, k_, (s, s), [(p, p), (p, p)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def grouped_strided(x, kern, *, k, p, s, f):
    """'same'-padded stride-s conv as one im2col matmul over f horizontally
    adjacent *output* pixels: patches (N, Ho, Wo/f, cin*k*kw) with
    kw = k + s*(f-1) contract against f stride-shifted embedded copies of
    the (k, k, cin, cout) kernel -> f*cout lanes."""
    n, h, w, cin = x.shape
    cout = kern.shape[-1]
    kw = k + s * (f - 1)
    wg = jnp.stack(
        [jnp.pad(kern, ((0, 0), (s * j, s * (f - 1 - j)), (0, 0), (0, 0)))
         for j in range(f)], axis=3)                  # (k, kw, cin, f, cout)
    wg = wg.transpose(2, 0, 1, 3, 4).reshape(cin * k * kw, f * cout)
    pat = lax.conv_general_dilated_patches(
        x, (k, kw), (s, f * s), [(p, p), (p, p + s * (f - 1))],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    ho, wo = pat.shape[1], pat.shape[2]
    y = jnp.dot(pat.reshape(-1, cin * k * kw), wg,
                preferred_element_type=jnp.float32)
    return y.reshape(n, ho, wo * f, cout).astype(x.dtype)


def packed_out_s2(x, kern, *, k, h_out):
    """stride-2 conv with f_out=2 packed output, unpacked immediately."""
    y = packed_conv(x, kern, k=k, off=k // 2, num=2, den=1, f_in=1,
                    f_out=2, h_out=h_out, w_out=h_out)
    return depth_to_space(y, 2)


# ---- parity (f32) ----------------------------------------------------------
for nm, (ci, co, h) in [('c1', (32, 32, 32)), ('c3', (64, 64, 16))]:
    xa = jnp.asarray(rng.standard_normal((8, h, h, ci)).astype(np.float32))
    ka = jnp.asarray(rng.standard_normal((5, 5, ci, co)).astype(np.float32))
    ref = conv(xa, ka, 2, 2)
    for vn, fn in [('packed', lambda a, kk, hh=h: packed_out_s2(
                        a, kk, k=5, h_out=hh // 2)),
                   ('grouped f=2', lambda a, kk: grouped_strided(
                        a, kk, k=5, p=2, s=2, f=2)),
                   ('grouped f=4', lambda a, kk: grouped_strided(
                        a, kk, k=5, p=2, s=2, f=4))]:
        out = fn(xa, ka)
        err = float(jnp.max(jnp.abs(out - ref)))
        print(f'{nm} {vn:12s} parity max|err| = {err:.2e}  shape {out.shape}')
print()

# ---- c1: 32x32 32->32 k5 s2 ------------------------------------------------
x1 = rng.standard_normal((B, 32, 32, 32)).astype(np.float32)
k1 = rng.standard_normal((5, 5, 32, 32)).astype(np.float32)
bench('c1 plain conv', lambda a, kk: conv(a, kk, 2, 2), x1, k1)
bench('c1 packed f_out=2 +unpack',
      lambda a, kk: packed_out_s2(a, kk, k=5, h_out=16), x1, k1)
bench('c1 grouped-strided f=2',
      lambda a, kk: grouped_strided(a, kk, k=5, p=2, s=2, f=2), x1, k1)
bench('c1 grouped-strided f=4',
      lambda a, kk: grouped_strided(a, kk, k=5, p=2, s=2, f=4), x1, k1)
print()

# ---- c3: 16x16 64->64 k5 s2 ------------------------------------------------
x3 = rng.standard_normal((B, 16, 16, 64)).astype(np.float32)
k3 = rng.standard_normal((5, 5, 64, 64)).astype(np.float32)
bench('c3 plain conv', lambda a, kk: conv(a, kk, 2, 2), x3, k3)
bench('c3 packed f_out=2 +unpack',
      lambda a, kk: packed_out_s2(a, kk, k=5, h_out=8), x3, k3)
bench('c3 grouped-strided f=2',
      lambda a, kk: grouped_strided(a, kk, k=5, p=2, s=2, f=2), x3, k3)
print()

# ---- c0+c1 both lowered (c0 packed-out is the production winner) ----------
x0 = rng.standard_normal((B, 32, 32, 3)).astype(np.float32)
k0 = rng.standard_normal((5, 5, 3, 32)).astype(np.float32)


def c01_plain(a, kk0, kk1):
    return conv(conv(a, kk0, 2, 1), kk1, 2, 2)


def c01_lowered(a, kk0, kk1):
    y = depth_to_space(packed_conv(a, kk0, k=5, off=2, num=1, den=1,
                                   f_in=1, f_out=2, h_out=32, w_out=32), 2)
    return packed_out_s2(y, kk1, k=5, h_out=16)


bench('c0+c1 plain', c01_plain, x0, k0, k1)
bench('c0+c1 both lowered (c0 packed, c1 packed)', c01_lowered, x0, k0, k1)

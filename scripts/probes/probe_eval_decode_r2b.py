"""Eval-decode probes (fwd only, N = L*B = 8192 bf16): per-layer deconv32
costs and alternate lowerings of the dominant d5 (32x32, 32->32 k5) —
packed conv (current), packed expressed as 9 shifted dots (dot emitter vs
conv emitter), plain conv.

Run on the real TPU: python scripts/probes/probe_eval_decode_r2b.py
"""
import sys as _sys
import os as _os
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), '..', '..'))

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from joint_vae_tpu.models.conv import (packed_conv, _packed_geometry,
                                       _packed_kernel, space_to_depth,
                                       depth_to_space)

N = 8192
K = 20
OUTER = 10
DT = jnp.bfloat16
rng = np.random.default_rng(0)


def bench(name, f, *args):
    args = [jnp.asarray(a, DT) for a in args]

    @jax.jit
    def outer(c, *rest):
        def body(i, cc):
            out = f(cc, *rest)
            if out.shape == cc.shape:
                return cc + 1e-30 * out.astype(cc.dtype)
            # shape-changing op: thread a scalar dependency instead
            return cc + 1e-30 * jnp.sum(
                out.astype(jnp.float32)).astype(cc.dtype)
        return lax.fori_loop(0, K, body, c)

    c = outer(*args)
    float(jnp.sum(c).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(OUTER):
        c = outer(c, *args[1:])
    float(jnp.sum(c).astype(jnp.float32))
    dt = (time.perf_counter() - t0) / (OUTER * K)
    print(f'{name:46s} {dt*1e3:7.3f} ms', flush=True)
    return dt


def conv(x, k_, p, s):
    return lax.conv_general_dilated(
        x, k_, (s, s), [(p, p), (p, p)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


# ---- d5: 32x32 32->32 k5 'same' -------------------------------------------
x5 = rng.standard_normal((N, 32, 32, 32)).astype(np.float32)
k5 = rng.standard_normal((5, 5, 32, 32)).astype(np.float32)

xp5 = space_to_depth(jnp.asarray(x5, DT), 2)        # (N, 16, 16, 128)


def d5_packed(a, kk):
    # current lowering, on an already-packed input producing packed output
    return packed_conv(a, kk, k=5, off=2, num=1, den=1, f_in=2, f_out=2,
                       h_out=32, w_out=32)


def d5_packed_dots(a, kk):
    """the same packed geometry as 9 shifted (M,128)x(128,128) dots"""
    g, dmin, tap = _packed_geometry(5, 2, 1, 1, 2, 2)
    kd = _packed_kernel(kk, tap, tap)               # (T, T, 128, 128)
    T = kd.shape[0]
    n, hp, wp, cp = a.shape
    pad_lo, pad_hi = -dmin, (hp - 1) + (dmin + T - 1) - (hp - 1)
    ap = jnp.pad(a, ((0, 0), (pad_lo, pad_hi), (pad_lo, pad_hi), (0, 0)))
    out = jnp.zeros((n, hp, wp, kd.shape[-1]), jnp.float32)
    for dy in range(T):
        for dx in range(T):
            sl = ap[:, dy:dy + hp, dx:dx + wp, :]
            out = out + jnp.einsum('nhwc,cd->nhwd', sl, kd[dy, dx],
                                   preferred_element_type=jnp.float32)
    return out.astype(a.dtype)


# parity
pa = d5_packed(xp5, jnp.asarray(k5, DT))
pb = d5_packed_dots(xp5, jnp.asarray(k5, DT))
print(f'd5 dots parity max|err| = {float(jnp.max(jnp.abs(pa - pb))):.2e}')

bench('d5 plain conv (unpacked io)', lambda a, kk: conv(a, kk, 2, 1),
      x5, k5)
bench('d5 packed conv (packed io)', d5_packed, xp5, k5)
bench('d5 packed as 9 shifted dots (packed io)', d5_packed_dots, xp5, k5)

# ---- per-layer deconv32 fwd costs (packed io where the stack runs packed) --
print()
# d1: 8x8 64->64 k5 same, packed f2 -> 4x4x256 grid
x1 = rng.standard_normal((N, 8, 8, 64)).astype(np.float32)
k1 = rng.standard_normal((5, 5, 64, 64)).astype(np.float32)
xp1 = space_to_depth(jnp.asarray(x1, DT), 2)
bench('d1 8x8 64->64 packed', lambda a, kk: packed_conv(
    a, kk, k=5, off=2, num=1, den=1, f_in=2, f_out=2, h_out=8, w_out=8),
    xp1, k1)

# d2: deconv 8->16 64ch s2 (subpixel dense conv from unpacked 8x8x64)
k2 = rng.standard_normal((5, 5, 64, 64)).astype(np.float32)
bench('d2 deconv 8->16 s2 subpixel', lambda a, kk: packed_conv(
    a, kk, k=5, off=2, num=1, den=2, f_in=1, f_out=2, h_out=16, w_out=16),
    x1, k2)

# d3: 16x16 64->32 packed
x3 = rng.standard_normal((N, 16, 16, 64)).astype(np.float32)
k3 = rng.standard_normal((5, 5, 64, 32)).astype(np.float32)
xp3 = space_to_depth(jnp.asarray(x3, DT), 2)
bench('d3 16x16 64->32 packed', lambda a, kk: packed_conv(
    a, kk, k=5, off=2, num=1, den=1, f_in=2, f_out=2, h_out=16, w_out=16),
    xp3, k3)

# d4: deconv 16->32 32ch s2 from packed input
x4 = rng.standard_normal((N, 16, 16, 32)).astype(np.float32)
k4 = rng.standard_normal((5, 5, 32, 32)).astype(np.float32)
xp4 = space_to_depth(jnp.asarray(x4, DT), 2)
bench('d4 deconv 16->32 s2 packed io', lambda a, kk: packed_conv(
    a, kk, k=5, off=2, num=2, den=2, f_in=2, f_out=2, h_out=32, w_out=32),
    xp4, k4)

# d6: 32x32 32->3 packed
k6 = rng.standard_normal((5, 5, 32, 3)).astype(np.float32)
bench('d6 32x32 32->3 packed', lambda a, kk: packed_conv(
    a, kk, k=5, off=2, num=1, den=1, f_in=2, f_out=2, h_out=32, w_out=32),
    xp5, k6)

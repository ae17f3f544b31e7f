"""Per-layer conv32 features costs with the *training-true* backward
(c0 differentiates w.r.t. kernel only — the data is not differentiated;
mid layers w.r.t. both), plus candidate alternate lowerings:

- c0 as a 4-pixel-grouped im2col matmul (lanes 32 -> 128), pure XLA
- c0 as a 2x2-grouped im2col matmul
- c2+c3 mid-stack packing (s2d at 16x16x32, unpack before c4)

Run on the real TPU: python scripts/probes/probe_features_r2b.py
"""
import sys as _sys
import os as _os
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), '..', '..'))

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from joint_vae_tpu.models.conv import packed_conv, space_to_depth, depth_to_space

B = 512
K = 30
OUTER = 10
DT = jnp.bfloat16
rng = np.random.default_rng(0)


def bench(name, f, x, *params, wrt_x=True):
    """fwd + bwd cost of sum(f(x, *params)) differentiating w.r.t. params
    (always) and x (when wrt_x).  EVERY gradient is consumed into the loop
    carry — an unused grad output is dead-code-eliminated by XLA and the
    'backward' silently drops out of the measurement."""
    x = jnp.asarray(x, DT)
    params = [jnp.asarray(p, DT) for p in params]
    argnums = tuple(range(0 if wrt_x else 1, 1 + len(params)))

    @jax.jit
    def outer(c, *rest):
        def body(i, cc):
            val, grads = jax.value_and_grad(
                lambda a, *ps: jnp.sum(f(a, *ps).astype(jnp.float32)),
                argnums=argnums)(cc, *rest)
            acc = val
            for g in grads[1:] if wrt_x else grads:
                acc = acc + jnp.sum(g.astype(jnp.float32))
            g0 = grads[0] if wrt_x else jnp.zeros_like(cc)
            return cc + 1e-30 * g0.astype(cc.dtype) + 1e-30 * acc.astype(cc.dtype)
        return lax.fori_loop(0, K, body, c)

    c = outer(x, *params)
    float(jnp.sum(c).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(OUTER):
        c = outer(c, *params)
    float(jnp.sum(c).astype(jnp.float32))
    dt = (time.perf_counter() - t0) / (OUTER * K)
    print(f'{name:44s} {dt*1e3:7.3f} ms', flush=True)
    return dt


def conv(x, k_, p, s):
    return lax.conv_general_dilated(
        x, k_, (s, s), [(p, p), (p, p)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


# ---- per-layer baseline (training-true backward) -------------------------
layers = [  # (name, cin, cout, k, p, s, hin, wrt_x)
    ('c0 3->32 k5 32x32   (dw only)', 3, 32, 5, 2, 1, 32, False),
    ('c1 32->32 k5 s2', 32, 32, 5, 2, 2, 32, True),
    ('c2 32->64 k5 16x16', 32, 64, 5, 2, 1, 16, True),
    ('c3 64->64 k5 s2', 64, 64, 5, 2, 2, 16, True),
    ('c4 64->200 k7 p0', 64, 200, 7, 0, 1, 8, True),
]
tot = 0.0
for name, ci, co, k, p, s, h, wx in layers:
    x = rng.standard_normal((B, h, h, ci)).astype(np.float32)
    kern = rng.standard_normal((k, k, ci, co)).astype(np.float32)
    tot += bench(name, lambda a, kk, p=p, s=s: conv(a, kk, p, s),
                 x, kern, wrt_x=wx)
print(f'{"total":44s} {tot*1e3:7.3f} ms')
print()

# ---- c0 candidates --------------------------------------------------------
x0 = rng.standard_normal((B, 32, 32, 3)).astype(np.float32)
k0 = rng.standard_normal((5, 5, 3, 32)).astype(np.float32)


from joint_vae_tpu.models.conv import grouped_conv


def c0_grouped_w(a, kk, f):
    """c0 as an im2col matmul over f horizontally-adjacent output pixels —
    the production lowering (models/conv.py::grouped_conv; handles the
    patches' (cin, ky, kx) feature ordering)."""
    return grouped_conv(a, kk, k=5, p=2, f=f)


def c0_grouped_2x2(a, kk):
    """c0 as an im2col matmul over a 2x2 output-pixel group (f=2 both dims).
    Patch features are ordered (cin, ky, kx) — match it in the embed."""
    wg = jnp.stack([jnp.pad(kk, ((dy, 1 - dy), (dx, 1 - dx), (0, 0), (0, 0)))
                    for dy in range(2) for dx in range(2)],
                   axis=3)                                # (6, 6, 3, 4, 32)
    wg = wg.transpose(2, 0, 1, 3, 4).reshape(3 * 6 * 6, 4 * 32)
    pat = lax.conv_general_dilated_patches(
        a, (6, 6), (2, 2), [(2, 3), (2, 3)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))      # (B, 16, 16, 108)
    y = jnp.dot(pat.reshape(-1, 108), wg,
                preferred_element_type=jnp.float32).astype(a.dtype)
    y = y.reshape(B, 16, 16, 2, 2, 32)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(B, 32, 32, 32)


# parity check first (f32)
xa = jnp.asarray(x0)
ka = jnp.asarray(k0)
ref = conv(xa, ka, 2, 1)
for nm, fn in [('g4', lambda a, kk: c0_grouped_w(a, kk, 4)),
               ('g8', lambda a, kk: c0_grouped_w(a, kk, 8)),
               ('2x2', c0_grouped_2x2)]:
    err = float(jnp.max(jnp.abs(fn(xa, ka) - ref)))
    print(f'c0 {nm} parity max|err| = {err:.2e}')

bench('c0 grouped f=4 (dw only)', lambda a, kk: c0_grouped_w(a, kk, 4),
      x0, k0, wrt_x=False)
bench('c0 grouped f=8 (dw only)', lambda a, kk: c0_grouped_w(a, kk, 8),
      x0, k0, wrt_x=False)
bench('c0 grouped 2x2 (dw only)', c0_grouped_2x2, x0, k0, wrt_x=False)
bench('c0 packed f_out=2 +unpack (dw only)',
      lambda a, kk: depth_to_space(
          packed_conv(a, kk, k=5, off=2, num=1, den=1, f_in=1, f_out=2,
                      h_out=32, w_out=32), 2),
      x0, k0, wrt_x=False)
print()

# ---- mid-stack packing: c2+c3 packed vs plain -----------------------------
x2 = rng.standard_normal((B, 16, 16, 32)).astype(np.float32)
k2 = rng.standard_normal((5, 5, 32, 64)).astype(np.float32)
k3 = rng.standard_normal((5, 5, 64, 64)).astype(np.float32)


def c23_plain(a, kk2, kk3):
    return conv(conv(a, kk2, 2, 1), kk3, 2, 2)


def c23_packed(a, kk2, kk3):
    y = packed_conv(a, kk2, k=5, off=2, num=1, den=1, f_in=1, f_out=2,
                    h_out=16, w_out=16)
    y = packed_conv(y, kk3, k=5, off=2, num=2, den=1, f_in=2, f_out=2,
                    h_out=8, w_out=8)
    return depth_to_space(y, 2)


err = float(jnp.max(jnp.abs(c23_packed(jnp.asarray(x2), jnp.asarray(k2),
                                       jnp.asarray(k3))
                            - c23_plain(jnp.asarray(x2), jnp.asarray(k2),
                                        jnp.asarray(k3)))))
print(f'c2+c3 packed parity max|err| = {err:.2e}')
bench('c2+c3 plain', c23_plain, x2, k2, k3)
bench('c2+c3 packed chain (+unpack)', c23_packed, x2, k2, k3)

# c2 alone packed
bench('c2 plain', lambda a, kk: conv(a, kk, 2, 1), x2, k2)
bench('c2 packed f2 (+unpack)',
      lambda a, kk: depth_to_space(
          packed_conv(a, kk, k=5, off=2, num=1, den=1, f_in=1, f_out=2,
                      h_out=16, w_out=16), 2),
      x2, k2)

"""Pallas same-grid conv vs XLA on the eval-decode geometries (fwd only,
N = L*B = 8192, bf16) — the decode layers of deconv32 exactly as
ConvStack lowers them (packed f=2 / subpixel / unpacked), per layer, with
a max_m sweep on the dominant d5.

Run on the real TPU: python scripts/probes/probe_pallas_conv.py
"""
import sys as _sys
import os as _os
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), '..', '..'))

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from joint_vae_tpu.models.conv import packed_conv

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
    print(f'{name:52s} {dt*1e3:7.3f} ms', flush=True)
    return dt


def plain(x, kk, p):
    return lax.conv_general_dilated(
        x, kk, (1, 1), [(p, p), (p, p)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


LAYERS = {
    # name: (input shape, kernel, packed_conv kwargs)
    'd1 8x8 64->64 k5 (unpacked)': (
        (N, 8, 8, 64), (5, 5, 64, 64),
        dict(k=5, off=2, num=1, den=1, f_in=1, f_out=1, h_out=8, w_out=8)),
    'd2 subpixel 8->16 64ch': (
        (N, 8, 8, 64), (5, 5, 64, 64),
        dict(k=5, off=2, num=1, den=2, f_in=1, f_out=2, h_out=16, w_out=16)),
    'd3 16x16 64->32 packed': (
        (N, 8, 8, 256), (5, 5, 64, 32),
        dict(k=5, off=2, num=1, den=1, f_in=2, f_out=2, h_out=16, w_out=16)),
    'd4 subpixel 16->32 32ch': (
        (N, 16, 16, 32), (5, 5, 32, 32),
        dict(k=5, off=2, num=1, den=2, f_in=1, f_out=2, h_out=32, w_out=32)),
    'd5 32x32 32->32 packed': (
        (N, 16, 16, 128), (5, 5, 32, 32),
        dict(k=5, off=2, num=1, den=1, f_in=2, f_out=2, h_out=32, w_out=32)),
    'd6 32x32 32->3 packed': (
        (N, 16, 16, 128), (5, 5, 32, 3),
        dict(k=5, off=2, num=1, den=1, f_in=2, f_out=2, h_out=32, w_out=32)),
}


def run(name, xs, ks, kw):
    x = rng.standard_normal(xs).astype(np.float32)
    kk = rng.standard_normal(ks).astype(np.float32) * 0.1
    fn = lambda a, b: packed_conv(a, b, **kw)
    _os.environ['JVT_PALLAS_CONV'] = ''
    t_xla = bench(name + ' [xla]', fn, x, kk)
    _os.environ['JVT_PALLAS_CONV'] = '1'
    # parity on device first
    xa, ka = jnp.asarray(x[:64], DT), jnp.asarray(kk, DT)
    _os.environ['JVT_PALLAS_CONV'] = ''
    ref = jax.jit(fn)(xa, ka)
    _os.environ['JVT_PALLAS_CONV'] = '1'
    got = jax.jit(fn)(xa, ka)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    t_pal = bench(name + ' [pallas]', fn, x, kk)
    print(f'{"":52s} ratio {t_xla/t_pal:5.2f}x  parity {err:.2e}',
          flush=True)


for name, (xs, ks, kw) in LAYERS.items():
    run(name, xs, ks, kw)
    print()

# max_m sweep on d5
xs, ks, kw = LAYERS['d5 32x32 32->32 packed']
x = rng.standard_normal(xs).astype(np.float32)
kk = rng.standard_normal(ks).astype(np.float32) * 0.1
_os.environ['JVT_PALLAS_CONV'] = '1'
for m in (1024, 2048, 4096, 8192):
    _os.environ['JVT_PALLAS_CONV_M'] = str(m)
    bench(f'd5 pallas max_m={m}', lambda a, b: packed_conv(a, b, **kw), x, kk)

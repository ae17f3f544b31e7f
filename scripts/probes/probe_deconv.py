"""Probe: dilated-deconv vs matmul / sub-pixel dense conv, on the real TPU.

Times the two hot deconv patterns of the flagship decoder (deconv32):
  d0: 512ch 1x1 -> 8x8x64, k=8, p=0, s=1   (padded conv vs one matmul)
  d2: 64ch 8x8 -> 16x16x64, k=5, p=2, s=2, op=1 (lhs-dilated vs subpixel)
  d4: 32ch 16x16 -> 32x32x32, same geometry
Checks numerical parity first.
"""
import sys as _sys; _sys.path.insert(0, '/root/repo')
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

B = 256
DT = jnp.bfloat16


def timeit(f, *args, n=100, warmup=5):
    for _ in range(warmup):
        o = f(*args)
    jnp.asarray(o).block_until_ready()
    float(jnp.sum(o[0] if isinstance(o, tuple) else o).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*args)
    float(jnp.sum(o[0] if isinstance(o, tuple) else o).astype(jnp.float32))
    return (time.perf_counter() - t0) / n


def dilated(x, k_, k, p, s, op):
    pad = (k - 1 - p, k - 1 - p + op)
    return lax.conv_general_dilated(
        x, k_, window_strides=(1, 1), padding=[pad, pad],
        lhs_dilation=(s, s), dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def one_by_one_matmul(x, k_, k, p, s, op):
    # x: (N,1,1,Cin); y[m,n] = K[A-m, A-n] . x  with A=k-1-p (p=0,op=0 case)
    kf = k_[::-1, ::-1]                       # (k,k,Cin,Cout)
    y = jnp.einsum('nc,hwcd->nhwd', x[:, 0, 0, :], kf)
    return y


def make_subpixel(k, p, s, op, cin, cout):
    A = k - 1 - p
    phases = []
    for r in range(s):
        c = (A - r) % s
        taps = list(range(c, k, s))
        e = (r - A + c) // s
        phases.append((c, taps, e))
    lo = min(e for _, t, e in phases if t)
    hi = max(e + len(t) - 1 for _, t, e in phases if t)
    W = hi - lo + 1

    def build_dense(k_):
        # k_: (k,k,cin,cout) -> (W,W,cin, s*s*cout), channel (rh, rw, co)
        cols = []
        for rh in range(s):
            ch, th, eh = phases[rh]
            for rw in range(s):
                cw, tw, ew = phases[rw]
                block = jnp.zeros((W, W, cin, cout), k_.dtype)
                for ai, a in enumerate(th):
                    for bi, b in enumerate(tw):
                        block = block.at[eh + ai - lo, ew + bi - lo].set(
                            k_[a, b])
                cols.append(block)
        return jnp.concatenate(cols, axis=-1)

    def apply(x, k_, h_out, w_out):
        kd = build_dense(k_)
        n, h, w, _ = x.shape
        nmax_h = -(-h_out // s)
        nmax_w = -(-w_out // s)
        pad_l = -lo
        pad_r_h = (nmax_h - 1 + hi) - (h - 1)
        pad_r_w = (nmax_w - 1 + hi) - (w - 1)
        y = lax.conv_general_dilated(
            x, kd, window_strides=(1, 1),
            padding=[(pad_l, pad_r_h), (pad_l, pad_r_w)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        # depth_to_space
        y = y.reshape(n, nmax_h, nmax_w, s, s, cout)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(n, nmax_h * s, nmax_w * s,
                                                  cout)
        return y[:, :h_out, :w_out]
    return apply


def main():
    print('devices:', jax.devices())
    rng = np.random.default_rng(0)

    # ---- d0: 1x1x512 -> 8x8x64, k=8, p=0 ----
    x0 = jnp.asarray(rng.standard_normal((B, 1, 1, 512)), DT)
    k0 = jnp.asarray(rng.standard_normal((8, 8, 512, 64)) * 0.05, DT)
    f_dil = jax.jit(lambda x, k: dilated(x, k, 8, 0, 1, 0))
    f_mm = jax.jit(lambda x, k: one_by_one_matmul(x, k, 8, 0, 1, 0))
    a, b = f_dil(x0, k0), f_mm(x0, k0)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    t_dil = timeit(f_dil, x0, k0)
    t_mm = timeit(f_mm, x0, k0)
    print(f'd0 1x1->8x8x64 k8: dilated {t_dil*1e6:.0f}us  matmul {t_mm*1e6:.0f}us  maxerr {err:.2e}')

    # ---- d2: 8x8x64 -> 16x16x64, k5 p2 s2 op1 ----
    for (h, cin, cout, tag) in [(8, 64, 64, 'd2'), (16, 64, 32, 'd4?'),
                                (16, 32, 32, 'd4')]:
        x = jnp.asarray(rng.standard_normal((B, h, h, cin)), DT)
        kk = jnp.asarray(rng.standard_normal((5, 5, cin, cout)) * 0.05, DT)
        h_out = h * 2
        f_d = jax.jit(lambda x, k: dilated(x, k, 5, 2, 2, 1))
        sp = make_subpixel(5, 2, 2, 1, cin, cout)
        f_s = jax.jit(lambda x, k: sp(x, k, h_out, h_out))
        a, b = f_d(x, kk), f_s(x, kk)
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        t_d = timeit(f_d, x, kk)
        t_s = timeit(f_s, x, kk)
        print(f'{tag} {h}x{h}x{cin}->{h_out}x{h_out}x{cout} s2: dilated {t_d*1e6:.0f}us  subpixel {t_s*1e6:.0f}us  maxerr {err:.2e}')

    # grad through both paths (train matters)
    x = jnp.asarray(rng.standard_normal((B, 8, 8, 64)), DT)
    kk = jnp.asarray(rng.standard_normal((5, 5, 64, 64)) * 0.05, DT)
    sp = make_subpixel(5, 2, 2, 1, 64, 64)
    g_d = jax.jit(jax.grad(lambda k: jnp.sum(dilated(x, k, 5, 2, 2, 1).astype(jnp.float32) ** 2)))
    g_s = jax.jit(jax.grad(lambda k: jnp.sum(sp(x, k, 16, 16).astype(jnp.float32) ** 2)))
    ga, gb = g_d(kk), g_s(kk)
    err = float(jnp.max(jnp.abs(ga.astype(jnp.float32) - gb.astype(jnp.float32))))
    t_gd = timeit(g_d, kk)
    t_gs = timeit(g_s, kk)
    print(f'grad d2: dilated {t_gd*1e6:.0f}us  subpixel {t_gs*1e6:.0f}us  maxerr {err:.2e}')


if __name__ == '__main__':
    main()

"""Per-layer deconv32 cost: fwd and fwd+bwd, dilated vs subpixel lowering."""
import sys as _sys; _sys.path.insert(0, '/root/repo')
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from joint_vae_tpu.models.conv import (_flipped_1x1_kernel, depth_to_space,
                                       packed_conv)

B = 256
K = 50
OUTER = 10
DT = jnp.bfloat16


def bench(name, body, init):
    @jax.jit
    def outer(c):
        return lax.fori_loop(0, K, lambda i, cc: body(cc), c)
    c = outer(init)
    jax.tree.map(lambda a: a.block_until_ready(), c)
    float(jnp.sum(jax.tree.leaves(c)[0]).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(OUTER):
        c = outer(c)
    float(jnp.sum(jax.tree.leaves(c)[0]).astype(jnp.float32))
    dt = (time.perf_counter() - t0) / (OUTER * K)
    print(f'{name:44s} {dt*1e3:7.3f} ms')
    return dt


def dilated(x, k_, k, p, s, op):
    pad = (k - 1 - p, k - 1 - p + op)
    return lax.conv_general_dilated(
        x, k_, (1, 1), [pad, pad], lhs_dilation=(s, s),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def plain_conv(x, k_, k, p, s):
    return lax.conv_general_dilated(
        x, k_, (s, s), [(p, p), (p, p)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


rng = np.random.default_rng(0)
# (tag, h, cin, cout, k, p, s, op, kind)
layers = [
    ('d0 1x1x512->8x8x64 k8', 1, 512, 64, 8, 0, 1, 0, 'deconv'),
    ('d1 8x8 64->64 k5', 8, 64, 64, 5, 2, 1, 0, 'deconv'),
    ('d2 8->16 64->64 s2', 8, 64, 64, 5, 2, 2, 1, 'deconv'),
    ('d3 16x16 64->32 k5', 16, 64, 32, 5, 2, 1, 0, 'deconv'),
    ('d4 16->32 32->32 s2', 16, 32, 32, 5, 2, 2, 1, 'deconv'),
    ('d5 32x32 32->32 k5', 32, 32, 32, 5, 2, 1, 0, 'deconv'),
    ('d6 conv 32->3 k5', 32, 32, 3, 5, 2, 1, 0, 'conv'),
]

for tag, h, cin, cout, k, p, s, op, kind in layers:
    x = jnp.asarray(rng.standard_normal((B, h, h, cin)), DT)
    kk = jnp.asarray(rng.standard_normal((k, k, cin, cout)) * 0.05, DT)

    paths = {}
    if kind == 'conv':
        paths['plain'] = lambda x_, k_: plain_conv(x_, k_, k, p, s)
    else:
        paths['dilated'] = lambda x_, k_: dilated(x_, k_, k, p, s, op)
        if h == 1:
            h_out = k - 2 * p + op
            paths['matmul'] = lambda x_, k_: jnp.einsum(
                'nc,hwcd->nhwd', x_[:, 0, 0, :], _flipped_1x1_kernel(k_, k, p, h_out))
        elif s > 1:
            # current subpixel lowering: dense conv to s^2-packed
            # channels + depth_to_space (models/conv.py deconv s>1 path)
            ho = (h - 1) * s - 2 * p + k + op
            paths['subpixel'] = (lambda x_, k_, ho=ho: depth_to_space(
                packed_conv(x_, k_, k=k, off=k - 1 - p, num=1, den=s,
                            f_in=1, f_out=s, h_out=ho, w_out=ho), s))

    for pname, f in paths.items():
        def fwd_body(c, f=f):
            xx, kkk = c
            y = f(xx, kkk)
            return (xx + 0 * jnp.sum(y).astype(DT), kkk)
        bench(f'{tag} [{pname}] fwd', fwd_body, (x, kk))

        def fb_body(c, f=f):
            xx, kkk = c
            g = jax.grad(lambda kp: jnp.sum(f(xx, kp).astype(jnp.float32) ** 2))(kkk)
            return (xx, kkk + 1e-30 * g)
        bench(f'{tag} [{pname}] fwd+bwd(k)', fb_body, (x, kk))

        def fbx_body(c, f=f):
            xx, kkk = c
            gx, gk = jax.grad(lambda xp, kp: jnp.sum(
                f(xp, kp).astype(jnp.float32) ** 2), argnums=(0, 1))(xx, kkk)
            return (xx + 1e-30 * gx, kkk + 1e-30 * gk)
        bench(f'{tag} [{pname}] fwd+bwd(x,k)', fbx_body, (x, kk))

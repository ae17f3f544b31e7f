"""Isolated cost of the packed lowerings vs the unpacked ones."""
import sys as _sys; _sys.path.insert(0, '/root/repo')
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from joint_vae_tpu.models.conv import packed_conv, _packed_geometry, _packed_kernel

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
    print(f'{name:46s} {dt*1e3:7.3f} ms')
    return dt


rng = np.random.default_rng(0)

# d5: 32x32x32 -> 32x32x32 k5 p2 s1.  packed f2: (16,16,128)->(16,16,128)
cases = [
    ('d5 f2 conv 16x16 128->128 (true 32x32x32)', 5, 2, 1, 0, False, 16, 32, 32, 2, 2, 32, 32),
    ('d3 f2 conv 8x8 256->128 (true 16x16 64->32)', 5, 2, 1, 0, False, 8, 64, 32, 2, 2, 16, 16),
    ('d6 f2->f4 conv (true 32x32 32->3)', 5, 2, 1, 0, False, 16, 32, 3, 2, 4, 32, 32),
    ('d6 f2->f2 conv (true 32x32 32->3)', 5, 2, 1, 0, False, 16, 32, 3, 2, 2, 32, 32),
    ('d4 subpix f1->f2 (true 16x16 32->32 s2)', 5, 2, 2, 1, True, 16, 32, 32, 1, 2, 32, 32),
]

for (tag, k, p, s, op, is_dc, hp, cin_t, cout_t, f_in, f_out, h_out, w_out) in cases:
    cin_pack = f_in * f_in * cin_t
    x = jnp.asarray(rng.standard_normal((B, hp, hp, cin_pack)), DT)
    kk = jnp.asarray(rng.standard_normal((k, k, cin_t, cout_t)) * 0.05, DT)
    num, den, off = (1, s, k - 1 - p) if is_dc else (s, 1, p)

    def f(x_, k_, num=num, den=den, off=off, f_in=f_in, f_out=f_out, k2=k,
          h_out=h_out, w_out=w_out):
        return packed_conv(x_, k_, k=k2, off=off, num=num, den=den,
                           f_in=f_in, f_out=f_out, h_out=h_out, w_out=w_out)

    def fwd_body(c, f=f):
        xx, kkk = c
        y = f(xx, kkk)
        return (xx + 0 * jnp.sum(y).astype(DT), kkk)
    bench(f'{tag} fwd', fwd_body, (x, kk))

    def fbx_body(c, f=f):
        xx, kkk = c
        gx, gk = jax.grad(lambda xp, kp: jnp.sum(
            f(xp, kp).astype(jnp.float32) ** 2), argnums=(0, 1))(xx, kkk)
        return (xx + 1e-30 * gx, kkk + 1e-30 * gk)
    bench(f'{tag} fwd+bwd(x,k)', fbx_body, (x, kk))

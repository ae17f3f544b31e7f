"""Per-layer conv32 features cost (fwd+bwd) at B=512 bf16, and packed
variants of the candidates."""
import sys as _sys; _sys.path.insert(0, '/root/repo')
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


def bench(name, f, *args):
    args = [jnp.asarray(a) for a in args]

    @jax.jit
    def outer(c, *rest):
        def body(i, cc):
            y, g = jax.value_and_grad(lambda a: jnp.sum(
                f(a, *rest).astype(jnp.float32)))(cc)
            return cc + 1e-30 * g.astype(cc.dtype)
        return lax.fori_loop(0, K, body, c)

    c = outer(*args)
    float(jnp.sum(c).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(OUTER):
        c = outer(c, *args[1:])
    float(jnp.sum(c).astype(jnp.float32))
    dt = (time.perf_counter() - t0) / (OUTER * K)
    print(f'{name:40s} {dt*1e3:7.3f} ms', flush=True)
    return dt


def conv(x, k_, p, s):
    return lax.conv_general_dilated(
        x, k_, (s, s), [(p, p), (p, p)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


layers = [  # (name, cin, cout, k, p, s, hin)
    ('c0 3->32 k5 32x32', 3, 32, 5, 2, 1, 32),
    ('c1 32->32 k5 s2', 32, 32, 5, 2, 2, 32),
    ('c2 32->64 k5 16x16', 32, 64, 5, 2, 1, 16),
    ('c3 64->64 k5 s2', 64, 64, 5, 2, 2, 16),
    ('c4 64->200 k7 p0', 64, 200, 7, 0, 1, 8),
]
tot = 0.0
for name, ci, co, k, p, s, h in layers:
    x = rng.standard_normal((B, h, h, ci)).astype(np.float32)
    kern = rng.standard_normal((k, k, ci, co)).astype(np.float32)
    x = jnp.asarray(x, DT)
    kern = jnp.asarray(kern, DT)
    tot += bench(name, lambda a, kk: conv(a, kk, p, s), x, kern)
print(f'{"total":40s} {tot*1e3:7.3f} ms')

# packed c0: f_in=1 -> f_out=2 (x stays unpacked; output packed 128ch),
# then unpack.  True comparison includes the unpack.
x = jnp.asarray(rng.standard_normal((B, 32, 32, 3)).astype(np.float32), DT)
kern = jnp.asarray(rng.standard_normal((5, 5, 3, 32)).astype(np.float32), DT)


def c0_packed(a, kk):
    y = packed_conv(a, kk, k=5, off=2, num=1, den=1, f_in=1, f_out=2,
                    h_out=32, w_out=32)
    return depth_to_space(y, 2)


bench('c0 packed f_out=2 (+unpack)', c0_packed, x, kern)

# c0+c1 packed chain: pack output of c0 (f=2), run c1 (s2) packed->packed?
# c1 stride 2 on f=2-packed input with f_out=2: g = 2*2/2 = 2
kern1 = jnp.asarray(rng.standard_normal((5, 5, 32, 32)).astype(np.float32), DT)


def c01_packed(a, kk, kk1):
    y = packed_conv(a, kk, k=5, off=2, num=1, den=1, f_in=1, f_out=2,
                    h_out=32, w_out=32)
    y = packed_conv(y, kk1, k=5, off=2, num=2, den=1, f_in=2, f_out=2,
                    h_out=16, w_out=16)
    return depth_to_space(y, 2)


def c01_plain(a, kk, kk1):
    y = conv(a, kk, 2, 1)
    return conv(y, kk1, 2, 2)


bench('c0+c1 plain', c01_plain, x, kern, kern1)
bench('c0+c1 packed chain (+unpack)', c01_packed, x, kern, kern1)

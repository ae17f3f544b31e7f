"""A/B the packed lowering per stack: conv32 features and deconv32 imager."""
import sys as _sys; _sys.path.insert(0, '/root/repo')
import os
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

import joint_vae_tpu.models.conv as C

B = 256
K = 30
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
    print(f'{name:40s} {dt*1e3:7.3f} ms')
    return dt


rng = np.random.default_rng(0)

for packv in ('2', '0'):
    os.environ['JVT_PACK'] = packv

    # features conv32
    name, plans, out = C.conv_stack_plan((3, 32, 32), 'conv32', where='input')
    stack = C.ConvStack(input_shape=(3, 32, 32), plans=plans, where='input', dtype=DT)
    x = jnp.asarray(rng.uniform(0, 1, (B, 3, 32, 32)), jnp.float32)
    params = stack.init(jax.random.PRNGKey(0), x)['params']

    def feat_body(p, stack=stack, x=x):
        def f(pp):
            return jnp.sum(jnp.square(stack.apply({'params': pp}, x).astype(jnp.float32)))
        g = jax.grad(f)(p)
        return jax.tree.map(lambda a, b: a + 1e-30 * b.astype(a.dtype), p, g)
    bench(f'conv32 fwd+bwd pack={packv}', feat_body, params)

    # imager deconv32
    name, plans, out = C.conv_stack_plan((512, 1, 1), 'deconv32', where='output',
                                         output_activation='sigmoid')
    dstack = C.ConvStack(input_shape=(512, 1, 1), plans=plans, where='output', dtype=DT)
    u = jnp.asarray(rng.standard_normal((B, 512, 1, 1)), jnp.float32)
    dparams = dstack.init(jax.random.PRNGKey(0), u)['params']

    def dec_body(p, dstack=dstack, u=u):
        def f(pp):
            return jnp.sum(jnp.square(dstack.apply({'params': pp}, u).astype(jnp.float32)))
        g = jax.grad(f)(p)
        return jax.tree.map(lambda a, b: a + 1e-30 * b.astype(a.dtype), p, g)
    bench(f'deconv32 fwd+bwd pack={packv}', dec_body, dparams)

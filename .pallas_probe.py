import time, numpy as np, jax, jax.numpy as jnp
from joint_vae_tpu.ops.pallas_kernels import iws_fused, iws_reference_combine

RNG = np.random.default_rng(0)
L, N, K, C = 16, 512, 128, 100
z = jnp.asarray(RNG.normal(size=(L, N, K)).astype(np.float32))
lp = jnp.asarray(RNG.normal(size=(L, N)).astype(np.float32))
mean = jnp.asarray(RNG.normal(size=(C, K)).astype(np.float32))
s2 = jnp.asarray(RNG.uniform(0.5, 2, size=(C,)).astype(np.float32))
ldp = jnp.asarray(RNG.normal(size=(C,)).astype(np.float32))

a = iws_fused(z, lp, mean, s2, ldp, ref_mode=True, interpret=False)
b = iws_reference_combine(z, lp, mean, s2, ldp, ref_mode=True)
print('parity:', float(jnp.max(jnp.abs(a - b))))
for name, fn in (('pallas', lambda: iws_fused(z, lp, mean, s2, ldp, ref_mode=True, interpret=False)),
                 ('xla', lambda: jax.jit(iws_reference_combine, static_argnames='ref_mode')(z, lp, mean, s2, ldp, ref_mode=True))):
    fn(); r = fn()
    t0 = time.perf_counter()
    for _ in range(50):
        r = fn()
    print(name, float(jnp.sum(r)) and (time.perf_counter()-t0)/50*1e6, 'us')

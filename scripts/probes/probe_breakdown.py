"""Breakdown of the flagship train step: time sub-programs with chained
dispatch (each call consumes the previous call's output), 200 iterations."""
import sys as _sys; _sys.path.insert(0, '/root/repo')
import time
import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _flagship_cfg
from joint_vae_tpu.save_load.jobs import new_job
from joint_vae_tpu.train.optimizers import OptimizerConfig, build_optimizer
from joint_vae_tpu.train.steps import make_train_step
from joint_vae_tpu.models.evaluate import evaluate

B = 256
STEPS = 200

cfg = _flagship_cfg(compute_dtype='bfloat16')
job = new_job(cfg, OptimizerConfig(lr=1e-4), key=jax.random.PRNGKey(0))
model = job.model
tx = build_optimizer(job.opt_cfg)
state = job.state

rng = np.random.default_rng(0)
x = jnp.asarray(rng.uniform(0, 1, (B, *cfg.input_shape)).astype(np.float32))
y = jnp.asarray(rng.integers(0, cfg.num_labels, B).astype(np.int32))


def bench(name, fn, init):
    c = init
    for _ in range(10):
        c = fn(c)
    jax.tree.map(lambda a: a.block_until_ready(), c)
    float(jnp.sum(jax.tree.leaves(c)[0]).astype(jnp.float32))
    t0 = time.perf_counter()
    c2 = c
    for _ in range(STEPS):
        c2 = fn(c2)
    float(jnp.sum(jax.tree.leaves(c2)[0]).astype(jnp.float32))
    dt = (time.perf_counter() - t0) / STEPS
    print(f'{name:32s} {dt*1e3:7.3f} ms/step  {B/dt/1e3:8.1f}k img/s')
    return dt


# 1. full train step
step = make_train_step(model, tx, donate=False)
def full(s):
    s, m = step(s, x, y)
    return s
bench('full train step', full, state)

variables = state.variables
sigma_state = state.sigma_state
params = state.params

# 2. forward-only loss (no grad)
@jax.jit
def fwd_only(p):
    out = evaluate(model, {'params': p}, x, y, rng=jax.random.PRNGKey(1),
                   sigma_state=sigma_state, train=True, with_beta=True)
    loss = jnp.mean(out.losses['total'])
    return jax.tree.map(lambda a: a * (1 + 0e0 * loss.astype(a.dtype)), p), loss
bench('fwd loss only', lambda c: fwd_only(c)[0], params)

# 3. fwd + bwd (no optimizer)
@jax.jit
def fwd_bwd(p):
    def f(pp):
        out = evaluate(model, {'params': pp}, x, y, rng=jax.random.PRNGKey(1),
                       sigma_state=sigma_state, train=True, with_beta=True)
        return jnp.mean(out.losses['total'])
    l, g = jax.value_and_grad(f)(p)
    return jax.tree.map(lambda a, b: a + 1e-30 * b.astype(a.dtype), p, g)
bench('fwd+bwd (no opt)', fwd_bwd, params)

# 4. features (conv32) fwd+bwd
fp = params['features_stack']
@jax.jit
def feat_fb(p):
    def f(pp):
        t = model.apply({'params': {**params, 'features_stack': pp}}, x, True,
                        method=lambda m, a, tr: m.features(a, tr))
        return jnp.sum(jnp.square(t.astype(jnp.float32)))
    l, g = jax.grad(f)(p), None
    return jax.tree.map(lambda a, b: a + 1e-30 * b.astype(a.dtype), p, l[0] if isinstance(l, tuple) else l)
bench('features conv32 fwd+bwd', feat_fb, fp)

# 5. decode fwd+bwd: z (1, B, K) like train (L=1)
z = jnp.asarray(rng.standard_normal((1, B, cfg.latent_dim)).astype(np.float32))
dp = {'decoder': params['decoder'], 'imager': params['imager']}
@jax.jit
def dec_fb(p):
    def f(pp):
        xr = model.apply({'params': {**params, **pp}}, z, True,
                         method=lambda m, a, tr: m.decode(a, tr))
        return jnp.sum(jnp.square(xr.astype(jnp.float32)))
    g = jax.grad(f)(p)
    return jax.tree.map(lambda a, b: a + 1e-30 * b.astype(a.dtype), p, g)
bench('decode (L=1) fwd+bwd', dec_fb, dp)

# 6. encoder MLP+heads fwd+bwd on features output
t_feat = model.apply({'params': params}, x, False,
                     method=lambda m, a, tr: m.features(a, tr))
ep = params['encoder']
@jax.jit
def enc_fb(p):
    def f(pp):
        mu, lv, _ = model.apply({'params': {**params, 'encoder': pp}}, t_feat,
                                method=lambda m, a: m.encode(a, None, True))
        return jnp.sum(jnp.square(mu.astype(jnp.float32))) + jnp.sum(jnp.square(lv.astype(jnp.float32)))
    g = jax.grad(f)(p)
    return jax.tree.map(lambda a, b: a + 1e-30 * b.astype(a.dtype), p, g)
bench('encoder mlp fwd+bwd', enc_fb, ep)

# 7. optimizer update alone
g0 = jax.tree.map(jnp.zeros_like, params)
opt_state = state.opt_state
@jax.jit
def opt_only(c):
    p, os_ = c
    u, os2 = tx.update(g0, os_, p)
    import optax
    return (optax.apply_updates(p, u), os2)
bench('optimizer update only', opt_only, (params, opt_state))

"""True device-time breakdown: K=20 iterations inside one jitted fori_loop."""
import sys as _sys; _sys.path.insert(0, '/root/repo')
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from __graft_entry__ import _flagship_cfg
from joint_vae_tpu.save_load.jobs import new_job
from joint_vae_tpu.train.optimizers import OptimizerConfig, build_optimizer
from joint_vae_tpu.train.steps import make_train_step
from joint_vae_tpu.models.evaluate import evaluate

B = 256
K = 20      # inner iterations per dispatch
OUTER = 20

cfg = _flagship_cfg(compute_dtype='bfloat16')
job = new_job(cfg, OptimizerConfig(lr=1e-4), key=jax.random.PRNGKey(0))
model = job.model
tx = build_optimizer(job.opt_cfg)
state = job.state

rng = np.random.default_rng(0)
x = jnp.asarray(rng.uniform(0, 1, (B, *cfg.input_shape)).astype(np.float32))
y = jnp.asarray(rng.integers(0, cfg.num_labels, B).astype(np.int32))


def bench(name, body, init):
    """body: carry -> carry; wrapped in fori_loop(K) inside one jit."""
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
    print(f'{name:32s} {dt*1e3:7.3f} ms/iter  {B/dt/1e3:8.1f}k img/s')
    return dt


params = state.params
sigma_state = state.sigma_state

# 0. floor
bench('floor (p *= 1)', lambda c: jax.tree.map(lambda a: a * 1, c),
      {'w': jnp.ones((1024,), jnp.float32)})

# 1. full train step (fixed batch)
step_fn = make_train_step(model, tx, donate=False)
bench('full train step', lambda s: step_fn(s, x, y)[0], state)

def perturb(p, g, eps=1e-30):
    return jax.tree.map(lambda a, b: a + eps * b.astype(a.dtype), p, g)

# 2. fwd only
def fwd_body(p):
    out = evaluate(model, {'params': p}, x, y, rng=jax.random.PRNGKey(1),
                   sigma_state=sigma_state, train=True, with_beta=True)
    loss = jnp.mean(out.losses['total'])
    return jax.tree.map(lambda a: a + 0 * loss.astype(a.dtype), p)
bench('fwd loss only', fwd_body, params)

# 3. fwd+bwd
def fb_body(p):
    def f(pp):
        out = evaluate(model, {'params': pp}, x, y, rng=jax.random.PRNGKey(1),
                       sigma_state=sigma_state, train=True, with_beta=True)
        return jnp.mean(out.losses['total'])
    l, g = jax.value_and_grad(f)(p)
    return perturb(p, g)
bench('fwd+bwd (no opt)', fb_body, params)

# 4. features fwd+bwd
def feat_body(p):
    def f(pp):
        t = model.apply({'params': {**params, 'features_stack': pp}}, x, True,
                        method=lambda m, a, tr: m.features(a, tr))
        return jnp.sum(jnp.square(t.astype(jnp.float32)))
    g = jax.grad(f)(p)
    return perturb(p, g)
bench('features conv32 fwd+bwd', feat_body, params['features_stack'])

# 5. decode fwd+bwd
z = jnp.asarray(rng.standard_normal((1, B, cfg.latent_dim)).astype(np.float32))
def dec_body(p):
    def f(pp):
        xr = model.apply({'params': {**params, **pp}}, z, True,
                         method=lambda m, a, tr: m.decode(a, tr))
        return jnp.sum(jnp.square(xr.astype(jnp.float32)))
    g = jax.grad(f)(p)
    return perturb(p, g)
bench('decode (L=1) fwd+bwd',
      dec_body, {'decoder': params['decoder'], 'imager': params['imager']})

# 5b. imager (deconv32) alone fwd+bwd
u = jnp.asarray(rng.standard_normal((B, 512)).astype(np.float32))
def im_body(p):
    def f(pp):
        xr = model.apply(
            {'params': {**params, 'imager': pp}},
            u.reshape((-1,) + tuple(model.apply({'params': params},
                                                method=lambda m: m.imager_input_shape))),
            True, method=lambda m, a, tr: m.imager(a, tr))
        return jnp.sum(jnp.square(xr.astype(jnp.float32)))
    g = jax.grad(f)(p)
    return perturb(p, g)
bench('imager deconv32 fwd+bwd', im_body, params['imager'])

# 6. optimizer update only
g0 = jax.tree.map(lambda a: jnp.full_like(a, 1e-30), params)
import optax
def opt_body(c):
    p, os_ = c
    u_, os2 = tx.update(g0, os_, p)
    return (optax.apply_updates(p, u_), os2)
bench('optimizer update only', opt_body, (params, state.opt_state))

# 7. prior kl + scoring math alone (per-class, train shapes)
from joint_vae_tpu.ops.priors import prior_kl
mu = jnp.asarray(rng.standard_normal((B, cfg.latent_dim)).astype(np.float32))
lv = jnp.asarray(rng.standard_normal((B, cfg.latent_dim)).astype(np.float32) * 0.1)
def kl_body(p):
    comp = prior_kl(cfg.prior, p, mu, lv, y=y)
    return jax.tree.map(lambda a: a + 0 * jnp.mean(comp['kl']).astype(a.dtype), p)
bench('prior kl (train, gathered y)', kl_body, params['prior'])

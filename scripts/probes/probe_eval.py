"""Eval/OOD path throughput: per-class scoring at C=100, L=16.

Measures (a) the current per-batch jitted eval_batch (engine style),
(b) a device-resident lax.scan over batches inside one jit.
"""
import sys as _sys; _sys.path.insert(0, '/root/repo')
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from __graft_entry__ import _flagship_cfg
from joint_vae_tpu.save_load.jobs import new_job
from joint_vae_tpu.train.optimizers import OptimizerConfig
from joint_vae_tpu.models.evaluate import evaluate
from joint_vae_tpu.ops.scores import batch_dist_measures

B = int(__import__('os').environ.get('B', 512))
NBATCH = 8
METHODS = ('iws', 'elbo', 'zdist', 'mse', 'soft', 'iws-2s', 'elbo-2s')

cfg = _flagship_cfg(compute_dtype='bfloat16')
job = new_job(cfg, OptimizerConfig(lr=1e-4), key=jax.random.PRNGKey(0))
model = job.model
variables = job.state.variables
sigma_state = job.state.sigma_state

rng = np.random.default_rng(0)
xs = jnp.asarray(rng.uniform(0, 1, (NBATCH, B, *cfg.input_shape)).astype(np.float32))

methods = tuple(m for m in METHODS)


@jax.jit
def eval_batch(variables, x, key):
    out = evaluate(model, variables, x, None, rng=key,
                   sigma_state=sigma_state, train=False)
    scores = batch_dist_measures(model.cfg, out.logits, out.losses, methods)
    return scores


# (a) per-batch dispatch
key = jax.random.PRNGKey(0)
acc = [eval_batch(variables, xs[i], jax.random.fold_in(key, i))
       for i in range(2)]
float(acc[-1]['iws'][0])
t0 = time.perf_counter()
acc = []
for i in range(NBATCH):
    acc.append(eval_batch(variables, xs[i], jax.random.fold_in(key, i)))
out = jax.device_get(acc[-1])
dt = time.perf_counter() - t0
print(f'per-batch dispatch: {dt/NBATCH*1e3:7.2f} ms/batch  {B*NBATCH/dt/1e3:7.1f}k img/s')


# (b) scan over batches inside one jit
@jax.jit
def eval_scan(variables, xs, key):
    def body(c, inp):
        i, x = inp
        out = evaluate(model, variables, x, None, rng=jax.random.fold_in(key, i),
                       sigma_state=sigma_state, train=False)
        scores = batch_dist_measures(model.cfg, out.logits, out.losses, methods)
        return c, scores
    _, scores = lax.scan(body, 0, (jnp.arange(NBATCH), xs))
    return scores

s = eval_scan(variables, xs, key)
float(s['iws'][0, 0])
t0 = time.perf_counter()
s = eval_scan(variables, xs, key)
float(s['iws'][0, 0])
dt = time.perf_counter() - t0
print(f'scan-in-jit:        {dt/NBATCH*1e3:7.2f} ms/batch  {B*NBATCH/dt/1e3:7.1f}k img/s')


# (c) component costs inside eval
z = jnp.asarray(rng.standard_normal((17, B, cfg.latent_dim)).astype(np.float32))
K = 10

def chain(name, f, *args):
    @jax.jit
    def outer(a0):
        def body(i, c):
            y = f(c, *args[1:])
            return c + 0 * jnp.sum(y).astype(c.dtype)
        return lax.fori_loop(0, K, body, a0)
    c = outer(args[0]); c.block_until_ready(); float(jnp.sum(c).astype(jnp.float32))
    t0 = time.perf_counter()
    c = outer(c); float(jnp.sum(c).astype(jnp.float32))
    dt = (time.perf_counter() - t0) / K
    print(f'{name:36s} {dt*1e3:7.2f} ms')

x1 = xs[0]
chain('decode 17xB fwd', lambda zz: model.apply(variables, zz, False,
      method=lambda m, a, tr: m.decode(a, tr)).astype(jnp.bfloat16).sum(), z)
chain('features+encode B fwd', lambda xx: model.apply(variables, xx, False,
      method=lambda m, a, tr: m.features(a, tr)).sum(), x1)

def full_eval(xx):
    out = evaluate(model, variables, xx, None, rng=key,
                   sigma_state=sigma_state, train=False)
    return out.losses['total']
chain('full evaluate (no scores)', full_eval, x1)

def eval_noiws(xx):
    out = evaluate(model, variables, xx, None, rng=key,
                   sigma_state=sigma_state, train=False, compute_iws=False)
    return out.losses['total']
chain('evaluate compute_iws=False', eval_noiws, x1)

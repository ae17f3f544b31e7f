"""Engine-style eval throughput after round-2 changes: scan-chunked scoring
with decode_mean=False, C=100, L=16, 7 measures."""
import sys as _sys; _sys.path.insert(0, '/root/repo')
import os
os.environ.setdefault('JVT_EVAL_DONATE', '0')  # probes re-feed one buffer
import time
import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _flagship_cfg
from joint_vae_tpu.save_load.jobs import new_job
from joint_vae_tpu.train.optimizers import OptimizerConfig
from joint_vae_tpu.evals.engines import _make_eval_fn

B = int(os.environ.get('B', 512))
NB = int(os.environ.get('NB', 16))
METHODS = ('iws', 'elbo', 'zdist', 'mse', 'soft', 'iws-2s', 'elbo-2s')

cfg = _flagship_cfg(compute_dtype='bfloat16')
job = new_job(cfg, OptimizerConfig(lr=1e-4), key=jax.random.PRNGKey(0))
variables = job.state.variables

eval_batch, eval_scan, _ = _make_eval_fn(job.model, job.state.sigma_state,
                                         False, METHODS)

rng = np.random.default_rng(0)
xs = jnp.asarray(rng.uniform(0, 1, (NB, B, *cfg.input_shape)).astype(np.float32))
key = jax.random.PRNGKey(0)
keys = jax.vmap(jax.random.fold_in, (None, 0))(key, jnp.arange(NB))

# warm
losses, logits, scores = eval_scan(variables, xs, keys)
float(scores['iws'][0, 0])
t0 = time.perf_counter()
losses, logits, scores = eval_scan(variables, xs, keys)
float(scores['iws'][0, 0])
dt = time.perf_counter() - t0
print(f'scan chunk (losses+logits+scores): {dt/NB*1e3:7.2f} ms/batch '
      f'{B*NB/dt/1e3:7.1f}k img/s')

# scores-only consumption (OOD scoring without recording): DCE potential
@jax.jit
def scan_scores(variables, xs, keys):
    return eval_scan(variables, xs, keys)[2]

s = scan_scores(variables, xs, keys)
float(s['iws'][0, 0])
t0 = time.perf_counter()
s = scan_scores(variables, xs, keys)
float(s['iws'][0, 0])
dt = time.perf_counter() - t0
print(f'scan chunk (scores only):          {dt/NB*1e3:7.2f} ms/batch '
      f'{B*NB/dt/1e3:7.1f}k img/s')

# per-batch dispatch for comparison
a = eval_batch(variables, xs[0], keys[0])
float(a[2]['iws'][0])
t0 = time.perf_counter()
for i in range(NB):
    a = eval_batch(variables, xs[i], keys[i])
float(a[2]['iws'][0])
dt = time.perf_counter() - t0
print(f'per-batch dispatch:                {dt/NB*1e3:7.2f} ms/batch '
      f'{B*NB/dt/1e3:7.1f}k img/s')

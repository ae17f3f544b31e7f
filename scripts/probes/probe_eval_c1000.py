"""Eval throughput at C=1000 (ImageNet class count) with the packed decoder,
plus the Pallas fused-IWAE opt-in comparison at C=1000."""
import sys as _sys; _sys.path.insert(0, '/root/repo')
import os
os.environ.setdefault('JVT_EVAL_DONATE', '0')  # probes re-feed one buffer
import time
import numpy as np
import jax
import jax.numpy as jnp

from joint_vae_tpu.models.cvnet import CVNetConfig
from joint_vae_tpu.ops.priors import PriorConfig
from joint_vae_tpu.ops.sigma import SigmaConfig
from joint_vae_tpu.save_load.jobs import new_job
from joint_vae_tpu.train.optimizers import OptimizerConfig
from joint_vae_tpu.evals.engines import _make_eval_fn

B = int(os.environ.get('B', 256))
NB = 8
L = int(os.environ.get('L', 16))
METHODS = ('iws', 'elbo', 'zdist', 'soft')

cfg = CVNetConfig(
    input_shape=(3, 32, 32), num_labels=1000, type='cvae',
    features='conv32', upsampler='deconv32',
    encoder=(512,), decoder=(512,), classifier=(),
    latent_dim=128, latent_sampling=1, test_latent_sampling=L,
    gamma=500.0, beta=1e-4, sigma=SigmaConfig(value=0.1),
    prior=PriorConfig(dim=128, num_priors=1000, init_mean=17.0,
                      learned_means=True),
    compute_dtype='bfloat16')
job = new_job(cfg, OptimizerConfig(lr=1e-4), key=jax.random.PRNGKey(0))
variables = job.state.variables

eval_batch, eval_scan, _ = _make_eval_fn(job.model, job.state.sigma_state,
                                         False, METHODS)
rng = np.random.default_rng(0)
xs = jnp.asarray(rng.uniform(0, 1, (NB, B, *cfg.input_shape)).astype(np.float32))
keys = jax.vmap(jax.random.fold_in, (None, 0))(jax.random.PRNGKey(0),
                                               jnp.arange(NB))
_, _, s = eval_scan(variables, xs, keys)
float(s['iws'][0, 0])
t0 = time.perf_counter()
_, _, s = eval_scan(variables, xs, keys)
float(s['iws'][0, 0])
dt = time.perf_counter() - t0
print(f'C=1000 L={L} B={B} scan: {dt/NB*1e3:7.2f} ms/batch '
      f'{B*NB/dt/1e3:7.1f}k img/s')

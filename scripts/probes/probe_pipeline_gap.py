"""Where do the 19k img/s go between resident-batch (153k) and pipeline
(134k) train?  Isolate: shuffle cost, dynamic_slice cost, dispatch."""
import sys as _sys; _sys.path.insert(0, '/root/repo')
import time
import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _flagship_cfg
from joint_vae_tpu.save_load.jobs import new_job
from joint_vae_tpu.train.optimizers import OptimizerConfig, build_optimizer
from joint_vae_tpu.train.steps import make_train_step
from joint_vae_tpu.train.device_data import DeviceDataset, make_device_train_step

B = 512
STEPS = 200

cfg = _flagship_cfg(compute_dtype='bfloat16')
job = new_job(cfg, OptimizerConfig(lr=1e-4), key=jax.random.PRNGKey(0))
tx = build_optimizer(job.opt_cfg)
rng = np.random.default_rng(0)


class _Arrays:
    data = rng.uniform(0, 1, (50000, *cfg.input_shape)).astype(np.float32)
    targets = rng.integers(0, cfg.num_labels, 50000).astype(np.int64)
    name = 's'

    def __len__(self):
        return 50000


def bench(name, fn, state):
    state, metrics = fn(state, 0)
    float(metrics['total'])
    t0 = time.perf_counter()
    for i in range(STEPS):
        state, metrics = fn(state, i)
    float(metrics['total'])
    dt = time.perf_counter() - t0
    print(f'{name:42s} {dt/STEPS*1e3:7.3f} ms/step {B*STEPS/dt/1e3:7.1f}k img/s')
    return state


# A. resident batch
step = make_train_step(job.model, tx, donate=False)
x = jnp.asarray(rng.uniform(0, 1, (B, *cfg.input_shape)).astype(np.float32))
y = jnp.asarray(rng.integers(0, cfg.num_labels, B).astype(np.int32))
st = bench('A resident batch', lambda s, i: step(s, x, y), job.state)

# B. device dataset, fixed slice index
dd = DeviceDataset(_Arrays())
dstep = make_device_train_step(job.model, tx, B)
ex, ey = dd.shuffled(jax.random.PRNGKey(1))
n_batches = dd.n // B
st = bench('B dataset slice (fixed i=0)', lambda s, i: dstep(s, ex, ey, 0), st)

# C. device dataset, walking slice
st = bench('C dataset slice (walking i)',
           lambda s, i: dstep(s, ex, ey, i % n_batches), st)

# D. C + one shuffle per epoch (amortized, like bench pipeline mode)
kk = jax.random.PRNGKey(2)
arrs = {'x': ex, 'y': ey}
def with_shuffle(s, i):
    if i % n_batches == 0:
        arrs['x'], arrs['y'] = dd.shuffled(jax.random.fold_in(kk, i))
    return dstep(s, arrs['x'], arrs['y'], i % n_batches)
st = bench('D + epoch shuffle', with_shuffle, st)

import time, numpy as np, jax, jax.numpy as jnp
from __graft_entry__ import _flagship_cfg
from joint_vae_tpu.save_load.jobs import new_job
from joint_vae_tpu.train.optimizers import OptimizerConfig, build_optimizer
from joint_vae_tpu.train.steps import make_train_step

cfg = _flagship_cfg()
job = new_job(cfg, OptimizerConfig(lr=1e-4), key=jax.random.PRNGKey(0))
tx = build_optimizer(job.opt_cfg)
step = make_train_step(job.model, tx, donate=True)
rng = np.random.default_rng(0)
B = 256
x = jnp.asarray(rng.uniform(0, 1, (B, 3, 32, 32)).astype(np.float32))
y = jnp.asarray(rng.integers(0, 100, B).astype(np.int32))
state = job.state
for _ in range(3):
    state, m = step(state, x, y)
print('warm total', float(m['total']))
# timing with hard host sync each K steps
for K in (1, 10, 30):
    t0 = time.perf_counter()
    for _ in range(K):
        state, m = step(state, x, y)
    v = float(m['total'])  # hard transfer
    dt = time.perf_counter() - t0
    print('K=%d: %.4fs -> %.0f img/s (total=%.3f)' % (K, dt, B*K/dt, v))

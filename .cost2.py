import numpy as np, jax, jax.numpy as jnp
from __graft_entry__ import _flagship_cfg
from joint_vae_tpu.save_load.jobs import new_job
from joint_vae_tpu.train.optimizers import OptimizerConfig, build_optimizer
from joint_vae_tpu.train.steps import make_train_step

for dt in ('float32', 'bfloat16'):
    cfg = _flagship_cfg(compute_dtype=dt)
    job = new_job(cfg, OptimizerConfig(lr=1e-4), key=jax.random.PRNGKey(0))
    tx = build_optimizer(job.opt_cfg)
    step = make_train_step(job.model, tx, donate=False)
    B = 256
    x = jnp.zeros((B, 3, 32, 32)); y = jnp.zeros((B,), jnp.int32)
    comp = jax.jit(step).lower(job.state, x, y).compile()
    ca = comp.cost_analysis(); ca = ca[0] if isinstance(ca, list) else ca
    f = ca.get('flops', 0); b = ca.get('bytes accessed', 0)
    print('%s: %.3g GFLOP/img, %.3g MB/img -> BW-bound cap %.0fk img/s @819GB/s'
          % (dt, f/B/1e9, b/B/1e6, 819e9/(b/B)/1e3))

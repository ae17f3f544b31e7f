import numpy as np, jax, jax.numpy as jnp
from __graft_entry__ import _flagship_cfg
from joint_vae_tpu.save_load.jobs import new_job
from joint_vae_tpu.train.optimizers import OptimizerConfig, build_optimizer
from joint_vae_tpu.train.steps import make_train_step

cfg = _flagship_cfg()
job = new_job(cfg, OptimizerConfig(lr=1e-4), key=jax.random.PRNGKey(0))
tx = build_optimizer(job.opt_cfg)
step = make_train_step(job.model, tx, donate=False)
B = 256
x = jnp.zeros((B, 3, 32, 32)); y = jnp.zeros((B,), jnp.int32)
lowered = jax.jit(step).lower(job.state, x, y)
comp = lowered.compile()
ca = comp.cost_analysis()
ca = ca[0] if isinstance(ca, list) else ca
flops = ca.get('flops', 0); bytes_ = ca.get('bytes accessed', 0)
print('flops/step: %.3g  (%.3g GFLOP/img)' % (flops, flops/B/1e9))
print('bytes/step: %.3g  (%.3g MB/img)' % (bytes_, bytes_/B/1e6))
# at 68k img/s: achieved flops and bw
ips = 68000.0
print('achieved: %.1f TFLOP/s, %.1f GB/s' % (flops/B*ips/1e12, bytes_/B*ips/1e9))

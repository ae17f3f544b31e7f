"""Throughput benchmark: CIFAR-100 joint CVAE training images/sec/chip.

Runs the flagship config (conv32 features + deconv32 upsampler, K=128,
learned class-conditional prior — BASELINE.json north-star) on whatever
jax.devices() provides (the real TPU chip under axon; CPU elsewhere).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md);
the denominator is a documented engineering estimate of the PyTorch
reference's single-H100 training throughput on the same config
(eager torch, batch 256, L=1): ~10k images/sec — dominated by Python
dispatch and unfused elementwise ops at this small model size.
"""

import json
import os
import time

import numpy as np

H100_REFERENCE_IMG_PER_SEC = 10000.0

BATCH = int(os.environ.get('JVT_BENCH_BATCH', 256))
STEPS = int(os.environ.get('JVT_BENCH_STEPS', 200))
WARMUP = int(os.environ.get('JVT_BENCH_WARMUP', 10))


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg
    from joint_vae_tpu.save_load.jobs import new_job
    from joint_vae_tpu.train.optimizers import OptimizerConfig, build_optimizer
    from joint_vae_tpu.train.steps import make_train_step

    cfg = _flagship_cfg(
        compute_dtype=os.environ.get('JVT_BENCH_DTYPE', 'bfloat16'))
    job = new_job(cfg, OptimizerConfig(lr=1e-4), key=jax.random.PRNGKey(0))
    tx = build_optimizer(job.opt_cfg)
    step = make_train_step(job.model, tx, donate=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (BATCH, *cfg.input_shape))
                    .astype(np.float32))
    y = jnp.asarray(rng.integers(0, cfg.num_labels, BATCH).astype(np.int32))

    state = job.state
    for _ in range(WARMUP):
        state, metrics = step(state, x, y)
    float(metrics['total'])  # hard host sync (block_until_ready can be
    #                          a no-op on remote/tunneled buffers)

    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = step(state, x, y)
    final = float(metrics['total'])
    dt = time.perf_counter() - t0
    assert np.isfinite(final), final

    n_chips = jax.device_count()
    img_per_sec = BATCH * STEPS / dt / n_chips
    print(json.dumps({
        'metric': 'cifar100_cvae_train_images_per_sec_per_chip',
        'value': round(img_per_sec, 1),
        'unit': 'images/sec/chip',
        'vs_baseline': round(img_per_sec / H100_REFERENCE_IMG_PER_SEC, 3),
    }))


if __name__ == '__main__':
    main()

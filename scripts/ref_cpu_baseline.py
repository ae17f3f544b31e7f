"""Measured same-hardware baseline: the reference's own torch training
step vs ours, on this host's CPU.

The reference publishes no throughput numbers and no GPU is available
here, so bench.py's `vs_baseline` uses a documented H100 estimate.  This
script replaces estimation with a measurement the sandbox CAN make: both
frameworks run the flagship config (conv32+deconv32, K=128, C=100, L=1,
float32) on the same single CPU core.

Reference side: the inner loop of `train_model` with verbatim semantics
(ref cvae.py:2426-2470) — zero_grad, `evaluate(x, y, with_beta=True,
current_measures=...)`, the per-batch all-parameter NaN scan, backward,
clip, step, and the per-component `.item()` loss accounting.  Epoch-level
machinery (save/test/validation) is NOT counted — this under-counts the
reference's overhead, i.e. favors the reference.

Ours: `make_train_step` jitted on the CPU backend, identical config and
batch, float32 (torch CPU is float32 — same-dtype comparison).

Prints one JSON line:
  {"ref_cpu_img_s": ..., "ours_cpu_img_s": ..., "cpu_ratio": ...}

Usage:  python scripts/ref_cpu_baseline.py [--batch 64] [--steps 6]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IN_SHAPE = (3, 32, 32)
C, K = 100, 128


def _stub_torchvision():
    from joint_vae_tpu.save_load.export_reference import (
        _stub_torchvision as stub)
    stub()


def run_reference(batch, steps, warmup):
    import torch
    _stub_torchvision()
    sys.path.insert(0, '/root/reference')
    try:
        from cvae import ClassificationVariationalNetwork as Net
    finally:
        sys.path.remove('/root/reference')

    torch.manual_seed(0)
    net = Net(IN_SHAPE, C, type='cvae', features='conv32',
              upsampler='deconv32', encoder=[512], decoder=[512],
              classifier=[], latent_dim=K, latent_sampling=1,
              test_latent_sampling=16, beta=1e-4, gamma=500.,
              sigma={'value': 0.1}, output_activation='sigmoid',
              prior={'distribution': 'gaussian', 'num_priors': C,
                     'init_mean': 17., 'learned_means': True},
              optimizer={'optim_type': 'adam', 'lr': 1e-4})
    net.train()
    optimizer = net.optimizer
    rng = np.random.default_rng(0)
    x = torch.tensor(rng.uniform(0, 1, (batch,) + IN_SHAPE)
                     .astype(np.float32))
    y = torch.tensor(rng.integers(0, C, batch).astype(np.int64))

    train_total_loss = {}
    current_measures = {}

    def one_step(i):
        # ref cvae.py:2426-2470 verbatim semantics
        nonlocal current_measures
        optimizer.zero_grad()
        _, _, batch_losses, measures = net.evaluate(
            x, y, batch=i, with_beta=True, kl_var_weighting=1.,
            gamma_weighting=1, current_measures=current_measures)
        current_measures = measures
        L = batch_losses['total'].mean()
        for p in net.parameters():
            if torch.isnan(p).any() or torch.isinf(p).any():
                raise FloatingPointError('param NaN')
        L.backward()
        optimizer.clip(net.parameters())
        optimizer.step()
        for k in batch_losses:
            train_total_loss[k] = (train_total_loss.get(k, 0.0)
                                   + batch_losses[k].mean().item())

    for i in range(warmup):
        one_step(i)
    t0 = time.perf_counter()
    for i in range(steps):
        one_step(warmup + i)
    dt = time.perf_counter() - t0
    return batch * steps / dt


def run_ours(batch, steps, warmup):
    import jax
    jax.config.update('jax_platforms', 'cpu')   # never touch the TPU tunnel
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg
    from joint_vae_tpu.save_load.jobs import new_job
    from joint_vae_tpu.train.optimizers import OptimizerConfig, build_optimizer
    from joint_vae_tpu.train.steps import make_train_step

    cfg = _flagship_cfg(compute_dtype='float32')
    job = new_job(cfg, OptimizerConfig(lr=1e-4), key=jax.random.PRNGKey(0))
    tx = build_optimizer(job.opt_cfg)
    step = make_train_step(job.model, tx, donate=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (batch,) + IN_SHAPE).astype(np.float32))
    y = jnp.asarray(rng.integers(0, C, batch).astype(np.int32))
    state = job.state
    # always compile + sync once before timing (warmup may be 0)
    for _ in range(max(warmup, 1)):
        state, metrics = step(state, x, y)
    float(metrics['total'])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, x, y)
    final = float(metrics['total'])
    dt = time.perf_counter() - t0
    assert np.isfinite(final), final
    return batch * steps / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--batch', type=int, default=64)
    p.add_argument('--steps', type=int, default=6)
    p.add_argument('--warmup', type=int, default=2)
    p.add_argument('--side', choices=['both', 'ref', 'ours'], default='both')
    args = p.parse_args()

    out = {'batch': args.batch, 'steps': args.steps,
           'host_cpus': os.cpu_count()}
    if args.side in ('both', 'ref'):
        out['ref_cpu_img_s'] = round(
            run_reference(args.batch, args.steps, args.warmup), 2)
    if args.side in ('both', 'ours'):
        out['ours_cpu_img_s'] = round(
            run_ours(args.batch, args.steps, args.warmup), 2)
    if 'ref_cpu_img_s' in out and 'ours_cpu_img_s' in out:
        out['cpu_ratio'] = round(out['ours_cpu_img_s']
                                 / out['ref_cpu_img_s'], 2)
    print(json.dumps(out))


if __name__ == '__main__':
    main()

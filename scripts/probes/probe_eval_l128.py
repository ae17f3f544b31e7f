#!/usr/bin/env python
"""L=128 eval bench (round-4 verdict item 5): the reference's standard
eval operating point is L=128 test samples (ref config.ini:28; grids to
256, grid.ini:22-24), yet every hardware eval number so far is L=16.

Measures on the real TPU:
 1. end-to-end eval-scan throughput (the production OOD scoring program,
    7 methods) at L=128 — flagship CIFAR-100 shape (C=100, conv) and an
    MNIST shape (C=10, MLP) — across batch sizes;
 2. the IWAE combine micro-bench at L=128/N=512/C=100/K=128:
    Pallas ``iws_fused`` vs the plain-XLA reference combine vs the
    production matmul-decomposed combine (ops/priors.py idiom) — the
    promised "revisit at larger L" for the keep/kill verdict on
    ops/pallas_kernels.py.

Run: python scripts/probes/probe_eval_l128.py
Env: JVT_PROBE_BATCHES (flagship batch list), JVT_BENCH_STEPS.
"""
import dataclasses
import json
import os
os.environ.setdefault('JVT_EVAL_DONATE', '0')  # probes re-feed one buffer
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

L = int(os.environ.get('JVT_PROBE_L', 128))
BATCHES = [int(b) for b in os.environ.get('JVT_PROBE_BATCHES',
                                          '64,128,256').split(',')]
MNIST_BATCHES = [int(b) for b in os.environ.get('JVT_PROBE_MNIST_BATCHES',
                                                '256,512').split(',')]
STEPS = int(os.environ.get('JVT_BENCH_STEPS', 48))
METHODS = ('iws', 'elbo', 'zdist', 'mse', 'soft', 'iws-2s', 'elbo-2s')


def _mnist_cfg():
    """C=10 MNIST-shape MLP CVAE (ref config.ini [DEFAULT]: mnist models
    are featureless MLP encoders)."""
    from joint_vae_tpu.models.cvnet import CVNetConfig
    from joint_vae_tpu.ops.priors import PriorConfig
    from joint_vae_tpu.ops.sigma import SigmaConfig
    return CVNetConfig(
        input_shape=(1, 28, 28), num_labels=10, type='cvae',
        encoder=(512,), decoder=(512,), classifier=(),
        latent_dim=64, latent_sampling=1, test_latent_sampling=L,
        gamma=500.0, beta=1e-4, sigma=SigmaConfig(value=0.1),
        prior=PriorConfig(dim=64, num_priors=10, init_mean=17.0,
                          learned_means=True),
        compute_dtype='bfloat16')


def _bench_eval(job, batches, results, tag):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from joint_vae_tpu.evals.engines import _make_eval_fn

    cfg = job.model_cfg
    variables = job.state.variables
    rng = np.random.default_rng(0)
    nb = 4
    _, eval_scan, _ = _make_eval_fn(job.model, job.state.sigma_state,
                                    False, METHODS)
    for batch in batches:
        xs = jnp.asarray(rng.uniform(0, 1, (nb, batch, *cfg.input_shape))
                         .astype(np.float32))
        keys = jax.vmap(jax.random.fold_in, (None, 0))(
            jax.random.PRNGKey(0), jnp.arange(nb))
        try:
            _, _, scores = eval_scan(variables, xs, keys)   # compile+warm
            fin = float(scores['iws'][0, 0])                # host pull
            assert np.isfinite(fin)
            reps = max(STEPS // nb, 1)
            t0 = time.perf_counter()
            for _ in range(reps):
                _, _, scores = eval_scan(variables, xs, keys)
            fin = float(scores['iws'][0, 0])                # timing fence
            dt = time.perf_counter() - t0
            assert np.isfinite(fin)
            ips = batch * nb * reps / dt
            results['{}@{}'.format(tag, batch)] = round(ips, 1)
        except Exception as e:  # OOM at large batch is a data point
            results['{}@{}'.format(tag, batch)] = 'failed: {}'.format(
                type(e).__name__)
        print(json.dumps({'{}@{}'.format(tag, batch):
                          results['{}@{}'.format(tag, batch)]}), flush=True)


def _bench_combine(results):
    """Pallas iws_fused vs plain-XLA vs production matmul-decomposed
    combine at L x N=512 x C=100 x K=128 (mirrors the L=16/L=64 rows in
    docs/BENCH.md 'Pallas fused-IWAE kernel')."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from joint_vae_tpu.ops.pallas_kernels import (iws_fused,
                                                  iws_reference_combine)

    N, C, K = 512, 100, 128
    r = np.random.default_rng(1)
    z = jnp.asarray(r.normal(size=(L, N, K)).astype(np.float32))
    log_pxq = jnp.asarray(r.normal(size=(L, N)).astype(np.float32))
    mean = jnp.asarray(r.normal(size=(C, K)).astype(np.float32))
    s2 = jnp.asarray(np.abs(r.normal(size=(C,))).astype(np.float32) + 0.5)
    logdet = jnp.asarray(r.normal(size=(C,)).astype(np.float32))

    def decomposed(z, log_pxq, mean, s2, logdet):
        # production idiom (ops/priors.py): Mahalanobis by matmul
        # ||z||^2 - 2 z.m^T + ||m||^2, never materializing (L, C, N, K)
        zz = jnp.sum(jnp.square(z), axis=-1)                    # (L, N)
        zm = jnp.einsum('lnk,ck->lnc', z, mean)                 # (L, N, C)
        mm = jnp.sum(jnp.square(mean), axis=-1)                 # (C,)
        mahala = (zz[..., None] - 2.0 * zm + mm) * s2           # (L, N, C)
        const = -0.5 * K * np.log(2 * np.pi) - 0.5 * logdet
        logw = log_pxq[..., None] + const - 0.5 * mahala        # (L, N, C)
        m = jnp.max(logw, axis=0)
        d = jnp.exp(logw - m[None])
        return (jnp.mean(d, axis=0) + m).T                      # (C, N)

    xla_naive = jax.jit(lambda *a: iws_reference_combine(*a))
    xla_decomp = jax.jit(decomposed)
    variants = {
        'pallas': lambda: iws_fused(z, log_pxq, mean, s2, logdet),
        'xla_naive': lambda: xla_naive(z, log_pxq, mean, s2, logdet),
        'xla_decomposed': lambda: xla_decomp(z, log_pxq, mean, s2, logdet),
    }
    base = None
    for name, fn in variants.items():
        out = fn()
        host = np.asarray(out)
        if base is None:
            base = host
        else:
            dev = float(np.max(np.abs(host - base)
                               / np.maximum(np.abs(base), 1e-6)))
            results['combine_{}:max_rel_dev'.format(name)] = round(dev, 7)
        reps = 32
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        fence = float(out[0, 0])
        dt = time.perf_counter() - t0
        assert np.isfinite(fence)
        results['combine_{}_ms'.format(name)] = round(dt / reps * 1e3, 2)
        print(json.dumps({name: results['combine_{}_ms'.format(name)]}),
              flush=True)


def main():
    import jax
    from __graft_entry__ import _flagship_cfg
    from joint_vae_tpu.save_load.jobs import new_job
    from joint_vae_tpu.train.optimizers import OptimizerConfig

    results = {}
    cfg = dataclasses.replace(_flagship_cfg(compute_dtype='bfloat16'),
                              test_latent_sampling=L)
    job = new_job(cfg, OptimizerConfig(lr=1e-4), key=jax.random.PRNGKey(0))
    _bench_eval(job, BATCHES, results, 'flagship_C100_L{}'.format(L))

    job_m = new_job(_mnist_cfg(), OptimizerConfig(lr=1e-4),
                    key=jax.random.PRNGKey(0))
    _bench_eval(job_m, MNIST_BATCHES, results, 'mnist_C10_L{}'.format(L))

    _bench_combine(results)

    print(json.dumps({'probe': 'eval_l128', 'L': L, 'steps': STEPS,
                      'backend': jax.default_backend(),
                      'results': results}))


if __name__ == '__main__':
    main()

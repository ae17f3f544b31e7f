#!/usr/bin/env python
"""Round-3 eval-residual probe (verdict item 3): time the OOD scoring
program (C=100, L=16, 7 methods, scan-chunked — the bench eval workload)
under the native-epilogue variants and batch sizes, and spot-check score
parity of each variant against the canonical layout.

Variants (JVT_EVAL_NATIVE, read by evals/engines._make_eval_fn):
  ''             canonical: depth-to-space + NHWC->NCHW formatting per decode
  '1'            native packed-NHWC losses, f32 epilogue, sigma hoisted
  'bf16'         + sub/square in bf16 (f32 accumulation)
  'barrier'      + optimization_barrier decode->loss (no conv-fusion drag)
  'bf16+barrier'

Run on the TPU: python scripts/probes/probe_eval_r3.py
"""
import json
import os
os.environ.setdefault('JVT_EVAL_DONATE', '0')  # probes re-feed one buffer
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

# '0' is the canonical f32 epilogue: since the bf16 default for bf16
# models (engines._make_eval_fn), '' resolves to 'bf16' and would make
# the parity baseline compare bf16 against itself
VARIANTS = ['0', '1', 'bf16', 'barrier', 'bf16+barrier']
BATCHES = [int(b) for b in os.environ.get('JVT_PROBE_BATCHES',
                                          '512,768').split(',')]
STEPS = int(os.environ.get('JVT_BENCH_STEPS', 192))
NB = 16
METHODS = ('iws', 'elbo', 'zdist', 'mse', 'soft', 'iws-2s', 'elbo-2s')


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _flagship_cfg
    from joint_vae_tpu.evals.engines import _make_eval_fn
    from joint_vae_tpu.save_load.jobs import new_job
    from joint_vae_tpu.train.optimizers import OptimizerConfig

    cfg = _flagship_cfg(compute_dtype='bfloat16')
    job = new_job(cfg, OptimizerConfig(lr=1e-4), key=jax.random.PRNGKey(0))
    variables = job.state.variables
    rng = np.random.default_rng(0)
    results = {}
    base_scores = {}

    for batch in BATCHES:
        xs = jnp.asarray(rng.uniform(0, 1, (NB, batch, *cfg.input_shape))
                         .astype(np.float32))
        keys = jax.vmap(jax.random.fold_in, (None, 0))(
            jax.random.PRNGKey(0), jnp.arange(NB))
        for variant in VARIANTS:
            os.environ['JVT_EVAL_NATIVE'] = variant
            _, eval_scan, _ = _make_eval_fn(job.model, job.state.sigma_state,
                                            False, METHODS)
            _, _, scores = eval_scan(variables, xs, keys)
            host = {m: np.asarray(scores[m]).reshape(-1) for m in METHODS}
            reps = max(STEPS // NB, 1)
            t0 = time.perf_counter()
            for _ in range(reps):
                _, _, scores = eval_scan(variables, xs, keys)
            fin = float(scores['iws'][0, 0])
            dt = time.perf_counter() - t0
            assert np.isfinite(fin)
            ips = batch * NB * reps / dt
            name = 'canonical' if variant == VARIANTS[0] else variant
            key = '{}@{}'.format(name, batch)
            results[key] = round(ips, 1)
            # parity vs the first (all-f32 canonical) variant per batch
            if variant == VARIANTS[0]:
                base_scores[batch] = host
            else:
                rel = {}
                for m in METHODS:
                    a, b = base_scores[batch][m], host[m]
                    denom = np.maximum(np.abs(a), 1e-6)
                    rel[m] = float(np.max(np.abs(a - b) / denom))
                results[key + ':max_rel_dev'] = {m: round(v, 6)
                                                 for m, v in rel.items()}
            print(json.dumps({key: results[key]}), flush=True)

    print(json.dumps({'probe': 'eval_r3', 'steps': STEPS,
                      'results': results}))


if __name__ == '__main__':
    main()

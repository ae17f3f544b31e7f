#!/usr/bin/env python
"""Round-5 eval-residual probe (VERDICT r4 item 5): input-buffer donation
+ large-batch sweep of the OOD scoring program (C=100, L=16, 7 methods,
scan-chunked — the bench eval workload, bf16 native epilogue default).

The round-3/4 attribution left a 0.92 ms/step (4.3%) non-conv residual at
batch 768 and an unexplained "memory pressure" wall at batch 1024.  The
candidate lever: the (16, B, 3, 32, 32) input stack (201 MB at B=1024)
stays live across the whole scan without donation — donating it frees the
allocator before the decode peak.

Measures images/sec at batches 768/896/1024 x {donate on, off}, plus a
score-parity check (donation must be numerically inert).

Run on the TPU: python scripts/probes/probe_eval_r5.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

BATCHES = [int(b) for b in os.environ.get('JVT_PROBE_BATCHES',
                                          '768,896,1024').split(',')]
STEPS = int(os.environ.get('JVT_BENCH_STEPS', 192))
NB = 16
METHODS = ('iws', 'elbo', 'zdist', 'mse', 'soft', 'iws-2s', 'elbo-2s')


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _flagship_cfg
    from joint_vae_tpu.save_load.jobs import new_job
    from joint_vae_tpu.train.optimizers import OptimizerConfig

    cfg = _flagship_cfg(compute_dtype='bfloat16')
    job = new_job(cfg, OptimizerConfig(lr=1e-4), key=jax.random.PRNGKey(0))
    variables = job.state.variables
    results = {}
    base = {}

    for batch in BATCHES:
        keys = jax.vmap(jax.random.fold_in, (None, 0))(
            jax.random.PRNGKey(0), jnp.arange(NB))

        @jax.jit
        def make_xs(k, batch=batch):
            return jax.random.uniform(
                k, (NB, batch, *cfg.input_shape), jnp.float32)

        for donate in (False, True):
            os.environ['JVT_EVAL_DONATE'] = '1' if donate else '0'
            import joint_vae_tpu.evals.engines as eng
            _, eval_scan, _ = eng._make_eval_fn(
                job.model, job.state.sigma_state, False, METHODS)
            k0 = jax.random.PRNGKey(7)
            _, _, scores = eval_scan(variables, make_xs(k0), keys)
            host = {m: np.asarray(scores[m]).reshape(-1) for m in METHODS}
            reps = max(STEPS // NB, 1)
            t0 = time.perf_counter()
            for r in range(reps):
                xs = make_xs(k0)          # same data, fresh buffer
                _, _, scores = eval_scan(variables, xs, keys)
            fin = float(scores['iws'][0, 0])
            dt = time.perf_counter() - t0
            assert np.isfinite(fin)
            ips = batch * NB * reps / dt
            key = '{}@{}'.format('donate' if donate else 'plain', batch)
            results[key] = round(ips, 1)
            if not donate:
                base[batch] = host
            else:
                dev = max(float(np.max(np.abs(base[batch][m] - host[m])
                                       / np.maximum(np.abs(base[batch][m]),
                                                    1e-6)))
                          for m in METHODS)
                results[key + ':max_rel_dev'] = round(dev, 8)
            print(json.dumps({key: results[key]}), flush=True)

    print(json.dumps({'probe': 'eval_r5', 'steps': STEPS,
                      'results': results}))


if __name__ == '__main__':
    main()

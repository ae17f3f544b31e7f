#!/usr/bin/env python
"""Capture a jax.profiler trace of the flagship train step and print an
xprof-derived device-time breakdown, aggregated by HLO category and by
source line (the trace's per-fusion `source` attribution).

    python scripts/profile_step.py [--steps 10] [--batch 512] [--eval]

Writes the raw trace under /tmp/jvt_trace (view in TensorBoard/xprof);
prints two tables to stdout.
"""
import argparse
import collections
import glob
import gzip
import json
import os
os.environ.setdefault('JVT_EVAL_DONATE', '0')  # probes re-feed one buffer
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(steps: int, batch: int, eval_mode: bool, log_dir: str):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _flagship_cfg
    from joint_vae_tpu.save_load.jobs import new_job
    from joint_vae_tpu.train.optimizers import OptimizerConfig, build_optimizer
    from joint_vae_tpu.utils.profiling import trace

    cfg = _flagship_cfg(compute_dtype='bfloat16')
    job = new_job(cfg, OptimizerConfig(lr=1e-4), key=jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (batch, *cfg.input_shape))
                    .astype(np.float32))

    if eval_mode:
        from joint_vae_tpu.evals.engines import _make_eval_fn
        eval_batch, _, _ = _make_eval_fn(
            job.model, job.state.sigma_state, False,
            ('iws', 'elbo', 'zdist', 'mse'))
        variables = job.state.variables
        key = jax.random.PRNGKey(0)
        r = eval_batch(variables, x, key)
        float(r[2]['iws'][0])
        with trace(log_dir):
            for i in range(steps):
                r = eval_batch(variables, x, jax.random.fold_in(key, i))
            float(r[2]['iws'][0])
    else:
        from joint_vae_tpu.train.steps import make_train_step
        tx = build_optimizer(job.opt_cfg)
        step = make_train_step(job.model, tx, donate=False)
        y = jnp.asarray(rng.integers(0, cfg.num_labels, batch)
                        .astype(np.int32))
        st = job.state
        st, m = step(st, x, y)
        float(m['total'])
        with trace(log_dir):
            for _ in range(steps):
                st, m = step(st, x, y)
            float(m['total'])


def summarize(log_dir: str, steps: int, top: int = 20):
    paths = sorted(glob.glob(os.path.join(
        log_dir, 'plugins', 'profile', '*', '*.trace.json.gz')))
    if not paths:
        print('no trace found under', log_dir)
        return 1
    d = json.load(gzip.open(paths[-1]))
    events = d.get('traceEvents', [])
    pids = {e['pid']: e['args'].get('name', '')
            for e in events if e.get('ph') == 'M'
            and e.get('name') == 'process_name'}
    dev = {pid for pid, n in pids.items() if 'TPU' in n}

    by_cat = collections.Counter()
    by_src = collections.Counter()
    total = 0.0
    for e in events:
        if e.get('ph') != 'X' or e.get('pid') not in dev:
            continue
        args = e.get('args') or {}
        cat = args.get('hlo_category')
        if cat is None:            # container events (whole-program spans)
            continue
        dur = float(e.get('dur', 0.0))
        total += dur
        by_cat[cat] += dur
        src = args.get('source') or '(unattributed)'
        by_src[src.replace('/root/repo/', '')] += dur

    print('device time: {:.0f} us total, {:.0f} us/step'.format(
        total, total / max(steps, 1)))
    print('\nby HLO category:')
    for cat, us in by_cat.most_common():
        print('  {:9.1f} us/step {:5.1f}%  {}'.format(
            us / steps, 100 * us / total, cat))
    print('\nby source line (top {}):'.format(top))
    for src, us in by_src.most_common(top):
        print('  {:9.1f} us/step {:5.1f}%  {}'.format(
            us / steps, 100 * us / total, src))
    return 0


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--steps', type=int, default=10)
    p.add_argument('--batch', type=int, default=512)
    p.add_argument('--eval', action='store_true')
    p.add_argument('--log-dir', default='/tmp/jvt_trace')
    p.add_argument('--summarize-only', action='store_true')
    args = p.parse_args(argv)
    if not args.summarize_only:
        capture(args.steps, args.batch, args.eval, args.log_dir)
    return summarize(args.log_dir, args.steps)


if __name__ == '__main__':
    sys.exit(main())

"""Device utilities: max-batch-size probing and crash forensics.

- :func:`compute_max_batch_size` (ref cvae.py:1087-1143): the reference
  probes CUDA OOM by halving; here we probe upward by compiling/executing
  the eval step at doubling batch sizes until the backend raises a
  resource-exhausted error, then cache per (model, mode).
- :func:`dump_crash` (ref cvae.py:479-488): on an evaluation error, dump
  the net state + offending batch under ``log/dump-<job>``.
"""

import logging
import os
from typing import Callable, Dict, Tuple

import numpy as np

_max_batch_cache: Dict[Tuple, int] = {}


def compute_max_batch_size(step_fn: Callable[[int], None], start: int = 128,
                           ceiling: int = 65536, key: Tuple = ()) -> int:
    """Largest power-of-two batch size <= ceiling for which ``step_fn(n)``
    executes without exhausting device memory."""
    if key in _max_batch_cache:
        return _max_batch_cache[key]

    def _is_oom(e: Exception) -> bool:
        return ('RESOURCE_EXHAUSTED' in str(e) or 'Out of memory' in str(e)
                or 'oom' in str(e).lower())

    n = start
    best = 0
    while n <= ceiling:
        try:
            step_fn(n)
            best = n
            n *= 2
        except Exception as e:  # XlaRuntimeError RESOURCE_EXHAUSTED etc.
            if _is_oom(e):
                logging.info('batch %d exhausts device memory', n)
                break
            raise
    # the starting size may itself exhaust memory — halve downward like the
    # reference (cvae.py:1087-1143) instead of reporting 0
    n = start // 2
    while best == 0 and n >= 1:
        try:
            step_fn(n)
            best = n
        except Exception as e:
            if not _is_oom(e):
                raise
            n //= 2
    if key:
        _max_batch_cache[key] = best
    return best


def dump_crash(job, x, y, error: Exception, log_dir: str = 'log'):
    """Persist the job + batch that triggered a failure."""
    d = os.path.join(log_dir, 'dump-{}'.format(getattr(job, 'job_number', 0)))
    os.makedirs(d, exist_ok=True)
    try:
        from ..save_load.jobs import save_job
        save_job(job, d)
    except Exception as e:
        logging.error('could not save job in crash dump: %s', e)
    np.savez(os.path.join(d, 'batch.npz'), x=np.asarray(x),
             y=np.asarray(y) if y is not None else np.zeros(0))
    with open(os.path.join(d, 'error.txt'), 'w') as f:
        f.write(repr(error))
    logging.error('Error %s, net dumped in %s', error, d)
    return d

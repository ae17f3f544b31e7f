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
from typing import Callable, Dict, Optional, Tuple

import numpy as np

_max_batch_cache: Dict[Tuple, int] = {}


def _cpu_flags_fingerprint() -> str:
    """The host's CPU feature flags (x86: /proc/cpuinfo 'flags'), '' when
    unavailable — part of the compile-cache directory fingerprint."""
    try:
        with open('/proc/cpuinfo') as f:
            for line in f:
                if line.startswith(('flags', 'Features')):
                    return ' '.join(sorted(line.split(':', 1)[1].split()))
    except OSError:
        pass
    return ''


def enable_compilation_cache(path: Optional[str] = None) -> Optional[str]:
    """Point XLA's persistent compilation cache at a writable directory so
    repeat CLI invocations skip the 20-40s first compile (no reference
    counterpart — torch has no AOT compile to cache).

    Resolution order: explicit ``path`` > ``JVT_COMPILE_CACHE`` env var >
    ``~/.cache/joint_vae_tpu/xla-<host-cpu-fingerprint>`` (fingerprinted
    so one machine type never executes another's AOT entries).  ``JVT_COMPILE_CACHE=0`` (or any of the
    usual falsy spellings: off/false/no/none, case-insensitive) disables.  Returns the directory in use, or None when disabled or the
    backend/filesystem refuses (never fatal — the cache is an optimization).
    """
    p = path if path is not None else os.environ.get('JVT_COMPILE_CACHE')
    if p is not None and p.strip().lower() in ('0', 'off', 'false', 'no',
                                               'none', 'disable', 'disabled'):
        return None
    if not p:
        # segregate the default cache per host CPU type: XLA:CPU loads AOT
        # entries compiled on a different machine with only a warning, and
        # executing them can SIGILL (cpu_aot_loader.cc) — observed killing
        # a worker in this sandbox.  A shared-filesystem cache written by
        # one machine type must never be served to another.
        import hashlib
        import platform
        fp = hashlib.sha1('|'.join(
            (platform.machine(), platform.processor() or '',
             _cpu_flags_fingerprint())).encode()).hexdigest()[:12]
        p = os.path.join(os.path.expanduser('~'), '.cache',
                         'joint_vae_tpu', 'xla-' + fp)
    try:
        os.makedirs(p, exist_ok=True)
        import jax
        redirected = jax.config.jax_compilation_cache_dir not in (None, p)
        jax.config.update('jax_compilation_cache_dir', p)
        if redirected:
            # the cache object is a process singleton bound to the dir it
            # was first initialized with; re-pointing the config mid-process
            # (tests, embedding apps) needs an explicit reset to take effect
            from jax.experimental.compilation_cache import (
                compilation_cache as _cc)
            _cc.reset_cache()
        # cache every model-scale program (the 1s floor skips the tiny
        # helper jits we don't care about) — but never clobber an explicit
        # user choice made through jax's own env var
        if 'JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS' not in os.environ:
            jax.config.update('jax_persistent_cache_min_compile_time_secs',
                              1.0)
        return p
    except Exception as e:               # pragma: no cover - defensive
        logging.info('compilation cache disabled: %s', e)
        return None


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

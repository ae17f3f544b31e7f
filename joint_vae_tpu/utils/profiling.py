"""Profiling / tracing (SURVEY.md section 5: the reference only has
wall-clock accounting; the TPU build uses jax.profiler traces + per-step
host metrics)."""

import contextlib
import logging
import os
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = 'log/traces', enabled: bool = True):
    """jax.profiler trace context; view with TensorBoard or xprof."""
    if not enabled:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    try:
        jax.profiler.start_trace(log_dir)
        yield
    finally:
        try:
            jax.profiler.stop_trace()
            logging.info('trace written to %s', log_dir)
        except Exception as e:
            logging.warning('trace stop failed: %s', e)


class StepTimer:
    """Per-step host metrics: images/sec, step latency EMA."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self._t = None
        self.latency = float('nan')
        self.count = 0

    def tick(self, batch_size: int = 0) -> Dict[str, float]:
        now = time.perf_counter()
        if self._t is not None:
            dt = now - self._t
            self.latency = (dt if self.latency != self.latency
                            else self.ema * self.latency + (1 - self.ema) * dt)
        self._t = now
        self.count += 1
        ips = batch_size / self.latency if self.latency == self.latency \
            and self.latency > 0 else float('nan')
        return {'step': self.count, 'latency_s': self.latency,
                'images_per_sec': ips}


def device_memory_stats() -> Optional[Dict[str, int]]:
    try:
        d = jax.devices()[0]
        stats = d.memory_stats()
        return {k: stats[k] for k in ('bytes_in_use', 'peak_bytes_in_use')
                if k in stats}
    except Exception:
        return None

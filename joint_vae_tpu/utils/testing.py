"""Post-hoc early stopping: pick the epoch minimizing a validation metric
from the training history (ref utils/testing.py:5-45); cached in
train_params.json as 'early-min-loss'."""

from typing import Dict, Optional


def early_stopping_epoch(train_history: Dict, metric: str = 'total',
                         source: str = 'validation_loss',
                         fallback_source: str = 'test_loss') -> Optional[int]:
    """Epoch (1-based) with minimal ``history[source][metric]``."""
    best, best_epoch = None, None
    for epoch in sorted(k for k in train_history if isinstance(k, int)):
        entry = train_history[epoch]
        losses = entry.get(source) or entry.get(fallback_source)
        if not losses or metric not in losses:
            continue
        v = losses[metric]
        if best is None or v < best:
            best, best_epoch = v, epoch
    return best_epoch


def cache_early_stopping(job, metric: str = 'total') -> Optional[int]:
    e = early_stopping_epoch(job.train_history, metric=metric)
    if e is not None:
        job.training_parameters['early-min-loss'] = e
    return e

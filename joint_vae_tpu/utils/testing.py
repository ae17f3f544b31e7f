"""Post-hoc early stopping: pick the epoch minimizing a validation metric
from the training history (ref utils/testing.py:5-45); cached in
train_params.json as 'early-min-loss'."""

from typing import Dict, Optional, Sequence


def early_stopping_epoch(train_history: Dict, metric: str = 'total',
                         source: str = 'validation',
                         fallback_source: str = 'test',
                         epochs: Optional[Sequence[int]] = None
                         ) -> Optional[int]:
    """Epoch (1-based) minimizing the metric.

    ``source``/``fallback_source`` name the history family ('validation' /
    'test'); the metric is looked up in ``<source>_loss`` first, then in
    ``<source>_measures`` (mse/rmse/dB live there — ref testing.py:31-37
    builds metrics['mse'] from validation_measures).  ``epochs`` restricts
    the candidates (the reference only considers epochs carrying stored
    test/OOD results, testing.py:16-17)."""
    best, best_epoch = None, None
    for epoch in sorted(k for k in train_history if isinstance(k, int)):
        if epochs is not None and epoch not in epochs:
            continue
        entry = train_history[epoch]
        v = None
        for fam in (source, fallback_source):
            for key in ('_loss', '_measures'):
                vals = entry.get(fam + key)
                if vals and metric in vals:
                    v = vals[metric]
                    break
            if v is not None:
                break
        if v is None:
            continue
        if best is None or v < best:
            best, best_epoch = v, epoch
    return best_epoch


def cache_early_stopping(job, metric: str = 'total') -> Optional[int]:
    """Reference-faithful selection for a stored job: candidates are the
    epochs carrying test/OOD results (ref testing.py:16-17) when any
    exist; a results-free job falls back to every history epoch (a
    deviation — the reference returns None there, which would silently
    disable --early-stopping on fresh jobs)."""
    result_epochs = ({e for e in getattr(job, 'ood_results', {}) or {}
                      if isinstance(e, int)}
                     | {e for e in getattr(job, 'testing', {}) or {}
                        if isinstance(e, int)})
    e = early_stopping_epoch(job.train_history, metric=metric,
                             epochs=result_epochs or None)
    if e is not None:
        job.training_parameters['early-min-loss'] = e
    return e

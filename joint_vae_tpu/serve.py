"""Serving: a precompiled classify + OOD-gate scorer.

Production counterpart of the measurement engines: one compiled program per
batch shape returns (predicted label, confidence, per-method OOD score) and
applies thresholds calibrated from the job's stored ood_results (FPR@TPR
operating points, ref ood.json schema) so callers get an accept/reject bit
without any host-side math.
"""

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .models.evaluate import evaluate
from .ops.scores import batch_dist_measures, predict_after_evaluate
from .save_load.jobs import Job


@dataclasses.dataclass
class Scorer:
    """Compiled inference head over a trained job.

    methods: OOD score methods to emit; thresholds: {method: low or (low, up)} accept
    bounds (score >= low means in-distribution), default-calibrated from the
    newest ood_results entry at the requested TPR."""
    job: Job
    predict_method: str = 'default'
    methods: Sequence[str] = ('elbo',)
    thresholds: Optional[Dict[str, float]] = None
    tpr: float = 0.95
    L: Optional[int] = None

    def __post_init__(self):
        self.methods = tuple(self.methods)
        if self.thresholds is None:
            self.thresholds = calibrated_thresholds(self.job, self.methods,
                                                    self.tpr)
        model = self.job.model
        cfg = model.cfg
        sigma_state = self.job.state.sigma_state
        pm = (self.predict_method if self.predict_method != 'default'
              else (cfg.predict_methods[0] if cfg.predict_methods else 'esty'))
        methods = self.methods

        def _pair(v):
            if isinstance(v, (tuple, list)):
                return float(v[0]), float(v[1])
            return float(v), float('inf')

        bounds = {m: _pair(self.thresholds.get(m, float('-inf')))
                  for m in methods}
        lo = {m: jnp.asarray(bounds[m][0], jnp.float32) for m in methods}
        hi = {m: jnp.asarray(bounds[m][1], jnp.float32) for m in methods}

        @jax.jit
        def run(variables, x, key):
            out = evaluate(model, variables, x, None, rng=key,
                           sigma_state=sigma_state, train=False, L=self.L,
                           decode_mean=False)
            scores = batch_dist_measures(cfg, out.logits, out.losses, methods)
            logits = out.logits
            if logits.ndim == 3 and pm == 'esty':
                # y-coded types carry a leading class-hypothesis axis
                # (C, N, labels); esty predicts from the hypothesis-averaged
                # logits so label/confidence stay per-item
                logits = jnp.mean(logits, axis=0)
            label = predict_after_evaluate(cfg, logits, out.losses, pm)
            if logits.ndim == 3:
                # per-item logits = the row at each sample's predicted
                # class hypothesis
                logits = jnp.take_along_axis(
                    logits, label[None, :, None], axis=0)[0]
            conf = jnp.max(jax.nn.softmax(logits, axis=-1), axis=-1)
            in_dist = jnp.ones(x.shape[0], bool)
            for m in methods:
                # two-sided-calibrated methods ('-2s'/'-a-p-q') carry an
                # upper bound too; one-sided gates have hi = +inf
                in_dist &= (scores[m] >= lo[m]) & (scores[m] <= hi[m])
            return {'label': label, 'confidence': conf,
                    'scores': scores, 'in_distribution': in_dist}

        self._run = run

    def __call__(self, x: np.ndarray, key: Optional[jax.Array] = None
                 ) -> Dict[str, np.ndarray]:
        key = key if key is not None else jax.random.PRNGKey(0)
        out = self._run(self.job.state.variables, jnp.asarray(x), key)
        return jax.device_get(out)


def predict(job: Job, x: np.ndarray, method: str = 'default',
            key: Optional[jax.Array] = None) -> np.ndarray:
    """Convenience one-shot prediction (ref CVNet.predict, cvae.py:919-936):
    label-free evaluate + predict_after_evaluate."""
    key = key if key is not None else jax.random.PRNGKey(0)
    out = evaluate(job.model, job.state.variables, jnp.asarray(x), None,
                   rng=key, sigma_state=job.state.sigma_state, train=False)
    return np.asarray(predict_after_evaluate(job.model_cfg, out.logits,
                                             out.losses, method))


def calibrated_thresholds(job: Job, methods: Sequence[str],
                          tpr: float = 0.95) -> Dict[str, Tuple[float, float]]:
    """Accept thresholds at the requested kept-TPR from stored ood_results
    (lowest threshold over OOD sets = most permissive consistent gate)."""
    out: Dict[str, Tuple[float, float]] = {}
    epochs = sorted((e for e in job.ood_results if isinstance(e, int)),
                    reverse=True)
    for m in methods:
        found: List[float] = []
        found_up: List[float] = []
        for e in epochs:
            for s, ms in job.ood_results[e].items():
                r = ms.get(m)
                if not isinstance(r, dict) or not r.get('thresholds'):
                    continue
                tprs = r.get('tpr') or []
                idx = [i for i, t in enumerate(tprs)
                       if abs(t - tpr) < 1e-6]
                if idx:
                    thr = float(r['thresholds'][idx[0]])
                    if not np.isfinite(thr):
                        # a degenerate ROC (e.g. a tiny OOD set whose most
                        # permissive cut is -inf) carries no gating
                        # information — folding it in via min() would
                        # silently disable the whole gate
                        continue
                    found.append(thr)
                    ups = r.get('thresholds_up')
                    found_up.append(float(ups[idx[0]]) if ups
                                    else float('inf'))
            if found:
                break
        out[m] = ((min(found), max(found_up)) if found
                  else (float('-inf'), float('inf')))
    return out

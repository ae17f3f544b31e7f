"""Cascaded models: feed model i+1 with the reconstruction of model i
(ref module/cascad.py:15-197 + results/cascad.py).

Produces per-stage losses, the cross-stage reconstruction MSE matrix Im(T),
and Bayes-iterated posteriors (ref iterate_with_prior)."""

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.evaluate import evaluate
from ..save_load.jobs import Job


class CascadModels:
    def __init__(self, *jobs: Job):
        assert jobs
        shapes = {j.model_cfg.input_shape for j in jobs}
        assert len(shapes) == 1, 'cascaded models need one input shape'
        self.jobs = list(jobs)

    def evaluate(self, x: np.ndarray, key=None):
        """-> (stage_losses: list of dicts, stage_recos: (S+1, N, ...),
        mse_matrix: (S+1, S+1))."""
        key = key if key is not None else jax.random.PRNGKey(0)
        recos = [np.asarray(x, np.float32)]
        stage_losses: List[Dict[str, np.ndarray]] = []
        posteriors: List[np.ndarray] = []
        cur = jnp.asarray(x)
        for i, job in enumerate(self.jobs):
            out = evaluate(job.model, job.state.variables, cur, None,
                           rng=jax.random.fold_in(key, i),
                           sigma_state=job.state.sigma_state, train=False)
            x_reco = out.x_reco.astype(jnp.float32)
            if job.model_cfg.output_distribution == 'categorical':
                x_reco = jnp.argmax(x_reco, axis=-4) / 255.0
            cur = x_reco[0]                      # mean reconstruction
            recos.append(np.asarray(cur))
            stage_losses.append({k: np.asarray(v)
                                 for k, v in out.losses.items()})
            post = np.asarray(jax.nn.softmax(out.logits, axis=-1)).T \
                if out.logits.ndim == 2 else None
            posteriors.append(post)

        S = len(recos)
        mse = np.zeros((S, S))
        flat = [r.reshape(r.shape[0], -1) for r in recos]
        for i in range(S):
            for j in range(S):
                mse[i, j] = float(np.mean((flat[i] - flat[j]) ** 2))
        return stage_losses, np.stack(recos), mse, posteriors


def iterate_with_prior(posteriors: Sequence[np.ndarray],
                       prior: Optional[np.ndarray] = None) -> np.ndarray:
    """Bayes-chain posteriors p_i(y|x) (C, N) with a prior
    (ref cascad.py iterate_with_prior): p ~ prior * prod_i p_i / prior^(S-1)
    normalized per item."""
    ps = [np.asarray(p, np.float64) for p in posteriors if p is not None]
    assert ps
    C = ps[0].shape[0]
    prior = (np.ones(C) / C if prior is None
             else np.asarray(prior, np.float64))
    log_p = np.log(prior)[:, None] * (1 - len(ps))
    for p in ps:
        log_p = log_p + np.log(np.maximum(p, 1e-30))
    log_p -= log_p.max(0, keepdims=True)
    e = np.exp(log_p)
    return e / e.sum(0, keepdims=True)

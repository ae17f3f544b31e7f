"""Multi-model ensembling (ref module/aggregation.py:8-111 +
results/aggregation.py).

Posterior combination over a list of per-class score arrays (C, N):
- 'dist'/'joint': sum of zdists -> softmax(-sum/2)  (joint gaussian view)
- 'elbo'/'lme':   log-mean-exp of per-model log-evidences
- 'mean':         mean of per-model softmax posteriors
- 'vote':         majority vote over per-model argmax predictions

Plus the latent mutual information between two models' p(y|z)
(ref compute_latent_mutual_info)."""

from typing import Sequence

import numpy as np

from ..utils.mutual_information import mutual_information


def _softmax(a, axis=0):
    a = np.asarray(a, np.float64)
    a = a - a.max(axis=axis, keepdims=True)
    e = np.exp(a)
    return e / e.sum(axis=axis, keepdims=True)


def ensemble_posterior(scores: Sequence[np.ndarray], method: str = 'elbo'
                       ) -> np.ndarray:
    """scores: per model, (C, N) log-evidence-like (higher = more likely);
    for 'dist'/'joint' pass zdist (lower = closer).  -> posterior (C, N)."""
    s = np.stack([np.asarray(x, np.float64) for x in scores])  # (M, C, N)
    if method in ('dist', 'joint'):
        return _softmax(-0.5 * s.sum(0), axis=0)
    if method in ('elbo', 'lme', 'iws'):
        m = s.max(axis=0)
        lme = np.log(np.mean(np.exp(s - m), axis=0)) + m
        return _softmax(lme, axis=0)
    if method == 'mean':
        return np.mean([_softmax(x, axis=0) for x in s], axis=0)
    if method == 'vote':
        C, N = s.shape[1:]
        votes = np.zeros((C, N))
        for x in s:
            votes[x.argmax(0), np.arange(N)] += 1
        return votes / len(s)
    raise ValueError(method)


def ensemble_predict(scores: Sequence[np.ndarray], method: str = 'elbo'
                     ) -> np.ndarray:
    return ensemble_posterior(scores, method).argmax(0)


def compute_latent_mutual_info(p1: np.ndarray, p2: np.ndarray) -> float:
    """I between two models' label posteriors p(y|z) of shape (C, N):
    joint = E_n[p1(:, n) outer p2(:, n)] (ref aggregation.py:60-111)."""
    p1 = np.asarray(p1, np.float64)
    p2 = np.asarray(p2, np.float64)
    p1 = p1 / np.maximum(p1.sum(0, keepdims=True), 1e-12)
    p2 = p2 / np.maximum(p2.sum(0, keepdims=True), 1e-12)
    joint = np.einsum('cn,dn->cd', p1, p2) / p1.shape[1]
    return mutual_information(joint)

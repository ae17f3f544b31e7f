"""Latent-distribution exporters (ref utils/inspection.py:77-311):
histograms of posterior variances, mu/sigma scatters, per-class latent
means — written as whitespace .dat files for plotting."""

import os
from typing import Dict, Optional

import numpy as np


def export_latent_histograms(mu: np.ndarray, log_var: np.ndarray,
                             out_dir: str, bins: int = 50,
                             y: Optional[np.ndarray] = None) -> Dict[str, str]:
    """Writes hist-of-var.dat, mu-scatter.dat (+ per-class means)."""
    os.makedirs(out_dir, exist_ok=True)
    out = {}

    var = np.exp(np.asarray(log_var, np.float64))
    hist, edges = np.histogram(var.ravel(), bins=bins)
    p = os.path.join(out_dir, 'hist-of-var.dat')
    np.savetxt(p, np.column_stack([edges[:-1], edges[1:], hist]),
               header='low high count', fmt='%.6g')
    out['hist_of_var'] = p

    mu = np.asarray(mu, np.float64)
    flat_mu = mu.reshape(-1, mu.shape[-1])
    flat_sd = np.sqrt(var.reshape(-1, var.shape[-1]))
    p = os.path.join(out_dir, 'mu-sigma-scatter.dat')
    np.savetxt(p, np.column_stack([flat_mu.mean(-1), flat_sd.mean(-1)]),
               header='mu_mean sd_mean', fmt='%.6g')
    out['mu_sigma_scatter'] = p

    if y is not None:
        y = np.asarray(y).ravel()
        means = np.stack([flat_mu[y == c].mean(0) if (y == c).any()
                          else np.zeros(flat_mu.shape[-1])
                          for c in range(int(y.max()) + 1)])
        p = os.path.join(out_dir, 'class-means.dat')
        np.savetxt(p, means, fmt='%.6g')
        out['class_means'] = p
    return out


def latent_pca(mu: np.ndarray, n_components: int = 2):
    """Plain-numpy PCA of latent means (ref ft/inspection.py PCA use).
    Returns (projected, components, explained_variance_ratio)."""
    x = np.asarray(mu, np.float64).reshape(-1, mu.shape[-1])
    x = x - x.mean(0)
    u, s, vt = np.linalg.svd(x, full_matrices=False)
    proj = x @ vt[:n_components].T
    evr = (s ** 2) / np.sum(s ** 2)
    return proj, vt[:n_components], evr[:n_components]


def latent_shift(mu_before: np.ndarray, mu_after: np.ndarray) -> Dict[str, float]:
    """Summary of the latent drift induced by fine-tuning
    (ref ft/inspection.py latent-shift analysis)."""
    a = np.asarray(mu_before, np.float64).reshape(-1, mu_before.shape[-1])
    b = np.asarray(mu_after, np.float64).reshape(-1, mu_after.shape[-1])
    n = min(len(a), len(b))
    d = b[:n] - a[:n]
    return {'mean_shift': float(np.linalg.norm(d.mean(0))),
            'mean_norm': float(np.linalg.norm(d, axis=1).mean()),
            'max_norm': float(np.linalg.norm(d, axis=1).max())}

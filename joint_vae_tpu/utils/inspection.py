"""Latent-distribution exporters (ref utils/inspection.py:77-311):
histograms of posterior variances, mu/sigma scatters, per-class latent
means — written as whitespace .dat files for plotting."""

import os
from typing import Dict, Optional

import numpy as np


def _write_var_hist(var: np.ndarray, path: str, bins: int):
    """Histogram of the per-dim mean posterior variance (ref
    output_latent_distribution 'hist_of_var' with per_dim=True)."""
    data = var.mean(0)                        # (K,) mean variance per dim
    hist, edges = np.histogram(data, range=(0, float(data.max() or 1.0)),
                               bins=bins)
    np.savetxt(path, np.column_stack([edges[:-1], edges[1:], hist]),
               header='low high count', fmt='%.6g')


def _write_mu_var_scatter(mu: np.ndarray, var: np.ndarray, path: str):
    """Per-dim scatter columns (ref 'scatter' with per_dim=True): one row
    per latent dim with batch statistics mu2_mu (E[mu^2]), mu_var (E[var]),
    mu2 (their sum = E[z^2]), mu_mu (E[mu]) and std_var (sd of var)."""
    mu2_mu = np.mean(mu ** 2, axis=0)
    mu_var = np.mean(var, axis=0)
    cols = np.column_stack([mu2_mu, mu_var, mu2_mu + mu_var,
                            np.mean(mu, axis=0), np.std(var, axis=0)])
    order = np.argsort(-mu2_mu)
    np.savetxt(path, cols[order],
               header='mu2_mu_z mu_var_z mu2_z mu_mu_z std_var_z',
               fmt='%.6g')


def export_latent_histograms(mu: np.ndarray, log_var: np.ndarray,
                             out_dir: str, bins: int = 50,
                             y: Optional[np.ndarray] = None) -> Dict[str, str]:
    """Latent posterior exports (ref zsample, module/sample.py:176-233):
    hist-of-var.dat + mu-sigma-scatter.dat over the whole batch, the same
    pair per class (hist-of-var-<c>.dat ... — the reference's per-class
    'coloring' is one .dat per class), and class-means.dat."""
    os.makedirs(out_dir, exist_ok=True)
    out = {}

    mu = np.asarray(mu, np.float64).reshape(-1, np.shape(mu)[-1])
    var = np.exp(np.asarray(log_var, np.float64)).reshape(mu.shape)

    p = os.path.join(out_dir, 'hist-of-var.dat')
    _write_var_hist(var, p, bins)
    out['hist_of_var'] = p

    p = os.path.join(out_dir, 'mu-sigma-scatter.dat')
    _write_mu_var_scatter(mu, var, p)
    out['mu_sigma_scatter'] = p

    if y is not None:
        y = np.asarray(y).ravel()[:len(mu)]
        for c in range(int(y.max()) + 1):
            i = y == c
            if not i.any():
                continue
            p = os.path.join(out_dir, 'hist-of-var-{}.dat'.format(c))
            _write_var_hist(var[i], p, bins)
            out['hist_of_var_{}'.format(c)] = p
            p = os.path.join(out_dir, 'mu-sigma-scatter-{}.dat'.format(c))
            _write_mu_var_scatter(mu[i], var[i], p)
            out['mu_sigma_scatter_{}'.format(c)] = p
        means = np.stack([mu[y == c].mean(0) if (y == c).any()
                          else np.zeros(mu.shape[-1])
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

"""Image-grid generation and latent inspection (ref module/sample.py).

- :func:`reconstruction_grid` (ref sample:36-173): rows = [input, mean
  reconstruction, average reconstruction, L sampled reconstructions] for
  test / correct / incorrect / OOD inputs;
- :func:`generation_grid`: decode z drawn from the prior (per-class means
  for conditional priors — pure generation);
- :func:`latent_samples` (ref zsample:176-233): mu / log-var arrays for
  histograms and scatters;
- :func:`save_grid_image`: PNG export (PIL) + raw npz.
"""

import os
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.evaluate import evaluate
from ..save_load.jobs import Job


def reconstruction_grid(job: Job, x: np.ndarray, y: Optional[np.ndarray] = None,
                        L: int = 8, key=None) -> Dict[str, np.ndarray]:
    """-> dict with 'input' (N,C,H,W), 'mean' (N,...), 'average',
    'samples' (L,N,...); optionally 'correct' mask when y given."""
    key = key if key is not None else jax.random.PRNGKey(0)
    model = job.model
    out = evaluate(model, job.state.variables, jnp.asarray(x), None,
                   rng=key, sigma_state=job.state.sigma_state,
                   train=False, L=L)
    x_reco = np.asarray(out.x_reco.astype(jnp.float32))
    if model.cfg.output_distribution == 'categorical':
        x_reco = np.argmax(x_reco, axis=-4) / 255.0
    grid = {'input': np.asarray(x),
            'mean': x_reco[0],
            'average': x_reco[1:].mean(0),
            'samples': x_reco[1:1 + L]}
    if y is not None and model.cfg.predict_methods:
        from ..ops.scores import predict_after_evaluate
        y_ = np.asarray(predict_after_evaluate(
            model.cfg, out.logits, out.losses, model.cfg.predict_methods[0]))
        grid['correct'] = y_ == np.asarray(y)
    return grid


def select_correct_incorrect(job: Job, dataset, n: int,
                             batch_size: int = 256, key=None,
                             max_batches: int = 64):
    """Scan a dataset until n correctly- and n incorrectly-classified
    inputs are pooled (ref module/sample.py:437-466: the reference walks
    the test loader accumulating both pools before building its 'correct'
    and 'incorrect' grids).  -> {'correct': (x, y), 'incorrect': (x, y)}
    (pools may be shorter than n if the set runs out)."""
    from ..data.loaders import DataLoader
    from ..ops.scores import predict_after_evaluate
    key = key if key is not None else jax.random.PRNGKey(3)
    model = job.model
    if not model.cfg.predict_methods:
        return {}

    @jax.jit
    def pred(variables, x, k):
        out = evaluate(model, variables, x, None, rng=k,
                       sigma_state=job.state.sigma_state, train=False,
                       decode_mean=False)
        return predict_after_evaluate(model.cfg, out.logits, out.losses,
                                      model.cfg.predict_methods[0])

    pools = {'correct': ([], []), 'incorrect': ([], [])}

    def have(name):
        return sum(len(a) for a in pools[name][0])

    loader = DataLoader(dataset, batch_size, shuffle=False)
    for i, (x, y) in enumerate(loader):
        if i >= max_batches or all(have(nm) >= n for nm in pools):
            break
        y_ = np.asarray(pred(job.state.variables, jnp.asarray(x),
                             jax.random.fold_in(key, i)))
        ok = y_ == np.asarray(y)
        for name, m in (('correct', ok), ('incorrect', ~ok)):
            if have(name) < n and m.any():
                pools[name][0].append(np.asarray(x)[m])
                pools[name][1].append(np.asarray(y)[m])
    return {name: (np.concatenate(xs)[:n], np.concatenate(ys)[:n])
            for name, (xs, ys) in pools.items() if xs}


def generation_grid(job: Job, n_per_class: int = 8, key=None,
                    use_class_means: bool = True) -> np.ndarray:
    """Decode z ~ prior; (C or 1, n, C_img, H, W) (ref sample.py:88-140)."""
    key = key if key is not None else jax.random.PRNGKey(1)
    model = job.model
    cfg = model.cfg
    prior_cfg = cfg.prior
    params = job.state.params['prior']
    mean = np.asarray(params['mean'])          # (P, K)
    P = mean.shape[0] if (prior_cfg.conditional and use_class_means) else 1
    eps = np.asarray(jax.random.normal(key, (P, n_per_class, cfg.latent_dim)),
                     np.float32)
    # var_param is the INVERSE scale (ops/priors.py: 1/sigma for scalar/
    # diag, inverse Cholesky T for full; density ~ exp(-||T u||^2 / 2)) —
    # sampling applies its inverse to eps for every var_dim
    K = cfg.latent_dim
    vp = np.asarray(params['var_param'], np.float32)
    if prior_cfg.var_dim == 'scalar':
        inv = np.maximum(np.abs(vp).reshape(-1), 1e-6)
        s = inv[:P] if inv.shape[0] >= P else np.full(P, inv[0])
        u = eps / s[:, None, None]
    elif prior_cfg.var_dim == 'diag':
        d = np.maximum(np.abs(vp).reshape(-1, K), 1e-6)
        d = d[:P] if d.shape[0] >= P else np.broadcast_to(d[0], (P, K))
        u = eps / d[:, None, :]
    else:                                      # full: u = T^{-1} eps
        t = np.tril(vp.reshape(-1, K, K))
        t = t[:P] if t.shape[0] >= P else np.broadcast_to(t[0], (P, K, K))
        u = np.stack([np.linalg.solve(t[p], eps[p].T).T for p in range(P)])
    z = jnp.asarray(mean[:P, None] + u)
    x = job.model.apply(job.state.variables, z.reshape(-1, cfg.latent_dim),
                        method=lambda mdl, zz: mdl.decode(zz))
    x = np.asarray(x.astype(jnp.float32))
    if cfg.output_distribution == 'categorical':
        x = np.argmax(x, axis=-4) / 255.0
    return x.reshape(P, n_per_class, *x.shape[1:])


def latent_samples(job: Job, x: np.ndarray, key=None):
    """mu, log_var, z for latent histograms/scatters (ref zsample)."""
    key = key if key is not None else jax.random.PRNGKey(2)
    out = evaluate(job.model, job.state.variables, jnp.asarray(x), None,
                   rng=key, sigma_state=job.state.sigma_state, train=False,
                   L=1)
    return (np.asarray(out.mu), np.asarray(out.log_var), np.asarray(out.z))


def compare_reconstructions(jobs: Sequence[Job], x: np.ndarray,
                            key=None):
    """Cross-model reconstruction comparison (ref module/sample.py
    'comparison' mode): pairwise MSE matrix between the mean
    reconstructions of several models on the same inputs, plus the
    (M, N, C, H, W) mean-reconstruction rows for side-by-side grids."""
    key = key if key is not None else jax.random.PRNGKey(0)
    recos = []
    for i, job in enumerate(jobs):
        out = evaluate(job.model, job.state.variables, jnp.asarray(x), None,
                       rng=jax.random.fold_in(key, i),
                       sigma_state=job.state.sigma_state, train=False, L=1)
        r = np.asarray(out.x_reco.astype(jnp.float32))
        if job.model_cfg.output_distribution == 'categorical':
            r = np.argmax(r, axis=-4) / 255.0
        recos.append(r[0])
    M = len(jobs)
    d = np.zeros((M, M))
    flat = [r.reshape(len(x), -1) for r in recos]
    for i in range(M):
        for j in range(M):
            d[i, j] = float(np.mean((flat[i] - flat[j]) ** 2))
    return d, np.stack(recos)


def tile_images(rows: Sequence[np.ndarray], pad: int = 2) -> np.ndarray:
    """Stack rows of (N, C, H, W) images into one (H', W', C) uint8 canvas."""
    tiles = []
    for r in rows:
        r = np.clip(np.asarray(r), 0, 1)
        n, c, h, w = r.shape
        row = np.ones((c, h, n * (w + pad))) * 1.0
        for i in range(n):
            row[:, :, i * (w + pad):i * (w + pad) + w] = r[i]
        tiles.append(row)
    c = tiles[0].shape[0]
    h = sum(t.shape[1] + pad for t in tiles)
    w = max(t.shape[2] for t in tiles)
    canvas = np.ones((c, h, w))
    off = 0
    for t in tiles:
        canvas[:, off:off + t.shape[1], :t.shape[2]] = t
        off += t.shape[1] + pad
    img = (canvas.transpose(1, 2, 0) * 255).astype(np.uint8)
    return img.squeeze(-1) if img.shape[-1] == 1 else img


def save_grid_image(grid: Dict[str, np.ndarray], path: str,
                    max_rows: int = 6):
    """npz always; PNG when PIL is available."""
    os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
    np.savez(path + '.npz', **{k: v for k, v in grid.items()})
    rows = [grid['input'], grid['mean'], grid['average']]
    rows += [grid['samples'][i] for i in range(min(len(grid['samples']),
                                                   max_rows - 3))]
    try:
        from PIL import Image
        Image.fromarray(tile_images(rows)).save(path + '.png')
    except ImportError:
        pass

"""t-SNE latent inspection (ref ft/inspection.py:19,101,218) and the
proj2d CSV export (ref :100-180) — both projection models."""

import numpy as np
import pytest

from joint_vae_tpu.utils.inspection import latent_tsne, proj2d_csv


def _two_clusters(n=40, dim=8, sep=12.0, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.normal(0, 1, (n, dim))
    b = rng.normal(0, 1, (n, dim))
    b[:, 0] += sep
    return np.vstack([a, b])


def test_tsne_preserves_cluster_structure():
    x = _two_clusters()
    y = latent_tsne(x, perplexity=10.0, n_iter=300)
    assert y.shape == (80, 2)
    assert np.all(np.isfinite(y))
    ca, cb = y[:40].mean(0), y[40:].mean(0)
    spread = max(np.linalg.norm(y[:40] - ca, axis=1).mean(),
                 np.linalg.norm(y[40:] - cb, axis=1).mean())
    # well-separated input clusters stay separated in the embedding
    assert np.linalg.norm(ca - cb) > 2.0 * spread


def test_tsne_deterministic():
    x = _two_clusters(n=20)
    np.testing.assert_array_equal(latent_tsne(x, n_iter=100),
                                  latent_tsne(x, n_iter=100))


def test_tsne_tiny_input_degrades_to_pca():
    x = np.array([[0.0, 1.0], [1.0, 0.0]])
    assert latent_tsne(x).shape == (2, 2)


def _fake_recorders(k=4, c=3, n=30, seed=1):
    rng = np.random.default_rng(seed)

    def one(shift):
        return {
            'mnist': {'mu': rng.normal(shift, 1, (n, k)),
                      'y': rng.integers(0, c, n),
                      'centroids': np.eye(c, k) * 3,
                      'alternate': np.full((1, k), 8.0)},
            'fashion': {'mu': rng.normal(-shift, 1, (n, k))},
        }
    return one(0.0), one(1.0)


@pytest.mark.parametrize('model', ['pca', 'tsne'])
def test_proj2d_csv_format(tmp_path, model):
    pre, post = _fake_recorders()
    csv = str(tmp_path / 'proj2d-{}.csv'.format(model))
    out = proj2d_csv(pre, post, 'mnist', ['a', 'b', 'c'], csv, model=model,
                     N=20)
    lines = open(csv).read().splitlines()
    assert lines[0] == 'x1,x2,y,set,dist,ft'
    # centroids + alternate + (20 ind + 2 ood) per phase
    assert len(lines) - 1 == 3 + 1 + 2 * (20 + 2)
    cells = [ln.split(',') for ln in lines[1:]]
    assert {c[3] for c in cells} == {'centroids', 'alt', 'mnist', 'fashion'}
    assert {c[5] for c in cells} == {'both', 'pre', 'ft'}
    ind_labels = {c[2] for c in cells if c[3] == 'mnist'}
    assert ind_labels <= {'a', 'b', 'c'}
    assert all(c[4] == 'ood' for c in cells if c[3] in ('fashion', 'alt'))
    assert set(out) == {'centroids', 'alternate', 'mnist-pre', 'fashion-pre',
                        'mnist-ft', 'fashion-ft'}
    assert out['mnist-pre'].shape == (20, 2)

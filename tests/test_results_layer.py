"""Tables / texify / aggregation / cascad / sample-grid tests."""

import os
import tempfile

import numpy as np
import jax

from joint_vae_tpu.evals.aggregation import (ensemble_posterior,
                                             ensemble_predict,
                                             compute_latent_mutual_info)
from joint_vae_tpu.evals.cascad import CascadModels, iterate_with_prior
from joint_vae_tpu.evals.sample import (reconstruction_grid, generation_grid,
                                        latent_samples, tile_images,
                                        save_grid_image)
from joint_vae_tpu.models.cvnet import CVNetConfig
from joint_vae_tpu.ops.sigma import SigmaConfig
from joint_vae_tpu.results.tables import (results_dataframe, agg_results,
                                          auto_remove_index, export_losses)
from joint_vae_tpu.results.texify import texify_test_results_df, TexTab
from joint_vae_tpu.save_load.jobs import new_job
from joint_vae_tpu.save_load.recorders import LossRecorder
from joint_vae_tpu.utils.mutual_information import (entropy, mutual_information,
                                                    js_divergence)

RNG = np.random.default_rng(0)


def _model_dict(job=1, type_='cvae', acc=0.9):
    return {'job': job, 'type': type_, 'set': 'mnist', 'arch_code': 'abc',
            'sigma_train': 'constant', 'beta': 1.0, 'gamma': 100.0,
            'latent_dim': 32, 'features': 'none', 'encoder': '512',
            'decoder': '512', 'upsampler': 'none', 'classifier': 'none',
            'prior': 'gaussian', 'depth': 2, 'width': 1024, 'sigma': '0.1',
            'latent_sampling': 1, 'optim': 'adam', 'lr': 1e-4,
            'batch_size': 128, 'done': 10, 'epochs': 10, 'finished': True,
            'accuracy_iws': acc, 'accuracy': acc,
            'ood_fashion_auc': 0.8, 'ood_fashion_fpr95': 0.4,
            'ood_fashion_fpr90': 0.25}


def test_results_dataframe_and_agg():
    df = results_dataframe([_model_dict(1, acc=0.9), _model_dict(2, acc=0.8),
                            _model_dict(3, 'vae', 0.5)])
    assert len(df) == 3
    assert ('auc', 'fashion') in df.columns
    df2 = auto_remove_index(df)
    assert 'set' not in df2.index.names  # constant level dropped
    agg = agg_results(df)
    assert not agg.empty
    m = agg[('mean', 'accuracy', 'best')] if ('mean', 'accuracy', 'best') \
        in agg.columns else agg['mean']
    tex = texify_test_results_df(df2)
    assert '\\begin{tabular}' in tex and 'fashion' in tex

    # per-table kept-TPR selection (results INI `tpr` option)
    df95 = results_dataframe([_model_dict(1)])
    assert ('fpr95', 'fashion') in df95.columns
    assert float(df95[('fpr95', 'fashion')].iloc[0]) == 0.4
    df90 = results_dataframe([_model_dict(1)], tpr=90)
    assert ('fpr90', 'fashion') in df90.columns
    assert ('fpr95', 'fashion') not in df90.columns
    assert float(df90[('fpr90', 'fashion')].iloc[0]) == 0.25
    agg90 = agg_results(df90)
    assert any(c[1].startswith('fpr90') if len(c) > 1 else False
               for c in agg90.columns) or not agg90.empty
    tex90 = texify_test_results_df(auto_remove_index(df90))
    assert '25.0' in tex90  # fpr90 rendered as percent


def test_textab_and_export_losses():
    t = TexTab('l', 'r')
    t.append_cell('name', 0)
    t.append_cell(0.123456, 0)
    t.add_midrule(1)
    s = t.render()
    assert '0.123' in s and r'\midrule' in s

    r = LossRecorder(4)
    r.append_batch(total=RNG.random((3, 4)).astype(np.float32),
                   y_true=np.arange(4, dtype=np.int32))
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, 'losses.tab')
        df = export_losses(r, p)
        assert os.path.exists(p)
        assert 'total_0' in df.columns and 'y_true' in df.columns


def test_ensemble_methods():
    C, N, M = 4, 50, 3
    true = RNG.integers(0, C, N)
    scores = []
    for _ in range(M):
        s = RNG.normal(size=(C, N)).astype(np.float64)
        s[true, np.arange(N)] += 2.0
        scores.append(s)
    for method in ('elbo', 'mean', 'vote'):
        pred = ensemble_predict(scores, method)
        assert (pred == true).mean() > 0.8, method
        post = ensemble_posterior(scores, method)
        np.testing.assert_allclose(post.sum(0), 1.0, rtol=1e-6)
    # joint over distances
    d = [-(s - s.max(0)) for s in scores]
    post = ensemble_posterior(d, 'joint')
    np.testing.assert_allclose(post.sum(0), 1.0, rtol=1e-6)


def test_mutual_info_helpers():
    p = np.eye(4) / 4
    assert mutual_information(p) > 1.0  # perfectly correlated
    q = np.ones((4, 4)) / 16
    assert abs(mutual_information(q)) < 1e-9
    assert entropy([0.5, 0.5]) > entropy([0.9, 0.1])
    assert js_divergence([1, 0.], [0., 1]) > 0.5

    p1 = np.zeros((3, 30))
    p1[RNG.integers(0, 3, 30), np.arange(30)] = 1
    assert compute_latent_mutual_info(p1, p1) > 0.5
    p2 = np.ones((3, 30)) / 3
    assert compute_latent_mutual_info(p1, p2) < 1e-6


def _tiny_job(seed=0):
    cfg = CVNetConfig(input_shape=(1, 6, 6), num_labels=3, type='cvae',
                      encoder=(16,), decoder=(16,), classifier=(8,),
                      latent_dim=4, latent_sampling=1, test_latent_sampling=3,
                      gamma=10.0, sigma=SigmaConfig(value=0.3))
    return new_job(cfg, key=jax.random.PRNGKey(seed))


def test_sample_grids():
    job = _tiny_job()
    x = RNG.uniform(0, 1, (5, 1, 6, 6)).astype(np.float32)
    y = RNG.integers(0, 3, 5)
    grid = reconstruction_grid(job, x, y, L=3)
    assert grid['input'].shape == (5, 1, 6, 6)
    assert grid['mean'].shape == (5, 1, 6, 6)
    assert grid['samples'].shape == (3, 5, 1, 6, 6)
    assert grid['correct'].shape == (5,)

    gen = generation_grid(job, n_per_class=2)
    assert gen.shape == (3, 2, 1, 6, 6)

    mu, lv, z = latent_samples(job, x)
    assert mu.shape == (5, 4) and z.shape == (2, 5, 4)

    img = tile_images([grid['input'], grid['mean']])
    assert img.dtype == np.uint8 and img.ndim == 2

    with tempfile.TemporaryDirectory() as d:
        save_grid_image(grid, os.path.join(d, 'g'))
        assert os.path.exists(os.path.join(d, 'g.npz'))
        assert os.path.exists(os.path.join(d, 'g.png'))


def test_compare_reconstructions():
    from joint_vae_tpu.evals.sample import compare_reconstructions
    jobs = [_tiny_job(0), _tiny_job(1)]
    x = RNG.uniform(0, 1, (4, 1, 6, 6)).astype(np.float32)
    mse, recos = compare_reconstructions(jobs, x)
    assert mse.shape == (2, 2) and recos.shape == (2, 4, 1, 6, 6)
    np.testing.assert_allclose(np.diag(mse), 0, atol=1e-9)
    np.testing.assert_allclose(mse, mse.T, atol=1e-9)
    assert mse[0, 1] > 0  # different params -> different reconstructions


def test_cascad():
    jobs = [_tiny_job(0), _tiny_job(1)]
    casc = CascadModels(*jobs)
    x = RNG.uniform(0, 1, (4, 1, 6, 6)).astype(np.float32)
    losses, recos, mse, posts = casc.evaluate(x)
    assert len(losses) == 2
    assert recos.shape == (3, 4, 1, 6, 6)
    assert mse.shape == (3, 3)
    np.testing.assert_allclose(np.diag(mse), 0, atol=1e-9)
    # bayes iteration over per-stage posteriors
    ps = [np.abs(RNG.normal(size=(3, 4))) for _ in range(2)]
    ps = [p / p.sum(0) for p in ps]
    it = iterate_with_prior(ps)
    np.testing.assert_allclose(it.sum(0), 1.0, rtol=1e-6)


def test_textab_rich_features():
    """Round-2 TexTab surface: multicolumn spans, faces, na_rep, cmidrule,
    custom column separators, comments (ref texify.py:346-790)."""
    t = TexTab('l', 'r', 'r', na_rep='--')
    t.append_cell('', 'meta')
    t.append_cell('grp', 'meta', width=2)
    for c in ('a', 'x', 'y'):
        t.append_cell(c, 'h')
    t.add_midrule('h', after=True)
    t.append_cell('r1', 'row1')
    t.append_cell(1.0, 'row1', face='bf')
    t.append_cell(None, 'row1')
    t.add_midrule('row1', after=False, start=1)
    t.add_col_sep(2, '/')
    t.comment('jobs: 1 2 3')
    s = t.render()
    assert r'\multicolumn{2}{c}{grp}' in s
    assert r'\bfseries' in s and '--' in s
    assert r'\cmidrule(l){2-3}' in s
    assert '@{/}' in s
    assert '% jobs: 1 2 3' in s


def test_texify_best_in_group_bolding():
    df = results_dataframe([_model_dict(1, acc=0.9), _model_dict(2, acc=0.8)])
    tex = texify_test_results_df(df, best_in_group=True)
    assert tex.count(r'\bfseries') >= 1


def test_dict_history_derived_keys():
    """make_dict_from_model history-derived metrics (ref dictify.py:656-682)."""
    import jax
    from joint_vae_tpu.models.cvnet import CVNetConfig
    from joint_vae_tpu.ops.priors import PriorConfig
    from joint_vae_tpu.ops.sigma import SigmaConfig
    from joint_vae_tpu.save_load.jobs import new_job
    from joint_vae_tpu.save_load.dictify import make_dict_from_model
    from joint_vae_tpu.train.optimizers import OptimizerConfig

    cfg = CVNetConfig(input_shape=(1, 4, 4), num_labels=2, type='cvae',
                      encoder=(8,), decoder=(8,), latent_dim=4,
                      latent_sampling=1, sigma=SigmaConfig(value=0.5),
                      prior=PriorConfig(dim=4, num_priors=2))
    job = new_job(cfg, OptimizerConfig(lr=1e-3), key=jax.random.PRNGKey(0))
    job.training_parameters.update(set='mnist', epochs=2, batch_size=8)
    job.train_history[2] = {
        'train_loss': {'total': 5.0},
        'test_loss': {'total': 4.0, 'iws': -100.0, 'kl': 1.0},
        'test_measures': {'mse': 0.01, 'rmse': 0.1, 'dB': 12.0},
        'lr': 1e-3}
    job.train_history['epochs'] = 2
    d = make_dict_from_model(job)
    assert d['test_loss'] == 4.0 and d['train_loss'] == 5.0
    assert d['rmse'] == 0.1 and d['dB'] == 12.0
    assert d['trained'] == 1.0 and d['finished']
    D = 16
    assert abs(d['nll'] - (100.0 / np.log(2) / D + np.log2(2) / D)) < 1e-9
    assert d['kl'] == 1.0 and d['lr_at_epoch'] == 1e-3


def test_comparison_table_two_sections(tmp_path):
    """Two model groups -> one table; per-row best bolding picks the right
    winner per metric (min fpr, max auc/acc)."""
    import configparser
    from joint_vae_tpu.cli.results import comparison_table

    cp = configparser.ConfigParser()
    cp.read_dict({
        'DEFAULT': {'dataset': 'd', 'ood': 'o1 o2', 'tpr': '95',
                    'average': 'average o1 o2'},
        'ga': {'prior': 'gaussian'},
        'ti': {'prior': 'tilted'},
    })

    def model(job, prior, acc, fpr1, auc1, fpr2, auc2):
        return {'job': job, 'set': 'd', 'prior': prior, 'accuracy': acc,
                'ood_o1_fpr95': fpr1, 'ood_o1_auc': auc1,
                'ood_o2_fpr95': fpr2, 'ood_o2_auc': auc2}

    models = [model(1, 'gaussian', 0.9, 0.30, 0.80, 0.50, 0.70),
              model(2, 'gaussian', 0.8, 0.40, 0.90, 0.40, 0.80),
              model(3, 'tilted', 0.7, 0.10, 0.95, 0.60, 0.60)]
    tex_path = comparison_table(cp, models, str(tmp_path), 'cmp')
    tex = open(tex_path).read()
    # tilted wins o1 fpr (10.0 bold), gaussian wins acc (85.0 mean bold)
    assert r'\bfseries 10.0' in tex
    assert r'\bfseries 85.0' in tex
    # average row present, both sections as columns
    assert 'average' in tex and 'ga' in tex and 'ti' in tex
    tab = open(tex_path.replace('.tex', '.tab')).read()
    assert 'ga-rate' in tab and 'ti-auc' in tab

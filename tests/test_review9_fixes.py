"""Regressions for the ninth code-review batch (evals/ft/data/native).

Covers: native-batcher crop parity (edge pad, size//8), MixtureDataset
bar() label stability across dropped components, SubSampledDataset
stratified length=0, WIM pre-tuning init recorders actually written,
fresh-compute skipping (not crashing on) WIM twin methods, misclass
recorder persistence on first run, and generation_grid honoring diag
prior scales.
"""

import pytest

pytestmark = pytest.mark.slow

import os
import tempfile

import jax
import numpy as np

from joint_vae_tpu.data.loaders import ArrayDataset, DataLoader
from joint_vae_tpu.ft.datasets import MixtureDataset, SubSampledDataset
from joint_vae_tpu.models.cvnet import CVNetConfig
from joint_vae_tpu.ops.priors import PriorConfig
from joint_vae_tpu.ops.sigma import SigmaConfig
from joint_vae_tpu.save_load.jobs import new_job, save_job
from joint_vae_tpu.save_load.recorders import LossRecorder, find_record
from joint_vae_tpu.train.optimizers import OptimizerConfig

RNG = np.random.default_rng(3)
INPUT_SHAPE = (1, 8, 8)
C = 3


def _dataset(name='d', n=64, seed=0):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, C, n).astype(np.int32)
    x = rng.uniform(0.2, 0.8, (n, *INPUT_SHAPE)).astype(np.float32)
    return ArrayDataset(x, y, name)


def _job(var_dim='scalar', var_param=None, saved_dir=None):
    cfg = CVNetConfig(input_shape=INPUT_SHAPE, num_labels=C, type='cvae',
                      encoder=(8,), decoder=(8,), classifier=(4,),
                      latent_dim=4, latent_sampling=1, test_latent_sampling=2,
                      gamma=10.0, beta=1e-2, sigma=SigmaConfig(value=0.3),
                      prior=PriorConfig(dim=4, num_priors=C,
                                        var_dim=var_dim))
    job = new_job(cfg, OptimizerConfig(lr=1e-3), key=jax.random.PRNGKey(0))
    if var_param is not None:
        p = dict(job.state.params)
        pr = dict(p['prior'])
        pr['var_param'] = np.full_like(np.asarray(pr['var_param']), var_param)
        p['prior'] = pr
        job.state = job.state.replace(params=p)
    if saved_dir:
        job.saved_dir = saved_dir
    return job


# -- native batcher crop: edge pad, size//8 ---------------------------------


def test_native_crop_edge_pads():
    from joint_vae_tpu.data.native import NativeBatcher, available
    if not available():
        import pytest
        pytest.skip('native batcher not built')
    x = np.ones((16, 3, 8, 8), np.float32)
    y = np.zeros(16, np.int32)
    nb = NativeBatcher(x, y, seed=0, hflip=False, crop_pad=2)
    nb.start_epoch(1)
    out, _ = nb.get_batch(0, 16)
    # edge replication of an all-ones image stays all ones — the old
    # zero-padded canvas leaked 0 rows/cols in
    assert float(out.min()) == 1.0, float(out.min())


def test_dataloader_native_crop_pad_matches_reference():
    ds = _dataset(n=32)
    dl = DataLoader(ds, 16, data_augmentation=['crop'])
    if dl._native is None:
        import pytest
        pytest.skip('native batcher not built')
    assert dl._native.crop_pad == max(INPUT_SHAPE[-2] // 8, 1)


# -- MixtureDataset.bar(): stable labels across dropped components ----------


def test_mixture_bar_keeps_component_labels():
    a = _dataset('a', n=32, seed=1)
    b = _dataset('b', n=32, seed=2)
    c = _dataset('c', n=32, seed=3)
    mix = MixtureDataset(mix={'a': 0.0, 'b': 1.0, 'c': 1.0}, length=16,
                         a=a, b=b, c=c)
    before = mix.extract_subdataset('c')
    assert len(before) == 8
    mix.bar()
    after = mix.extract_subdataset('c')
    assert len(after) == 8, 'labels shifted after bar()'
    assert len(mix.extract_subdataset('b')) == 8


def test_subsampled_stratified_length_zero():
    ds = _dataset(n=20)
    sub = SubSampledDataset(ds, 0, seed=1, task=None)
    assert len(sub) == 0


# -- WIM pre-tuning init recorders ------------------------------------------


def test_finetune_writes_init_recorders():
    from joint_vae_tpu.ft.job import finetune, load_wim_job
    with tempfile.TemporaryDirectory() as d:
        job = _job()
        job.train_history = {'epochs': 1}
        job.training_parameters['set'] = 'blobs'
        save_job(job, d)
        wim = load_wim_job(d, distribution='gaussian', init_mean=8.0,
                           num_priors=1)
        tr = _dataset('blobs', n=64)
        te = _dataset('blobs', n=32, seed=4)
        ood = _dataset('noise', n=32, seed=5)
        moving = MixtureDataset(mix={'ind': 0.5, 'ood': 0.5}, length=32,
                                ind=te, ood=ood)
        finetune(wim, tr, moving, te, [ood], epochs=1, alpha=0.1,
                 batch_size=16, test_batch_size=16, save_dir=d)
        init_dir = os.path.join(d, 'samples', '0001', 'init')
        assert os.path.exists(os.path.join(init_dir, 'ood.json'))
        for s in ('blobs', 'noise'):
            p = find_record(init_dir, s)
            assert p is not None, 'no init recorder for {}'.format(s)
            assert LossRecorder.load(p).recorded_samples == 32


# -- fresh compute skips WIM twin methods -----------------------------------


def test_ood_rates_skip_wim_methods_without_recordings():
    from joint_vae_tpu.evals.engines import ood_detection_rates
    job = _job()
    te = _dataset(n=32)
    ood = _dataset('noise', n=32, seed=9)
    res = ood_detection_rates(job, te, [ood], batch_size=16,
                              method=['elbo', 'zdist@', 'elbo~'],
                              update_self_ood=False, recording=False)
    assert 'elbo' in res.get('noise', {})
    assert 'zdist@' not in res.get('noise', {})
    assert 'elbo~' not in res.get('noise', {})


def test_misclass_skips_wim_methods_and_persists_recorder():
    from joint_vae_tpu.evals.engines import misclassification_detection_rates
    with tempfile.TemporaryDirectory() as d:
        job = _job(saved_dir=d)
        job.train_history = {'epochs': 1}
        te = _dataset(n=48)
        res = misclassification_detection_rates(
            job, te, batch_size=16, predict_methods=['esty'],
            misclass_methods=['elbo', 'elbo~'])
        assert res, res
        sdir = os.path.join(d, 'samples', '0001')
        assert find_record(sdir, te.name) is not None, \
            'first-run recorder not persisted'


# -- generation grid honors diag prior scale ---------------------------------


def test_generation_grid_diag_scale():
    from joint_vae_tpu.evals.sample import generation_grid
    # huge inverse scale => z ~= class mean => every sample in a class
    # decodes (nearly) identically
    tight = _job(var_dim='diag', var_param=1e5)
    g = generation_grid(tight, n_per_class=4, key=jax.random.PRNGKey(0))
    spread_tight = float(np.abs(g - g.mean(1, keepdims=True)).max())
    loose = _job(var_dim='diag', var_param=0.5)
    g2 = generation_grid(loose, n_per_class=4, key=jax.random.PRNGKey(0))
    spread_loose = float(np.abs(g2 - g2.mean(1, keepdims=True)).max())
    assert spread_tight < 1e-3, spread_tight
    assert spread_loose > 10 * spread_tight

"""Thirteenth review batch (round-4 code sweep): checkpoint-format
staleness, env-flag falsy spellings, ingest cache robustness, the
PIL-less warm-cache path, the resnet import mapper's fail-loudly
contract, the export gate for width-suffixed trunks, and the
multi-process batch-divisibility error."""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from joint_vae_tpu.models.cvnet import CVNetConfig
from joint_vae_tpu.ops.priors import PriorConfig
from joint_vae_tpu.ops.sigma import SigmaConfig
from joint_vae_tpu.save_load.jobs import load_job, new_job, save_job
from joint_vae_tpu.save_load.sharded_checkpoint import is_sharded_checkpoint
from joint_vae_tpu.train.optimizers import OptimizerConfig

SHAPE = (3, 8, 8)


def _job(seed=1):
    cfg = CVNetConfig(input_shape=(1, 6, 6), num_labels=4, type='cvae',
                      encoder=(16,), decoder=(16,), classifier=(8,),
                      latent_dim=8, latent_sampling=1, gamma=10.0, beta=1e-2,
                      sigma=SigmaConfig(value=0.3),
                      prior=PriorConfig(dim=8, num_priors=4, init_mean=1.0,
                                        learned_means=True))
    return new_job(cfg, OptimizerConfig(lr=3e-3),
                   key=jax.random.PRNGKey(seed))


# -- checkpoint format switching ---------------------------------------------

def test_format_switch_retires_stale_twin_and_loads_newest(tmp_path):
    d = str(tmp_path / 'job')
    job = _job(seed=1)
    save_job(job, d)                               # npz format
    assert os.path.exists(os.path.join(d, 'state.npz'))

    job2 = _job(seed=2)                            # different weights
    job2.job_number = job.job_number
    save_job(job2, d, sharded=True)                # switch to shards
    # the stale npz twin is retired by the sharded save
    assert not os.path.exists(os.path.join(d, 'state.npz'))
    assert not os.path.exists(os.path.join(d, 'optimizer.npz'))
    assert is_sharded_checkpoint(os.path.join(d, 'state.shards'))

    from joint_vae_tpu.save_load.checkpoint import flatten_pytree
    got = jax.device_get(flatten_pytree(load_job(d).state.params))
    want = jax.device_get(flatten_pytree(job2.state.params))
    for k in want:
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)

    # and back: an npz save retires the shard dirs
    save_job(job, d, sharded=False)
    assert not os.path.isdir(os.path.join(d, 'state.shards'))
    got = jax.device_get(flatten_pytree(load_job(d).state.params))
    want = jax.device_get(flatten_pytree(job.state.params))
    for k in want:
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)


def test_load_arrays_prefers_newer_when_both_formats_exist(tmp_path):
    # simulate a job dir where retirement never ran (e.g. copied dir):
    # the loader must pick the NEWER checkpoint, not blindly the npz
    from joint_vae_tpu.save_load.jobs import _load_arrays
    d1, d2 = str(tmp_path / 'a'), str(tmp_path / 'b')
    old, new = _job(seed=1), _job(seed=2)
    new.job_number = old.job_number
    save_job(old, d1)                              # npz (older)
    save_job(new, d2, sharded=True)                # shards (newer)
    os.rename(os.path.join(d1, 'state.npz'), os.path.join(d2, 'state.npz'))
    t = time.time()
    os.utime(os.path.join(d2, 'state.npz'), (t - 100, t - 100))
    arrays = _load_arrays(d2, 'state')
    from joint_vae_tpu.save_load.checkpoint import flatten_pytree
    want = jax.device_get(flatten_pytree(new.state.params))
    for k in want:
        np.testing.assert_array_equal(arrays['params/' + k], want[k],
                                      err_msg=k)


def test_sharded_ckpt_env_falsy_spellings(tmp_path, monkeypatch):
    monkeypatch.setenv('JVT_SHARDED_CKPT', 'False')
    d = str(tmp_path / 'job')
    save_job(_job(), d)
    assert os.path.exists(os.path.join(d, 'state.npz'))
    assert not os.path.isdir(os.path.join(d, 'state.shards'))
    monkeypatch.setenv('JVT_SHARDED_CKPT', ' OFF ')
    save_job(_job(), d)
    assert os.path.exists(os.path.join(d, 'state.npz'))


# -- ingest cache robustness --------------------------------------------------

@pytest.fixture
def tree(tmp_path):
    PIL = pytest.importorskip('PIL')
    from PIL import Image
    rng = np.random.default_rng(0)
    for c in ('cat', 'dog'):
        cdir = os.path.join(str(tmp_path / 'tree'), c)
        os.makedirs(cdir, exist_ok=True)
        for i in range(4):
            arr = rng.integers(0, 256, (10, 10, 3), dtype=np.uint8)
            Image.fromarray(arr).save(
                os.path.join(cdir, 'im{:03d}.png'.format(i)))
    return str(tmp_path / 'tree')


def test_deleted_u8_with_surviving_meta_reingests(tree):
    from joint_vae_tpu.data.ingest import ingest_image_folder
    x, y, _ = ingest_image_folder(tree, SHAPE)
    ref = np.asarray(x).copy()
    cdir = os.path.join(tree, '.jvt_cache')
    u8 = [f for f in os.listdir(cdir) if f.endswith('.u8')]
    assert u8
    os.unlink(os.path.join(cdir, u8[0]))           # cache cleaner took it
    x2, y2, _ = ingest_image_folder(tree, SHAPE)   # re-ingests, no crash
    np.testing.assert_array_equal(np.asarray(x2), ref)

    # and a deleted labels file invalidates the same way
    yf = [f for f in os.listdir(cdir) if f.endswith('.y.npy')]
    os.unlink(os.path.join(cdir, yf[0]))
    x3, y3, _ = ingest_image_folder(tree, SHAPE)
    np.testing.assert_array_equal(y3, y)


def test_warm_cache_consumed_without_pil(tree, monkeypatch):
    from joint_vae_tpu.data import loaders
    from joint_vae_tpu.data.ingest import ingest_image_folder
    x, y, _ = ingest_image_folder(tree, SHAPE)     # build cache with PIL
    ref = np.asarray(x).copy()

    # hide PIL: `import PIL` must now raise ImportError
    for mod in list(sys.modules):
        if mod == 'PIL' or mod.startswith('PIL.'):
            monkeypatch.setitem(sys.modules, mod, None)
    with pytest.raises(ImportError):
        import PIL  # noqa: F401

    got = loaders._load_image_folder(tree, SHAPE, 'train')
    assert got is not None, 'warm cache ignored without PIL'
    np.testing.assert_array_equal(np.asarray(got[0]), ref)
    np.testing.assert_array_equal(got[1], y)


def test_ingest_cache_env_falsy_spellings(tree, monkeypatch):
    from joint_vae_tpu.data import ingest, loaders
    monkeypatch.setenv('JVT_INGEST_CACHE', 'OFF')

    def boom(*a, **k):
        raise AssertionError('cache path ran with JVT_INGEST_CACHE=OFF')

    monkeypatch.setattr(ingest, 'ingest_image_folder', boom)
    monkeypatch.setattr(ingest, 'open_cached_image_folder', boom)
    got = loaders._load_image_folder(tree, SHAPE, 'train')
    assert got is not None and got[0].shape[0] == 8
    assert not os.path.isdir(os.path.join(tree, '.jvt_cache'))


# -- importer / exporter gates ------------------------------------------------

def test_resnet_mapper_fails_loudly_on_missing_block_tensor():
    torch = pytest.importorskip('torch')
    from tests.test_import_resnet import _stub_torchvision
    _stub_torchvision()
    from joint_vae_tpu.save_load import tv_resnet
    from joint_vae_tpu.save_load.import_reference import (
        ImportError_, _map_resnet_features)
    from joint_vae_tpu.models.resnet import ResNetFeatures

    net = tv_resnet.resnet18()
    import torch.nn as nn
    trunk = nn.Sequential(*list(net.children())[:-1])
    sd = {'features.' + k: v.numpy()
          for k, v in trunk.state_dict().items()}
    feats = ResNetFeatures(arch='resnet18')
    params = feats.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3)))['params']
    out, stats = {}, {}
    _map_resnet_features(dict(sd), {'features_stack': params}, out, stats)
    assert out                                    # complete dict maps fine

    missing = {k: v for k, v in sd.items()
               if not k.startswith('features.5.1.conv2')}
    with pytest.raises(ImportError_, match='missing conv2'):
        _map_resnet_features(missing, {'features_stack': params}, {}, {})


def test_export_gate_rejects_width_suffixed_trunks(tmp_path):
    pytest.importorskip('torch')
    from joint_vae_tpu.save_load.export_reference import (
        ExportError_, export_to_reference_job)
    cfg = CVNetConfig(input_shape=(3, 32, 32), num_labels=4, type='cvae',
                      features='resnet18:16',
                      encoder=(16,), decoder=(16,), classifier=(8,),
                      latent_dim=8, latent_sampling=1, gamma=10.0,
                      beta=1e-2, sigma=SigmaConfig(value=0.3),
                      prior=PriorConfig(dim=8, num_priors=4))
    job = new_job(cfg, OptimizerConfig(lr=3e-3), key=jax.random.PRNGKey(0))
    d = str(tmp_path / 'job')
    save_job(job, d)
    with pytest.raises(ExportError_, match='no torchvision counterpart'):
        export_to_reference_job(d, str(tmp_path / 'out'))


# -- multi-process batch divisibility -----------------------------------------

def test_aligned_global_batch_divisibility_error(monkeypatch):
    from joint_vae_tpu.parallel import sharded_data
    monkeypatch.setattr(sharded_data.jax, 'process_count', lambda: 3)
    monkeypatch.setattr(sharded_data.jax, 'process_index', lambda: 0)
    with pytest.raises(ValueError, match='does not divide over 3'):
        sharded_data.aligned_global_batch(
            None, np.zeros((16, 3)), np.zeros((16,)))


def test_bench_json_has_no_fake_measured_field():
    src = open(os.path.join(os.path.dirname(__file__), '..',
                            'bench.py')).read()
    assert 'cpu_parity_ratio_measured' not in src
    assert 'cpu_parity_anchor_r3' in src

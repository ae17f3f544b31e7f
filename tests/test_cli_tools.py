"""Grid expansion, image-folder loader, profiling utils."""

import os
import tempfile

import numpy as np
import pytest

from joint_vae_tpu.cli.grid import expand_grid
from joint_vae_tpu.data.loaders import _load_image_folder
from joint_vae_tpu.utils.profiling import StepTimer, trace


def test_expand_grid():
    argvs = expand_grid({'config': 'cifar10', 'latent-dim': '64 128 256',
                         'beta': '1e-4 1e-3'})
    assert len(argvs) == 6
    joined = [' '.join(a) for a in argvs]
    assert all('--config cifar10' in j for j in joined)
    assert sum('--latent-dim 64' in j for j in joined) == 2
    # no sweep -> single command
    assert len(expand_grid({'config': 'mnist'})) == 1


def test_image_folder_loader():
    PIL = pytest.importorskip('PIL.Image')
    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as d:
        for cname in ('wnid_a', 'wnid_b', 'wnid_c'):
            os.makedirs(os.path.join(d, 'train', cname))
            for i in range(3):
                arr = (rng.uniform(0, 255, (10, 12, 3))).astype(np.uint8)
                PIL.fromarray(arr).save(
                    os.path.join(d, 'train', cname, '{}.png'.format(i)))
        x, y = _load_image_folder(d, (3, 8, 8), 'train')
        assert x.shape == (9, 3, 8, 8)
        assert set(y) == {0, 1, 2}
        # class-file restriction
        cf = os.path.join(d, 'classes.txt')
        with open(cf, 'w') as f:
            f.write('wnid_a first class\nwnid_c third class\n')
        x2, y2 = _load_image_folder(d, (3, 8, 8), 'train', class_file=cf)
        assert x2.shape == (6, 3, 8, 8)
        assert set(y2) == {0, 1}


def test_step_timer():
    t = StepTimer()
    m = t.tick(32)
    assert m['step'] == 1
    import time
    time.sleep(0.01)
    m = t.tick(32)
    assert m['latency_s'] > 0
    assert m['images_per_sec'] > 0


def test_trace_context_noop():
    with trace(enabled=False):
        pass


def test_every_named_config_builds():
    """Every section of configs/default.ini must resolve to a valid model
    config (ref config.ini named sections, ported)."""
    import configparser
    import os
    from joint_vae_tpu.utils.parameters import (get_args,
                                                model_config_from_args)
    ini = os.path.join(os.path.dirname(__file__), '..', 'configs',
                       'default.ini')
    cp = configparser.ConfigParser()
    cp.read(ini)
    seen = 0
    for sec in cp.sections():
        if sec.startswith('wim'):
            continue
        args = get_args(['--config', sec], 'train')
        cfg = model_config_from_args(args)
        assert cfg.type in ('cvae', 'vae', 'jvae', 'xvae', 'vib')
        assert cfg.latent_dim > 0
        seen += 1
    assert seen >= 13

"""Inspection exporters, maintenance tools, device utils, parameters CLI."""

import os
import tempfile

import numpy as np
import jax

from joint_vae_tpu.utils.inspection import (export_latent_histograms,
                                            latent_pca, latent_shift)
from joint_vae_tpu.utils.maintenance import (delete_job, purge_deleted,
                                             prune_out_files, rsync_command)
from joint_vae_tpu.utils.device import compute_max_batch_size, dump_crash
from joint_vae_tpu.utils.parameters import (get_args, model_config_from_args,
                                            optimizer_config_from_args,
                                            next_job_number,
                                            load_config_section)
from joint_vae_tpu.models.cvnet import CVNetConfig
from joint_vae_tpu.ops.sigma import SigmaConfig
from joint_vae_tpu.save_load.jobs import new_job, save_job
from joint_vae_tpu.save_load.fetch import collect_models

RNG = np.random.default_rng(0)


def test_latent_exports():
    mu = RNG.normal(size=(100, 8))
    lv = RNG.normal(size=(100, 8)) * 0.1
    y = RNG.integers(0, 3, 100)
    with tempfile.TemporaryDirectory() as d:
        out = export_latent_histograms(mu, lv, d, y=y)
        for p in out.values():
            assert os.path.exists(p)
    proj, comps, evr = latent_pca(mu)
    assert proj.shape == (100, 2) and comps.shape == (2, 8)
    assert 0 < evr.sum() <= 1.0
    s = latent_shift(mu, mu + 1.0)
    assert abs(s['mean_shift'] - np.sqrt(8)) < 1e-6


def test_maintenance():
    with tempfile.TemporaryDirectory() as root:
        cfg = CVNetConfig(input_shape=(1, 4, 4), num_labels=2, type='vae',
                          encoder=(8,), decoder=(8,), latent_dim=2,
                          latent_sampling=1, sigma=SigmaConfig(value=0.5))
        for i in (1, 2):
            save_job(new_job(cfg, job_number=i), os.path.join(root, str(i)),
                     save_state=False)
        delete_job(os.path.join(root, '1'))
        assert os.path.exists(os.path.join(root, '1', 'deleted'))
        gone = purge_deleted(root)
        assert len(gone) == 1
        assert len(collect_models(root)) == 1
        open(os.path.join(root, 'x.tmp'), 'w').close()
        assert prune_out_files(root) == [os.path.join(root, 'x.tmp')]
    cmd = rsync_command('host', 'jobs', profile='results')
    assert cmd[0] == 'rsync' and any('--include=*.json' in c for c in cmd)


def test_max_batch_probe_and_dump():
    calls = []

    def step(n):
        calls.append(n)
        if n > 512:
            raise RuntimeError('RESOURCE_EXHAUSTED: out of memory')

    assert compute_max_batch_size(step, start=128, ceiling=4096) == 512

    cfg = CVNetConfig(input_shape=(1, 4, 4), num_labels=2, type='vae',
                      encoder=(8,), decoder=(8,), latent_dim=2,
                      latent_sampling=1, sigma=SigmaConfig(value=0.5))
    job = new_job(cfg, key=jax.random.PRNGKey(0))
    with tempfile.TemporaryDirectory() as d:
        out = dump_crash(job, np.zeros((2, 1, 4, 4)), np.zeros(2),
                         ValueError('boom'), log_dir=d)
        assert os.path.exists(os.path.join(out, 'batch.npz'))
        assert os.path.exists(os.path.join(out, 'error.txt'))
        assert os.path.exists(os.path.join(out, 'state.npz'))


def test_args_and_config_sections():
    args = get_args(['--config', 'tilted', '--epochs', '3'])
    assert args.type == 'vae' and args.prior == 'tilted'
    assert args.encoder_forced_variance == 1.0
    assert args.epochs == 3  # CLI overrides config
    cfg = model_config_from_args(args)
    assert cfg.prior.distribution == 'tilted' and cfg.prior.tau == 25
    assert cfg.encoder_forced_variance == 1.0
    assert cfg.sigma_cfg.value == 0.7071
    opt = optimizer_config_from_args(args)
    assert opt.lr == 1e-4

    args2 = get_args(['--dataset', 'mnist', '--sigma', 'rmse'])
    cfg2 = model_config_from_args(args2)
    assert cfg2.sigma_cfg.is_rmse
    assert cfg2.input_shape == (1, 28, 28) and cfg2.num_labels == 10

    d = load_config_section(None, 'wim-default')
    assert d['alpha'] == 0.1 and d['moving_size'] == 512


def test_job_numbering():
    with tempfile.TemporaryDirectory() as d:
        assert next_job_number(d) == 1
        assert next_job_number(d) == 2
        assert next_job_number(d) == 3


def test_set_log_file_and_needed_remote_files(tmp_path):
    from joint_vae_tpu.utils.print_log import set_log
    import logging
    root = set_log(verbose=1, log_dir=str(tmp_path), job_number=42)
    logging.getLogger('t').info('hello file')
    for h in list(root.handlers):
        h.flush()
    logs = [f for f in os.listdir(tmp_path) if f.endswith('.log')]
    assert logs and '42' in logs[0]
    # avoid polluting other tests' logging
    for h in list(root.handlers):
        if hasattr(h, 'baseFilename'):
            root.removeHandler(h)

    from joint_vae_tpu.save_load.fetch import needed_remote_files
    d = tmp_path / 'jobs' / 'a'
    d.mkdir(parents=True)
    (d / 'params.json').write_text('{}')
    needs = needed_remote_files(str(tmp_path / 'jobs'))
    assert any('state.npz' in n for n in needs)
    assert any(n.endswith('samples/') for n in needs)

    # ft sidecar arrays travel with the state tier
    (d / 'train_params.json').write_text(
        '{"wim": {"distribution": "gaussian"}, "poscod": {"epochs": 5}}')
    needs = needed_remote_files(str(tmp_path / 'jobs'))
    assert any(n.endswith('wim_prior.npz') for n in needs)
    assert any(n.endswith('poscod_head.npz') for n in needs)

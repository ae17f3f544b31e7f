"""Cascade CLI and Poscod-mode ft CLI smokes."""

import os

import pytest

pytestmark = pytest.mark.slow

TRAIN_ARGS = ['--dataset', 'mnist', '--type', 'cvae', '--epochs', '1',
              '--batch-size', '32', '--test-batch-size', '64',
              '-K', '8', '--encoder', '32', '--decoder', '32',
              '--classifier', '8', '--gamma', '100', '--sigma', '0.3',
              '--test-latent-sampling', '2', '--dataset-size', '96',
              '--full-test-every', '100', '--ood-detection-every', '100',
              '--no-final-test', '--no-final-ood']


@pytest.fixture(scope='module')
def job_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp('jobs'))
    from joint_vae_tpu.cli.train import main
    assert main(TRAIN_ARGS + ['--job-dir', d]) == 0
    assert main(TRAIN_ARGS + ['--job-dir', d, '--seed', '1']) == 0
    return d


def test_cascade_cli(job_dir, capsys):
    from joint_vae_tpu.cli.cascade import main
    assert main(['1', '2', '--job-dir', job_dir, '-N', '64']) == 0
    out = capsys.readouterr().out
    assert 'Im(T)' in out and 'bayes-iterated accuracy' in out
    from joint_vae_tpu.save_load.fetch import find_by_job_number
    j = find_by_job_number(job_dir, 1, load_state=False)
    assert os.path.exists(os.path.join(j.saved_dir, 'samples', 'cascade',
                                       'cascade.json'))


def test_poscod_cli(job_dir, capsys):
    from joint_vae_tpu.cli.ft import main
    rc = main(['1', '--job-dir', job_dir, '--poscod', '--epochs', '2',
               '--moving-size', '64', '--batch-size', '32',
               '--test-batch-size', '64', '--oodsets', 'fashion'])
    assert rc == 0
    out = capsys.readouterr().out
    assert 'poscod llr vs fashion' in out
    # the fine-tuned head is a NEW job under <job-dir>/wim; the source
    # job's results are untouched
    from joint_vae_tpu.save_load.fetch import collect_models
    from joint_vae_tpu.save_load.jobs import load_job
    dirs = collect_models(os.path.join(job_dir, 'wim'))
    assert dirs
    j = load_job(dirs[0], load_state=False)
    assert 'llr' in j.ood_results[j.trained]['fashion']


def test_cascade_record_im(job_dir, capsys):
    """--record writes stage-pair-stacked Im-<T> tensors that the
    mutual-info table pipeline consumes (ref cascad.py:162)."""
    from joint_vae_tpu.cli.cascade import main
    assert main(['1', '2', '--job-dir', job_dir, '-N', '64',
                 '--record', '-T', '1', '2']) == 0
    from joint_vae_tpu.save_load.recorders import find_record
    rec = find_record(os.path.join(job_dir, 'mnist', '1-2'), 'mnist')
    assert rec is not None
    import numpy as np
    from joint_vae_tpu.save_load.recorders import LossRecorder
    r = LossRecorder.load(rec)
    assert np.asarray(r.get('Im-1')).shape == (1, 64)   # (pairs, N)

    from joint_vae_tpu.results.mutual_info import main as mi_main
    assert mi_main([os.path.join(job_dir, 'mnist', '1-2')]) == 0
    out = capsys.readouterr().out
    assert 'Im[ok]' in out

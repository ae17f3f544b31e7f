"""Reference-CLI-surface flags added in round 2 follow-up:
test CLI --sets/--ood-methods/--predict-methods/--misclass-methods/-t/
-F/--tpr/--tnr/--list-jobs-and-quit; train CLI --no-features/--oodsets/
--test-sample-size/--static-prior-means (ref utils/parameters.py:236-483,
test.py:19-523)."""

import json
import os

import pytest

pytestmark = pytest.mark.slow

TRAIN_ARGS = ['--dataset', 'mnist', '--type', 'cvae', '--epochs', '1',
              '--batch-size', '32', '--test-batch-size', '64',
              '-K', '8', '--encoder', '32', '--decoder', '32',
              '--classifier', '8', '--gamma', '100', '--sigma', '0.3',
              '--test-latent-sampling', '2', '--dataset-size', '96',
              '--no-final-ood']


@pytest.fixture(scope='module')
def job_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp('jobs'))
    from joint_vae_tpu.cli.train import main
    # --oodsets [] skips in-training OOD; -t caps monitoring sample size
    assert main(TRAIN_ARGS + ['--job-dir', d, '--oodsets',
                              '--test-sample-size', '64']) == 0
    return d


def test_list_jobs_and_quit(job_dir, capsys):
    from joint_vae_tpu.cli.test import main
    assert main(['--job-dir', job_dir, '--list-jobs-and-quit']) == 0
    out = capsys.readouterr().out.strip()
    assert out and job_dir in out


def test_only_finished(job_dir, capsys):
    from joint_vae_tpu.cli.test import main
    assert main(['--job-dir', job_dir, '-F', '--list-jobs-and-quit']) == 0
    assert job_dir in capsys.readouterr().out
    # mark the job unfinished by raising its target epochs
    from joint_vae_tpu.save_load.fetch import collect_models
    d = collect_models(job_dir)[0]
    tp = json.load(open(os.path.join(d, 'train_params.json')))
    tp['epochs'] = 99
    json.dump(tp, open(os.path.join(d, 'train_params.json'), 'w'))
    try:
        assert main(['--job-dir', job_dir, '-F',
                     '--list-jobs-and-quit']) == 0
        assert job_dir not in capsys.readouterr().out
    finally:
        tp['epochs'] = 1
        json.dump(tp, open(os.path.join(d, 'train_params.json'), 'w'))


def test_restricted_methods_and_sets(job_dir, capsys):
    from joint_vae_tpu.cli.test import main
    # reference --compute grammar: bare --compute only replays recorders;
    # 'hard' adds the model-recompute tier (ref test.py:110-121)
    assert main(['--job-dir', job_dir, '--compute', 'hard', '-t', '64',
                 '--sets', 'const28',
                 '--ood-methods', 'elbo', '--predict-methods', 'esty',
                 '--misclass-methods', 'max']) == 0
    # stored ood results hold only the requested method for the
    # requested set
    from joint_vae_tpu.save_load.fetch import collect_models
    from joint_vae_tpu.save_load.jobs import load_job
    job = load_job(collect_models(job_dir)[0], load_state=False)
    epoch = max(job.ood_results, key=int)
    sets = job.ood_results[epoch]
    assert 'const28' in sets
    assert set(sets['const28']) == {'elbo'}


def test_tnr_and_tpr_columns(job_dir, capsys):
    from joint_vae_tpu.cli.test import main
    assert main(['--job-dir', job_dir, '--tnr']) == 0
    out = capsys.readouterr().out
    assert 'tnr95' in out and 'fpr95' not in out
    assert main(['--job-dir', job_dir, '--tpr', '90']) == 0
    out = capsys.readouterr().out
    assert 'fpr90' in out


def test_ft_inspection_and_lr(job_dir):
    from joint_vae_tpu.cli.ft import main
    from joint_vae_tpu.save_load.fetch import find_by_job_number
    rc = main(['1', '--job-dir', job_dir, '--epochs', '1',
               '--moving-size', '64', '--train-size', '64',
               '--batch-size', '32', '--test-batch-size', '32',
               '--oodsets', 'fashion', '--inspection', '--lr', '5e-5'])
    assert rc == 0
    # the fine-tune writes a NEW wim job (number 2) under <job-dir>/wim —
    # the source job's checkpoint is never touched
    job = find_by_job_number(job_dir, 2, load_state=False)
    assert job is not None and os.sep + 'wim' + os.sep in job.saved_dir
    assert job.training_parameters.get('from_job') == 1
    edir = os.path.join(job.saved_dir, 'samples',
                        '{:04d}'.format(job.trained))
    # init + post latent dumps and the shift report
    for f in (os.path.join('init', 'sample-mnist.npz'),
              'sample-mnist.npz', 'sample-fashion.npz', 'inspection.json'):
        assert os.path.exists(os.path.join(edir, f)), f
    insp = json.load(open(os.path.join(edir, 'inspection.json')))
    assert insp['mean_shift'] >= 0 and len(insp['pca_explained']) == 2
    # the recorded latents carry both priors' centroids as auxiliaries
    import numpy as np
    with np.load(os.path.join(edir, 'sample-mnist.npz')) as z:
        assert 'mu' in z and 'centroids' in z and 'alternate' in z
    # the 2D projection CSV (default model pca, ref ft/inspection.py:217)
    csv = open(os.path.join(edir, 'proj2d-pca.csv')).read().splitlines()
    assert csv[0] == 'x1,x2,y,set,dist,ft'
    assert any(',alt,ood,both' in line for line in csv[1:])
    assert any(line.endswith(',mnist,ind,ft') for line in csv[1:])


def test_no_features_flag():
    from joint_vae_tpu.utils.parameters import (get_args,
                                                model_config_from_args)
    args = get_args(['--dataset', 'mnist', '--features', 'conv32',
                              '--no-features'])
    assert model_config_from_args(args).features is None
    args = get_args(['--dataset', 'mnist', '--features', 'none'])
    assert model_config_from_args(args).features is None


def test_static_prior_means_flag():
    from joint_vae_tpu.utils.parameters import get_args
    args = get_args(['--dataset', 'mnist', '--learned-prior-means',
                              '--static-prior-means'])
    assert args.learned_prior_means is False

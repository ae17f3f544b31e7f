"""examples/fleet_demo.sh as a slow-tier test (VERDICT r3 item 8): the
whole user-facing workflow — grid sweep -> fleet test + aggregate ->
results tables -> sample grids -> WIM fine-tune — runs green as one unit,
driven through the same CLIs the shell script calls, at tiny sizes.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow


@pytest.fixture(scope='module')
def fleet(tmp_path_factory):
    jobs = str(tmp_path_factory.mktemp('fleet_demo'))
    grid_ini = os.path.join(jobs, 'grid.ini')
    with open(grid_ini, 'w') as f:
        f.write("""[sweep]
dataset = shapes32
type = cvae
latent-dim = 8 16
encoder = 32
decoder = 32
classifier = 16
gamma = 200
sigma = 0.2
epochs = 2
batch-size = 64
dataset-size = 256
test-batch-size = 128
no-final-ood = true
job-dir = {}
""".format(jobs))
    from joint_vae_tpu.cli.grid import main
    assert main([grid_ini, '--run', '--platform', 'cpu']) == 0
    return jobs


def test_grid_swept_two_jobs(fleet):
    from joint_vae_tpu.save_load.fetch import fetch_models
    models = fetch_models(fleet, flash=False)
    assert len(models) == 2
    assert sorted(m['K'] for m in models) == [8, 16]
    for m in models:
        assert m['done'] == 2


def test_fleet_test_and_aggregate(fleet, capsys):
    from joint_vae_tpu.cli.test import main
    assert main(['--job-dir', fleet, '--agg']) == 0
    out = capsys.readouterr().out
    # constant index levels (dataset) are auto-removed from the printed
    # frame; both swept latent dims must appear as rows under accuracy
    assert 'accuracy' in out and 'cvae' in out
    assert '16' in out and '8' in out


def test_results_tables(fleet, tmp_path):
    tabs = str(tmp_path / 'tabs.ini')
    with open(tabs, 'w') as f:
        f.write('[shapes-cvae]\ntype = cvae\nset = shapes32\n')
    from joint_vae_tpu.cli.results import main
    out_dir = str(tmp_path / 'out')
    assert main([tabs, '--job-dir', fleet, '--out-dir', out_dir]) == 0
    made = os.listdir(out_dir)
    assert any(n.endswith('.tex') for n in made), made
    assert any(n.endswith('.tab') for n in made), made


def test_sample_grids(fleet):
    from joint_vae_tpu.cli.sample import main
    assert main(['1', '--job-dir', fleet, '--grids', 'reco', 'gen',
                 '-N', '4']) == 0
    job_dir = None
    for root, dirs, files in os.walk(fleet):
        if 'params.json' in files and root.rstrip('/').endswith('1'):
            job_dir = root
    assert job_dir
    made = os.listdir(os.path.join(job_dir, 'samples'))
    assert made


def test_wim_finetune_stage(fleet):
    from joint_vae_tpu.cli.ft import main
    assert main(['1', '--job-dir', fleet, '--epochs', '1',
                 '--moving-size', '64', '--train-size', '128',
                 '--batch-size', '32', '--test-batch-size', '64',
                 '--oodsets', 'uniform32']) == 0
    # the ft CLI writes a NEW wim job; its ood results must carry llr-ish
    # post scores
    from joint_vae_tpu.save_load.fetch import fetch_models
    models = fetch_models(fleet, flash=False)
    wim = [m for m in models if (m.get('wim') or m.get('job') > 2)]
    assert len(models) == 3 and wim
    from joint_vae_tpu.save_load.jobs import load_job
    j = load_job(wim[-1]['dir'], ghost=True)
    post = j.ood_results[max(k for k in j.ood_results if isinstance(k, int))]
    assert 'uniform32' in post
    aucs = [v.get('auc') for v in post['uniform32'].values()
            if isinstance(v, dict)]
    assert aucs and all(np.isfinite(a) for a in aucs if a is not None)

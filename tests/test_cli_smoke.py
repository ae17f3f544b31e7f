"""In-process smoke tests of every CLI driver on tiny synthetic data:
train -> test -> sample -> aggregate -> ft (WIM) -> results."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

TRAIN_ARGS = ['--dataset', 'mnist', '--type', 'cvae', '--epochs', '1',
              '--batch-size', '32', '--test-batch-size', '64',
              '-K', '8', '--encoder', '32', '--decoder', '32',
              '--classifier', '8', '--gamma', '100', '--sigma', '0.3',
              '--test-latent-sampling', '2', '--dataset-size', '96',
              '--validation', '32', '--no-final-ood']


@pytest.fixture(scope='module')
def job_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp('jobs'))
    from joint_vae_tpu.cli.train import main
    assert main(TRAIN_ARGS + ['--job-dir', d]) == 0
    return d


def test_train_cli_artifacts(job_dir):
    from joint_vae_tpu.save_load.fetch import collect_models
    dirs = collect_models(job_dir)
    assert len(dirs) == 1
    for f in ('params.json', 'state.npz', 'history.json', 'output.out'):
        assert os.path.exists(os.path.join(dirs[0], f))


def test_test_cli(job_dir, capsys):
    from joint_vae_tpu.cli.test import main
    assert main(['--job-dir', job_dir]) == 0
    out = capsys.readouterr().out
    assert 'accuracy' in out or 'acc' in out.lower()
    # tex export
    tex = os.path.join(job_dir, 'out.tex')
    assert main(['--job-dir', job_dir, '--tex', tex]) == 0
    assert os.path.exists(tex)


def test_sample_cli(job_dir):
    from joint_vae_tpu.cli.sample import main
    out = os.path.join(job_dir, 'grids')
    assert main(['1', '--job-dir', job_dir, '--grids', 'reco', 'gen',
                 'zsample', '-N', '4', '-L', '2', '--out', out]) == 0
    assert os.path.exists(os.path.join(out, 'reco-mnist.npz'))
    assert os.path.exists(os.path.join(out, 'generation.npz'))
    assert os.path.exists(os.path.join(out, 'hist-of-var.dat'))
    assert os.path.exists(os.path.join(out, 'mu-sigma-scatter.dat'))
    # correct/incorrect pools scanned across the test set
    assert os.path.exists(os.path.join(out, 'reco-correct.npz'))
    assert os.path.exists(os.path.join(out, 'reco-incorrect.npz'))
    # per-class latent exports (the reference's per-class coloring)
    assert os.path.exists(os.path.join(out, 'hist-of-var-0.dat'))

    # comparison grid (self-compare collapses to one row; still writes)
    assert main(['1', '--job-dir', job_dir, '--grids', '-N', '4',
                 '--compare', '1', '--out', out]) == 0
    comp = np.load(os.path.join(out, 'comparison.npz'))
    assert comp['mse'].shape == (1, 1) and comp['recos'].shape[0] == 1
    with pytest.raises(SystemExit):
        main(['1', '--job-dir', job_dir, '--grids', '--compare', '99',
              '--out', out])


def test_aggregate_cli(job_dir, capsys):
    from joint_vae_tpu.cli.aggregate import main
    assert main(['1', '1', '--job-dir', job_dir, '--methods', 'elbo', 'vote',
                 '--batch-size', '64', '--dataset-size', '64']) == 0
    out = capsys.readouterr().out
    assert 'ensemble' in out and 'mutual information' in out


def test_aggregate_cli_combos(job_dir, capsys):
    """k-of-n sub-ensembles + the mean~ (softmax(-kl) mean) combine
    (ref results/aggregation.py:18,241-308,330-335)."""
    from joint_vae_tpu.cli.aggregate import main
    assert main(['1', '1', '--job-dir', job_dir,
                 '--methods', 'mean', 'mean~',
                 '--combos', '1', '2',
                 '--batch-size', '64', '--dataset-size', '64']) == 0
    out = capsys.readouterr().out
    assert 'combo' in out
    assert '1+1' in out      # k=2 'mean' letter join
    assert '1~1' in out      # k=2 'mean~' letter join
    # identical models: the ensemble equals the single model
    import re
    accs = {m.group(1): m.group(2) for m in
            re.finditer(r'combo\s+(\S+): accuracy (\S+)', out)}
    assert accs['1+1'] == accs['1']


def _wim_dirs(job_dir):
    from joint_vae_tpu.save_load.fetch import collect_models
    return collect_models(os.path.join(job_dir, 'wim'))


def test_ft_cli(job_dir, capsys):
    from joint_vae_tpu.cli.ft import main
    from joint_vae_tpu.save_load.fetch import find_by_job_number
    src_before = find_by_job_number(job_dir, 1, load_state=False)
    state_path = os.path.join(src_before.saved_dir, 'state.npz')
    state_bytes = open(state_path, 'rb').read()
    rc = main(['1', '--job-dir', job_dir, '--epochs', '1',
               '--moving-size', '64', '--train-size', '64',
               '--batch-size', '32', '--test-batch-size', '32',
               '--oodsets', 'fashion'])
    assert rc == 0
    # the fine-tuned model is a NEW job under <job-dir>/wim — the source
    # job's checkpoint and parameters are untouched (ref ft/__main__.py)
    src = find_by_job_number(job_dir, 1, load_state=False)
    assert 'wim' not in src.training_parameters
    assert open(state_path, 'rb').read() == state_bytes
    from joint_vae_tpu.save_load.jobs import load_job
    dirs = _wim_dirs(job_dir)
    assert len(dirs) == 1
    wim_job = load_job(dirs[0], load_state=False)
    assert 'wim' in wim_job.training_parameters
    assert wim_job.training_parameters['from_job'] == 1
    assert wim_job.job_number != 1


def test_ft_array_cli(job_dir, tmp_path, capsys):
    """Array aggregation over the WIM job written by test_ft_cli."""
    arr_dir = str(tmp_path / 'array')
    from joint_vae_tpu.cli.ft import main
    rc = main(['--array', arr_dir, '--register', _wim_dirs(job_dir)[0],
               '--oodsets', 'fashion', '--job-dir', job_dir])
    assert rc == 0
    from joint_vae_tpu.save_load.checkpoint import load_json
    res = load_json(os.path.join(arr_dir, 'ood.json'))
    assert 'fashion' in res and 'elbo@' in res['fashion']
    assert 0.0 <= res['fashion']['elbo@']['auc'] <= 1.0


def test_results_cli(job_dir, tmp_path, capsys):
    ini = tmp_path / 'tabs.ini'
    ini.write_text('[mnist-group]\nset = mnist\ntype = cvae\n'
                   '[mnist-t90]\nset = mnist\ntype = cvae\ntpr = 90\n')
    from joint_vae_tpu.cli.results import main
    assert main([str(ini), '--job-dir', job_dir,
                 '--out-dir', str(tmp_path)]) == 0
    assert (tmp_path / 'mnist-group.tex').exists()
    assert (tmp_path / 'mnist-t90.tex').exists()


def test_grid_cli(tmp_path, capsys):
    g = tmp_path / 'grid.ini'
    g.write_text('[s]\ndataset = mnist\nlatent-dim = 8 16\n')
    from joint_vae_tpu.cli.grid import main
    assert main([str(g)]) == 0
    out = capsys.readouterr().out
    assert out.count('cli.train') == 2


def test_grid_cli_reference_format(tmp_path, capsys):
    """Reference grid.ini compatibility: underscore keys and repeat
    (ref grid.ini [kl] section)."""
    g = tmp_path / 'grid.ini'
    g.write_text('[kl]\nrepeat = 2\nbeta = 2e-4 5e-5\n'
                 'latent_sampling = 256\nlatent_dim = 64 128\n')
    from joint_vae_tpu.cli.grid import main
    assert main([str(g)]) == 0
    out = capsys.readouterr().out
    assert out.count('cli.train') == 8          # 2 beta x 2 K x repeat 2
    assert '--latent-sampling 256' in out and '--latent_sampling' not in out


def test_results_cli_comparison(job_dir, tmp_path):
    """Comparison mode: one table per INI, sections as columns, rows acc +
    ood sets + average, best-in-row bolding (ref results/__main__.py)."""
    ini = tmp_path / 'cmp.ini'
    ini.write_text('[DEFAULT]\ndataset = mnist\nood = fashion letters\n'
                   'tpr = 95\naverage = average fashion letters\n'
                   '[cvae-g]\nset = mnist\ntype = cvae\n')
    from joint_vae_tpu.cli.results import main
    assert main([str(ini), '--job-dir', job_dir,
                 '--out-dir', str(tmp_path)]) == 0
    tex = (tmp_path / 'cmp-tab.tex').read_text()
    assert 'acc' in tex and 'fashion' in tex
    assert r'\bfseries' in tex           # single section: its values are best
    assert r'\cmidrule' in tex or r'\midrule' in tex
    assert '% ' in tex                    # job-list comments
    tab = (tmp_path / 'cmp-tab.tab').read_text()
    assert 'cvae-g-rate' in tab and 'average' in tab


def test_aggregate_record_and_mutual_info(job_dir, capsys):
    """Im-(T) recording (aggregate --record) + the recorded-Im table
    pipeline (ref results/mutual_info.py)."""
    from joint_vae_tpu.cli.aggregate import main as agg_main
    assert agg_main(['1', '1', '--job-dir', job_dir, '--methods', 'elbo',
                     '--batch-size', '48', '--dataset-size', '96',
                     '--record', '-T', '1', '2']) == 0
    rec_dir = os.path.join(job_dir, 'mnist', '1|1')
    from joint_vae_tpu.save_load.recorders import find_record
    assert find_record(rec_dir, 'mnist') is not None

    from joint_vae_tpu.results.mutual_info import main as mi_main
    assert mi_main([rec_dir]) == 0
    out = capsys.readouterr().out
    assert 'Im[ok]' in out and 'acc' in out


def test_train_cli_tv_densenet_trunk(tmp_path):
    """A torchvision-arch trunk (densenet121, /32 spatial) trains through
    the full CLI on a 32px 3-channel dataset — the e2e path behind
    `--features densenet121` (round-4 trunk support; fast sizes)."""
    from joint_vae_tpu.cli.train import main
    from joint_vae_tpu.save_load.fetch import collect_models
    d = str(tmp_path / 'jobs')
    args = ['--dataset', 'cifar10', '--type', 'cvae',
            '--features', 'densenet121', '--epochs', '1',
            '--batch-size', '8', '--test-batch-size', '16',
            '-K', '4', '--encoder', '8', '--decoder', '8',
            '--classifier', '4', '--gamma', '10', '--sigma', '0.3',
            '--test-latent-sampling', '2', '--dataset-size', '24',
            '--no-final-ood', '--job-dir', d]
    assert main(args) == 0
    (job,) = collect_models(d)
    import json
    with open(os.path.join(job, 'params.json')) as f:
        assert json.load(f)['features'] == 'densenet121'
    assert os.path.exists(os.path.join(job, 'state.npz'))

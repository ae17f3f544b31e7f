"""Round-2 CLI surface closure: the reference flags added late.

Covers (ref utils/parameters.py:229-530, test.py:110-121):
- train aliases -M/-m/-V/-s/-l/-j/-R/--wd/--categorical/--encoder-free-variance
- dead-in-reference flags accepted (--conv-padding, --force-cross-y, -T, -o)
- --where / --job-number
- test --compute mode grammar, filter-key flags, --from-files INIs,
  --remove-index, --expand/-e column control via results_dataframe.
"""

import os
import textwrap

import pytest

from joint_vae_tpu.cli.test import (COMPUTE_TIERS, filters_from_args,
                                    read_filter_file)
from joint_vae_tpu.results.tables import results_dataframe
from joint_vae_tpu.utils.parameters import get_args


def test_train_aliases_parse():
    a = get_args(['--dataset', 'mnist', '-M', '32', '-m', '64', '-V', '128',
                  '-s', 'rmse', '-l', '4', '--wd', '0.01', '-j', '42',
                  '-K', '8', '-L', '2'])
    assert (a.batch_size, a.test_batch_size, a.validation) == (32, 64, 128)
    assert a.sigma == 'rmse' and a.test_latent_sampling == 4
    assert a.weight_decay == 0.01 and a.job_number == 42
    assert a.latent_dim == 8 and a.latent_sampling == 2


def test_train_categorical_and_free_variance():
    a = get_args(['--dataset', 'mnist', '--categorical',
                  '--encoder-forced-variance'])
    assert a.output_distribution == 'categorical'
    assert a.encoder_forced_variance == 1.0      # bare flag -> const 1.0
    b = get_args(['--dataset', 'mnist', '--encoder-forced-variance', '2.5',
                  '--encoder-free-variance'])
    assert b.encoder_forced_variance == 0.0


def test_train_dead_reference_flags_accepted():
    a = get_args(['--dataset', 'mnist', '--conv-padding', '1',
                  '--force-cross-y', '0.5'])
    assert a.conv_padding == '1' and a.force_cross_y == 0.5
    b = get_args(['--dataset', 'mnist', '--force-cross-y'])
    assert b.force_cross_y == 1.0


def test_compute_tier_grammar():
    # ref test.py:110-121
    assert COMPUTE_TIERS[False] == ('json',)
    assert COMPUTE_TIERS['recorder'] == ('json', 'recorders')
    assert COMPUTE_TIERS['re'] == ('recorders',)
    assert COMPUTE_TIERS['hard'] == ('json', 'recorders', 'compute')
    assert COMPUTE_TIERS['rehard'] == ('compute',)


def test_filter_key_flags(tmp_path):
    import joint_vae_tpu.cli.test as T
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument('--filter', nargs='*', default=[])
    T.add_filter_args(p)
    args = p.parse_args(['--dataset', 'cifar10', '--type', 'cvae',
                         '-K', '64...128', '--filter', 'beta=1'])
    flt = filters_from_args(args)
    assert flt({'set': 'cifar10', 'type': 'cvae', 'latent_dim': 100,
                'beta': 1.0})
    assert not flt({'set': 'mnist', 'type': 'cvae', 'latent_dim': 100,
                    'beta': 1.0})
    assert not flt({'set': 'cifar10', 'type': 'cvae', 'latent_dim': 32,
                    'beta': 1.0})


def test_from_files_filter_ini(tmp_path):
    ini = tmp_path / 'flt.ini'
    ini.write_text(textwrap.dedent("""\
        [cvae-jobs]
        type = cvae
        dataset = cifar10

        [vae-jobs]
        type = vae

        [options]
        cifar10 ood = svhn lsunr
        ood_methods = iws elbo
        """))
    flt, options = read_filter_file(str(ini))
    # sections OR'd
    assert flt({'type': 'cvae', 'set': 'cifar10'})
    assert flt({'type': 'vae', 'set': 'mnist'})
    assert not flt({'type': 'cvae', 'set': 'mnist'})
    assert options['cifar10 ood'] == 'svhn lsunr'
    assert options['ood_methods'] == 'iws elbo'


MODELS = [
    {'job': 1, 'type': 'cvae', 'set': 'mnist', 'arch_code': 'aaaa',
     'sigma_train': 'constant', 'beta': 1.0, 'gamma': 0.0, 'latent_dim': 8,
     'accuracy': 0.9, 'accuracy_esty': 0.9, 'accuracy_iws': 0.85,
     'done': 5, 'mse': 0.01, 'dB': 20.0,
     'ood_fashion_auc': 0.95, 'ood_fashion_method': 'iws',
     'ood_fashion_fpr95': 0.2,
     'ood_fashion_iws_auc': 0.95, 'ood_fashion_iws_fpr95': 0.2,
     'ood_fashion_elbo_auc': 0.91, 'ood_fashion_elbo_fpr95': 0.3},
]


def test_results_dataframe_method_expansion():
    first = results_dataframe(MODELS, ood_methods='first')
    assert ('auc', 'fashion') in first.columns
    assert not any(c[0] == 'auc' and '/' in c[1] for c in first.columns)
    full = results_dataframe(MODELS, ood_methods='all')
    assert ('auc', 'fashion/iws') in full.columns
    assert ('auc', 'fashion/elbo') in full.columns
    only = results_dataframe(MODELS, ood_methods=['elbo'])
    assert ('auc', 'fashion/elbo') in only.columns
    assert ('auc', 'fashion/iws') not in only.columns


def test_results_dataframe_measures_group():
    df = results_dataframe(MODELS, measures=True)
    assert ('measures', 'mse') in df.columns
    assert ('measures', 'dB') in df.columns
    assert ('measures', 'mse') not in results_dataframe(MODELS).columns


def test_ft_alias_flags_parse():
    from joint_vae_tpu.cli.ft import main
    with pytest.raises(SystemExit) as e:
        main(['5', '-J', '/nonexistent-jobs', '-N', '64', '-n', '32',
              '-S', '3', '-T', '1', '--sampling-task-shift', '2',
              '--prior', 'gaussian', '--prior-means', '8.0',
              '--tau', '10', '--wim-sets', 'fashion', '-j', '9',
              '--do-not-collect-jobs', '--padding', '--mix-padding'])
    assert 'not found' in str(e.value)


def test_ft_args_from_file(tmp_path):
    from joint_vae_tpu.cli.ft import main
    f = tmp_path / 'args.txt'
    f.write_text("# comment\n7 -J /nonexistent-jobs --alpha 0.5\n"
                 "8 -J /nonexistent-jobs\n")
    with pytest.raises(SystemExit) as e:
        main(['--args-from-file', str(f), '1'])
    assert 'job 8 not found' in str(e.value)


def test_sample_fleet_mode_and_aliases(tmp_path):
    from joint_vae_tpu.cli.sample import main
    # no job number + empty job dir: fleet mode over zero jobs
    assert main(['--job-dir', str(tmp_path), '--list-jobs-and-quit']) == 0
    assert main(['--job-dir', str(tmp_path), '--last', '3']) == 0
    with pytest.raises(SystemExit):
        main(['99', '--job-dir', str(tmp_path), '--grid-height', '4',
              '--sampling', '2', '-m', '32', '--bins', '10',
              '--directory', str(tmp_path / '%j'), '--seed'])


def test_cascade_flag_spellings(tmp_path):
    from joint_vae_tpu.cli.cascade import main
    with pytest.raises(SystemExit) as e:
        main(['--job-dir', str(tmp_path)])
    assert 'no jobs' in str(e.value)
    with pytest.raises(SystemExit) as e:
        main(['--jobs', '5', '6', '--job-dir', str(tmp_path),
              '--batch-size', '16', '--num-batch', '2', '--when', 'last'])
    assert 'not found' in str(e.value)


def test_results_multi_config_and_which(tmp_path):
    from joint_vae_tpu.cli.results import main
    ini = tmp_path / 'r.ini'
    ini.write_text('[empty-section]\ntype = cvae\n')
    # empty job dir -> no models -> rc 1, but parsing (multi-config,
    # --which, -q, --tpr, --register) must succeed
    rc = main([str(ini), str(ini), '--job-dir', str(tmp_path / 'jobs'),
               '--which', 'empty-section', '-q', '--tpr', '90',
               '--register', '--out-dir', str(tmp_path)])
    assert rc == 1


def test_predict_method_restriction():
    df = results_dataframe(MODELS, predict_methods='first')
    assert ('accuracy', 'best') in df.columns
    assert ('accuracy', 'esty') not in df.columns
    df2 = results_dataframe(MODELS, predict_methods=['esty'])
    assert ('accuracy', 'esty') in df2.columns
    assert ('accuracy', 'iws') not in df2.columns

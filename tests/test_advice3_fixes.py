"""Regressions for the round-2 advisor findings (ADVICE.md, all cli/test.py).

Covers: --sets routing through make_dict_from_model on the default path,
bare --tpr degrading to 95, --compute without --sets not restricting the
displayed OOD sets, saved .tab/.tex keeping all columns at -e 0, and
capitalized aliases (K/L) in filter INIs.
"""

import os

import pytest

pytestmark = pytest.mark.slow

TRAIN_ARGS = ['--dataset', 'mnist', '--type', 'cvae', '--epochs', '1',
              '--batch-size', '32', '--test-batch-size', '64',
              '-K', '8', '--encoder', '32', '--decoder', '32',
              '--classifier', '8', '--gamma', '100', '--sigma', '0.3',
              '--test-latent-sampling', '2', '--dataset-size', '96',
              '--validation', '32', '--oodsets', 'fashion', 'letters']


@pytest.fixture(scope='module')
def job_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp('jobs'))
    from joint_vae_tpu.cli.train import main
    assert main(TRAIN_ARGS + ['--job-dir', d]) == 0
    return d


@pytest.fixture
def capture_dicts(monkeypatch):
    """Record every make_dict_from_model call made by the test CLI."""
    import joint_vae_tpu.cli.test as T
    calls = []
    real = T.make_dict_from_model

    def spy(*a, **kw):
        calls.append(kw)
        return real(*a, **kw)

    monkeypatch.setattr(T, 'make_dict_from_model', spy)
    return calls


def test_sets_restriction_on_default_path(job_dir, capture_dicts, capsys):
    """--sets must route through make_dict_from_model(oodsets=...) even on
    the default no-compute path (ref test.py:193-198 applies oodsets to
    every kept model)."""
    from joint_vae_tpu.cli.test import main
    assert main(['--job-dir', job_dir, '--sets', 'mnist', 'fashion']) == 0
    assert capture_dicts, 'default path bypassed make_dict_from_model'
    assert all(kw.get('oodsets') == ['fashion'] for kw in capture_dicts)
    out = capsys.readouterr().out
    assert 'fashion' in out and 'letters' not in out


def test_bare_tpr_degrades_to_default(job_dir, capsys):
    """--tpr with no values (nargs='*') must not crash (ref test.py
    iterates the list and degrades gracefully)."""
    from joint_vae_tpu.cli.test import main
    assert main(['--job-dir', job_dir, '--tpr']) == 0
    assert 'fashion' in capsys.readouterr().out


def test_compute_without_sets_keeps_all_ood(job_dir, capture_dicts):
    """Under --compute with no --sets the engines default to same-size
    companions WITHOUT restricting the displayed sets: the reference
    passes oodsets_n=None when --sets is absent."""
    from joint_vae_tpu.cli.test import main
    assert main(['--job-dir', job_dir, '--compute']) == 0
    assert capture_dicts
    assert all(kw.get('oodsets') is None for kw in capture_dicts)


def test_saved_tab_keeps_all_columns(job_dir, tmp_path):
    """At the default -e 0 the saved .tab must still carry train/arch
    columns: the -e pruning is console-display only (ref test.py:390
    texifies the full frame vs display pruning at :468)."""
    from joint_vae_tpu.cli.test import main
    tab = str(tmp_path / 'out.tab')
    assert main(['--job-dir', job_dir, '--tab', tab]) == 0
    text = open(tab).read()
    assert 'optim' in text and 'upsampler' in text


def test_filter_ini_capitalized_aliases(tmp_path):
    """K / L in a filter INI resolve to latent_dim / latent_sampling
    (configparser must not lowercase them into dead keys)."""
    from joint_vae_tpu.cli.test import read_filter_file
    ini = tmp_path / 'f.ini'
    ini.write_text('[g]\nK = 8\nL = 2\n[options]\nood_methods = elbo\n')
    flt, options = read_filter_file(str(ini))
    assert options == {'ood_methods': 'elbo'}
    assert flt({'latent_dim': 8, 'latent_sampling': 2})
    assert not flt({'latent_dim': 16, 'latent_sampling': 2})

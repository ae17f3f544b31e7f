"""The reference's own results-table INIs are consumable as-is: filter-key
aliases (job_number, prior_distribution, sigma_train, optimizer, ...)
resolve through the key schema, and the comparison-mode table builds
(ref results/tabs/*.ini + utils/filters.ini [dest] section)."""

import os
import shutil

import pytest

pytestmark = pytest.mark.slow

from joint_vae_tpu.utils.filters import filters_from_dict

TRAIN_ARGS = ['--dataset', 'mnist', '--type', 'cvae', '--epochs', '1',
              '--batch-size', '32', '--test-batch-size', '64',
              '-K', '8', '--encoder', '32', '--decoder', '32',
              '--classifier', '8', '--gamma', '100', '--sigma', '0.5',
              '--test-latent-sampling', '2', '--dataset-size', '96',
              '--oodsets', 'const28', '--no-final-ood']


@pytest.fixture(scope='module')
def job_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp('jobs'))
    from joint_vae_tpu.cli.train import main
    assert main(TRAIN_ARGS + ['--job-dir', d]) == 0
    from joint_vae_tpu.cli.test import main as test_main
    assert test_main(['--job-dir', d, '--compute', 'hard',
                      '--sets', 'const28', '--ood-methods', 'iws']) == 0
    return d


def test_alias_keys_resolve():
    f = filters_from_dict({'job_number': '1...10', 'optimizer': 'adam',
                           'prior_distribution': 'gaussian',
                           'sigma_train': 'constant',
                           'encoder_forced_variance': '0'})
    m = {'job': 5, 'optim': 'adam', 'prior': 'gaussian',
         'sigma_train': 'constant', 'forced_var': 0.0}
    assert f(m)
    assert not f(dict(m, optim='sgd'))
    assert not f(dict(m, job=11))


def test_constant_sigma_filters_numerically(job_dir):
    from joint_vae_tpu.save_load.fetch import fetch_models
    models = fetch_models(job_dir, filter=filters_from_dict({'sigma': '0.5'}))
    assert len(models) == 1
    none = fetch_models(job_dir, filter=filters_from_dict({'sigma': '0.7'}))
    assert not none


def test_reference_ini_consumable(job_dir, tmp_path):
    """The verbatim reference INI parses and runs end-to-end (its filters
    match no sandbox job — the point is the grammar, not the rows)."""
    from joint_vae_tpu.cli.results import main
    out = str(tmp_path / 'out')
    rc = main([os.path.join('/root/reference/results/tabs',
                            'svhn-prior.ini'),
               '--job-dir', job_dir, '--out-dir', out])
    # rc 1 = parsed + ran but no fleet job matches its svhn filters
    # (this sandbox has none) — the grammar itself must not raise
    assert rc == 1


def test_adapted_reference_ini_builds_table(job_dir, tmp_path):
    """Same INI structure with filters matching the sandbox job: the
    comparison table must contain the job's OOD numbers."""
    ini = tmp_path / 'tab.ini'
    ini.write_text("""
[DEFAULT]
job_number = 1...10
done = 1...
dataset = mnist
sigma_train = constant
tpr = 95
ood = const28
ood_method = iws
acc_method = esty

[g-cvae]
prior_distribution = gaussian
type = cvae
""")
    from joint_vae_tpu.cli.results import main
    out = str(tmp_path / 'out')
    rc = main([str(ini), '--job-dir', job_dir, '--out-dir', out])
    assert rc == 0
    texs = [f for f in os.listdir(out) if f.endswith('.tex')]
    assert texs
    body = open(os.path.join(out, texs[0])).read()
    assert 'g-cvae' in body
    # a numeric cell made it in (auc or fpr percentage)
    import re
    assert re.search(r'\d+\.\d', body), body

"""Flat-dict key coverage against the reference's make_dict_from_model
(utils/save_load/dictify.py:474-876), executed as an oracle: every key the
reference emits must exist here under the same name, a schema alias, a
documented rename, or be a documented exclusion — and the config-derived
values must agree."""

import os
import sys
import tempfile

import pytest

pytestmark = pytest.mark.slow

import jax

from joint_vae_tpu.models.cvnet import CVNetConfig
from joint_vae_tpu.ops.priors import build_prior_config
from joint_vae_tpu.ops.sigma import SigmaConfig
from joint_vae_tpu.save_load.dictify import make_dict_from_model
from joint_vae_tpu.save_load.jobs import new_job
from joint_vae_tpu.train.optimizers import OptimizerConfig

torch = pytest.importorskip('torch')

# reference key -> our key (None = documented exclusion)
RENAMES = {
    'h/o': 'heldout',
    'latent_prior_init_means': 'prior_means',
    'latent_prior_means': 'learned_prior_means',
    'latent_prior_variance': 'prior_variance',
    'prior_distribution': 'prior',
    'encoder_forced_variance': 'forced_var',
    'activation_str': 'activation',
    'output_activation_str': 'output_activation',
    'wim_padding_str': 'wim_padding',
    'wim_padding_dataset': 'wim_sets',
    'wim_nsets': 'wim_sets',
    'wim_array_size': None,        # array-level aggregation metadata
    'wim_mix_padding': 'wim_padding',
    'net': None,                   # the live module object (we keep 'dir')
    'options': None,               # display-only option string
    'accuracies': 'accuracy',      # per-method dict -> accuracy_<m> columns
    'n_in_out': 'n_tested',
    'recorders': 'recorded_epoch',
    # history-derived metrics: emitted here once the history exists
    # (see test_results_layer history keys); same name, so only listed
    # for fresh-job tolerance below
}
HISTORY_KEYS = {'dB', 'rmse', 'kl', 'nll', 'test_loss', 'train_loss',
                'test_zdist', 'train_zdist', 'best_accuracy',
                # OOD summaries appear as ood_<set>_<method>_* columns
                # once detection rates exist
                'in_out_rate', 'in_out_rates'}


@pytest.fixture(scope='module')
def ref_dict():
    from test_evaluate_vs_reference import _stub_torchvision
    _stub_torchvision()
    sys.path.insert(0, '/root/reference')
    cwd = os.getcwd()
    os.chdir('/root/reference')
    try:
        from cvae import ClassificationVariationalNetwork as RefNet
        from utils.save_load import make_dict_from_model as ref_mdfm
        m = RefNet((3, 32, 32), 10, type='cvae', features='conv32',
                   upsampler='deconv32', encoder=[], latent_dim=64,
                   decoder=[], classifier=[], latent_sampling=1,
                   test_latent_sampling=16, sigma={'value': 0.1},
                   gamma=500.0,
                   prior={'distribution': 'gaussian', 'num_priors': 10,
                          'init_mean': 1.0, 'learned_means': True})
        m.training_parameters.update({
            'max_batch_sizes': {'train': 64, 'test': 64}, 'set': 'cifar10',
            'epochs': 10, 'batch_size': 64, 'full_test_every': 10,
            'data_augmentation': [], 'transformer': 'simple',
            'validation': 0, 'warmup': [0, 0], 'warmup_gamma': [0, 0],
            'pretrained_features': None, 'pretrained_upsampler': None,
            'fine_tuning': None, 'early-min-loss': None})
        m.is_resumed = False
        d = tempfile.mkdtemp()
        m.save(d)
        return ref_mdfm(m, d)
    finally:
        os.chdir(cwd)
        sys.path.remove('/root/reference')


@pytest.fixture(scope='module')
def our_dict():
    cfg = CVNetConfig(
        input_shape=(3, 32, 32), num_labels=10, type='cvae',
        features='conv32', upsampler='deconv32', encoder=(), decoder=(),
        classifier=(), latent_dim=64, latent_sampling=1,
        test_latent_sampling=16, gamma=500.0, sigma=SigmaConfig(value=0.1),
        prior=build_prior_config(64, 'gaussian', num_priors=10,
                                 init_mean=1.0, learned_means=True))
    job = new_job(cfg, OptimizerConfig(lr=1e-3), key=jax.random.PRNGKey(0))
    job.training_parameters.update({'set': 'cifar10', 'epochs': 10,
                                    'batch_size': 64})
    return make_dict_from_model(job, directory='/tmp/x')


def test_key_coverage(ref_dict, our_dict):
    missing = []
    for k in ref_dict:
        if k in HISTORY_KEYS:
            continue
        tgt = RENAMES.get(k, k)
        if tgt is None:
            continue
        if tgt not in our_dict:
            missing.append((k, tgt))
    assert not missing, missing


def test_config_values_agree(ref_dict, our_dict):
    for k in ('type', 'K', 'L', 'gamma', 'beta', 'features', 'upsampler',
              'batch_norm', 'output_distribution', 'done', 'epochs',
              'finished', 'set', 'optim', 'lr', 'validation',
              'learned_prior_means', 'train_batch_size', 'depth', 'width'):
        assert k in ref_dict and k in our_dict, k
        want, got = ref_dict[k], our_dict[k]
        if k in ('depth', 'width'):
            # documented deviation (PARITY.md): the reference's ternary
            # precedence makes these 0 without a linear classifier
            continue
        if k == 'batch_norm':
            want = want or 'none'          # we normalize False -> 'none'
        assert got == want, (k, got, want)
    assert our_dict['l'] == ref_dict['l'] == 16
    assert our_dict['sigma'] == pytest.approx(float(ref_dict['sigma']))
    assert our_dict['prior'] == ref_dict['prior_distribution']

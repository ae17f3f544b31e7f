"""Regression tests for the round-3 review batch (importer/exporter/CLI).

- --scan batch isolation: a corrupt job is counted failed, the rest of the
  batch still converts (cli/__init__.py convert_job_batch).
- _map_conv_group rejects partial maps: BatchNorm/dense underflow raises
  instead of leaving fresh-init leaves (import_reference.py).
"""

import json
import os

import numpy as np
import pytest

from joint_vae_tpu.save_load.import_reference import (map_reference_state,
                                                      ImportError_)

MINIMAL_ARCH = {
    'input_shape': [1, 8, 8], 'num_labels': 4, 'type': 'vae',
    'encoder': [8], 'decoder': [8], 'classifier': [], 'latent_dim': 4,
    'latent_sampling': 1, 'test_latent_sampling': 2, 'beta': 0.0,
    'gamma': 0.0, 'output_activation': 'sigmoid',
    'prior': {'distribution': 'gaussian', 'dim': 4, 'num_priors': 1,
              'var_dim': 'scalar', 'init_mean': 0.0},
}


def test_import_scan_isolates_corrupt_jobs(tmp_path, capsys):
    """One corrupt job in a --scan tree must not abort the batch; the good
    job still imports and the summary reports 1 imported, 1 failed."""
    good = tmp_path / 'root' / 'mnist' / 'arch' / 'opt' / '3'
    good.mkdir(parents=True)
    (good / 'params.json').write_text(json.dumps(MINIMAL_ARCH))
    bad = tmp_path / 'root' / 'mnist' / 'arch' / 'opt' / '2'
    bad.mkdir(parents=True)
    (bad / 'params.json').write_text('{ this is not json')

    from joint_vae_tpu.cli.import_ref import main
    jobs = str(tmp_path / 'jobs')
    rc = main(['--scan', str(tmp_path / 'root'), '--job-dir', jobs,
               '--platform', 'cpu'])
    out = capsys.readouterr().out
    assert '1 imported, 1 failed' in out
    # partial failure exits nonzero so scripted conversions can't silently
    # lose jobs (round-3 advisor finding; the good job still imported)
    assert rc == 1
    assert os.path.exists(os.path.join(jobs, 'mnist', 'arch', 'opt', '3',
                                       'params.json'))
    assert not os.path.exists(os.path.join(jobs, 'mnist', 'arch', 'opt',
                                           '2', 'params.json'))


def test_map_conv_group_rejects_bn_underflow():
    """A torch conv stack with fewer BatchNorms than ours must fail loudly
    (a partial map would silently keep fresh-init bn leaves)."""
    params = {'features_stack': {
        'conv_0': {'kernel': np.zeros((3, 3, 1, 8), np.float32),
                   'bias': np.zeros((8,), np.float32)},
        'bn_0': {'scale': np.ones((8,), np.float32),
                 'bias': np.zeros((8,), np.float32)}}}
    stats = {'features_stack': {'bn_0': {'mean': np.zeros((8,), np.float32),
                                         'var': np.ones((8,), np.float32)}}}
    sd = {'features.0.weight': np.zeros((8, 1, 3, 3), np.float32),
          'features.0.bias': np.zeros((8,), np.float32)}
    with pytest.raises(ImportError_, match='batch-norm'):
        map_reference_state(sd, params, stats)


def test_map_conv_group_rejects_missing_dense():
    """An upsampler whose torch side lacks the latent-expansion Linear must
    fail loudly, not keep the random dense init."""
    params = {'imager': {
        'dense': {'kernel': np.zeros((4, 16), np.float32),
                  'bias': np.zeros((16,), np.float32)},
        'deconv_0': {'kernel': np.zeros((3, 3, 1, 1), np.float32),
                     'bias': np.zeros((1,), np.float32)}}}
    sd = {'imager.0.weight': np.zeros((1, 1, 3, 3), np.float32),
          'imager.0.bias': np.zeros((1,), np.float32)}
    with pytest.raises(ImportError_, match='dense'):
        map_reference_state(sd, params, None)

"""scripts/reproduce_sota.py end-to-end in fixture mode: tiny datasets in
the real on-disk formats (cifar pickle, svhn .mat, exported lsun folders),
[tilted]-config pretrain, one WIM fine-tune per OOD set, table emission
(round-2 verdict item 5; ref results/tabs/sota.csv:1-5, config.ini [tilted],
results/tabs/wim/wim-vae.ini)."""

import csv
import json
import os

import pytest

pytestmark = pytest.mark.slow

import joint_vae_tpu.data.loaders as loaders


def test_reproduce_sota_fixture_mode(tmp_path):
    from scripts.reproduce_sota import main

    old_dir, old_env = loaders.DATA_DIR, os.environ.get('JVT_DATA_DIR')
    out = str(tmp_path / 'sota')
    try:
        rc = main(['--fixtures', str(tmp_path / 'fx'), '--out', out])
        assert rc == 0
    finally:
        loaders.DATA_DIR = old_dir
        if old_env is None:
            os.environ.pop('JVT_DATA_DIR', None)
        else:
            os.environ['JVT_DATA_DIR'] = old_env
        loaders._cache.clear()

    with open(os.path.join(out, 'sota_native.csv')) as f:
        rows = list(csv.reader(f))
    assert [r[0] for r in rows] == ['set', 'method', 'measures',
                                    'vae (published)', 'vae (this run)']
    assert rows[0][1:] == ['lsunr'] * 6 + ['svhn'] * 6
    assert rows[1][1:] == ['ratio', 'ratio', 'regret', 'regret',
                           'wim-vae', 'wim-vae'] * 2
    # the published row carries the reference's numbers verbatim
    assert rows[3][5] == '94.1' and rows[3][11] == '99.1'
    # our wim-vae auc/fpr cells are real numbers in [0, 100]
    ours = rows[4]
    for i in (5, 6, 11, 12):
        assert 0.0 <= float(ours[i]) <= 100.0
    # literature-method cells stay empty in our row
    assert all(ours[i] == '' for i in (1, 2, 3, 4, 7, 8, 9, 10))

    with open(os.path.join(out, 'sota_native.json')) as f:
        rep = json.load(f)
    for s in ('lsunr', 'svhn'):
        assert set(rep['post'][s]) == {'elbo', 'elbo@', 'zdist', 'zdist@',
                                       'kl'}
        for r in rep['post'][s].values():
            assert 0.0 <= r['auc'] <= 100.0 and 0.0 <= r['fpr95'] <= 100.0
    # pipeline artifacts: pretrained job + one WIM job dir per set
    assert os.path.isdir(os.path.join(out, 'pretrained'))
    assert os.path.isdir(os.path.join(out, 'wim-lsunr'))
    assert os.path.isdir(os.path.join(out, 'wim-svhn'))

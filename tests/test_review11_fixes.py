"""Regressions for the eleventh code-review batch (cli/utils/save_load).

Covers: resume honoring the job's saved transformer/augmentation, empty
warmup specs, grid '|' zip syntax, the classif_type filter key, INI
classes_from_file resolution, the recorder tmp-name not matching the
record pattern, atomic job numbering, and --epoch/--epoch-tolerance
actually selecting results.
"""

import os
import tempfile
import threading

import numpy as np
import pytest

pytestmark = pytest.mark.slow


# -- train CLI: resume adopts the saved transformer -------------------------


def test_resume_uses_saved_transformer(tmp_path):
    from joint_vae_tpu.cli.train import main
    jd = str(tmp_path / 'jobs')
    args = ['--dataset', 'mnist', '--type', 'vae', '--epochs', '1',
            '--encoder', '8', '--decoder', '8', '-K', '4',
            '--batch-size', '32', '--test-batch-size', '64',
            '--dataset-size', '64', '--latent-sampling', '1',
            '--full-test-every', '99', '--ood-detection-every', '99',
            '--job-dir', jd]
    assert main(args + ['--transformer', 'pad']) == 0
    # resume WITHOUT --transformer: must pick up 'pad' (36x36 inputs) from
    # the job instead of crashing on 32x32 'default' data
    assert main(['--resume', '1', '--epochs', '2', '--dataset-size', '64',
                 '--batch-size', '32', '--test-batch-size', '64',
                 '--full-test-every', '99', '--ood-detection-every', '99',
                 '--job-dir', jd]) == 0


def test_empty_warmup_spec():
    from joint_vae_tpu.cli.train import main
    with tempfile.TemporaryDirectory() as d:
        rc = main(['--dataset', 'mnist', '--type', 'vae', '--epochs', '1',
                   '--encoder', '8', '--decoder', '8', '-K', '4',
                   '--batch-size', '32', '--test-batch-size', '64',
                   '--dataset-size', '64', '--warmup',
                   '--full-test-every', '99', '--ood-detection-every', '99',
                   '--job-dir', os.path.join(d, 'jobs')])
        assert rc == 0


# -- grid zip syntax ----------------------------------------------------------


def test_grid_zip_syntax():
    from joint_vae_tpu.cli.grid import expand_grid
    argvs = expand_grid({'dataset': 'mnist', 'beta': '1e-4|1e-3',
                         'lr': '1e-3|1e-4', 'latent_dim': '8 16'})
    # 2 zip groups x 2 swept values = 4 commands
    assert len(argvs) == 4
    pairs = {(a[a.index('--beta') + 1], a[a.index('--lr') + 1])
             for a in argvs}
    assert pairs == {('1e-4', '1e-3'), ('1e-3', '1e-4')}
    with pytest.raises(ValueError):
        expand_grid({'beta': '1|2', 'lr': '1|2|3'})


# -- filters: classif_type is its own key ------------------------------------


def test_classif_type_filter_key():
    from joint_vae_tpu.utils.filters import filters_from_dict
    flt = filters_from_dict({'classif_type': 'linear'})
    assert flt({'classif_type': 'linear', 'classifier': '36'})
    assert not flt({'classif_type': 'softmax', 'classifier': 'linear'})
    flt2 = filters_from_dict({'classifier': '36'})
    assert flt2({'classif_type': 'linear', 'classifier': '36'})


# -- registry: classes_from_file resolved + blank-line guarded ---------------


def test_registry_ini_classes_from_file(tmp_path, monkeypatch):
    cls_file = tmp_path / 'cls.txt'
    cls_file.write_text('n01 dog_breed\nn02 cat\n\n')   # trailing blank line
    ini = tmp_path / 'sets.ini'
    ini.write_text('[tiny]\nshape = 3 8 8\n'
                   'classes_from_file = cls.txt\n')
    monkeypatch.setenv('JVT_DATA_DIR', str(tmp_path))
    from joint_vae_tpu.data.registry import load_registry_ini
    props = load_registry_ini(str(ini))
    assert props['tiny']['classes'] == ['dog breed', 'cat']


# -- recorder tmp file never matches the record pattern ----------------------


def test_recorder_tmp_not_collected(tmp_path, monkeypatch):
    from joint_vae_tpu.save_load.recorders import LossRecorder
    monkeypatch.setenv('JVT_RECORDER_FORMAT', 'npz')
    r = LossRecorder(4)
    r.append_batch(a=np.ones((1, 4)))
    p = str(tmp_path / 'record-x.npz')
    r.save(p)
    # simulate an orphaned crash-time tmp of the new naming
    open(str(tmp_path / '.record-y.npz.tmp.npz'), 'wb').write(b'garbage')
    recs = LossRecorder.loadall(str(tmp_path))
    assert set(recs) == {'x'}
    # and no tmp residue from the successful save
    assert sorted(os.listdir(tmp_path)) == ['.record-y.npz.tmp.npz',
                                            'record-x.npz']


# -- atomic job numbering -----------------------------------------------------


def test_next_job_number_concurrent(tmp_path):
    from joint_vae_tpu.utils.parameters import next_job_number
    jd = str(tmp_path / 'jobs')
    got = []
    lock = threading.Lock()

    def take():
        n = next_job_number(jd)
        with lock:
            got.append(n)

    threads = [threading.Thread(target=take) for _ in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert sorted(got) == list(range(1, 17)), got


# -- --epoch / --epoch-tolerance select stored results ------------------------


def test_make_dict_epoch_tolerance():
    import jax

    from joint_vae_tpu.models.cvnet import CVNetConfig
    from joint_vae_tpu.ops.priors import PriorConfig
    from joint_vae_tpu.ops.sigma import SigmaConfig
    from joint_vae_tpu.save_load.dictify import make_dict_from_model
    from joint_vae_tpu.save_load.jobs import new_job
    from joint_vae_tpu.train.optimizers import OptimizerConfig

    cfg = CVNetConfig(input_shape=(1, 8, 8), num_labels=3, type='cvae',
                      encoder=(8,), decoder=(8,), latent_dim=4,
                      sigma=SigmaConfig(value=0.3),
                      prior=PriorConfig(dim=4, num_priors=3))
    job = new_job(cfg, OptimizerConfig(lr=1e-3), key=jax.random.PRNGKey(0))
    job.testing = {10: {'esty': {'accuracy': 0.9, 'n': 10}},
                   30: {'esty': {'accuracy': 0.5, 'n': 10}}}
    d = make_dict_from_model(job, directory='/tmp/x', wanted_epoch=12,
                             epoch_tolerance=5)
    assert d.get('accuracy_epoch') == 10
    d2 = make_dict_from_model(job, directory='/tmp/x', wanted_epoch=20,
                              epoch_tolerance=5)
    assert 'accuracy_epoch' not in d2       # nothing within tolerance
    d3 = make_dict_from_model(job, directory='/tmp/x', wanted_epoch=20)
    assert d3.get('accuracy_epoch') in (10, 30)   # unbounded default

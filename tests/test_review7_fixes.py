"""Regressions for the seventh code-review batch.

Covers: explicitly-empty method flags mean 'skip' (not 'all'), distinct
combo join letters for the non-reference ensemble methods, the recorder
format-twin cleanup after a folding save, grid repeat=0 erroring loudly,
and the trainer pinpointing the first non-finite batch inside a batched
metrics flush.
"""

import os
import tempfile

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from joint_vae_tpu.data.loaders import ArrayDataset
from joint_vae_tpu.models.cvnet import CVNetConfig
from joint_vae_tpu.ops.priors import PriorConfig
from joint_vae_tpu.ops.sigma import SigmaConfig
from joint_vae_tpu.save_load.jobs import new_job
from joint_vae_tpu.save_load.recorders import LossRecorder, find_record
from joint_vae_tpu.train.optimizers import OptimizerConfig

INPUT_SHAPE = (1, 6, 6)
C = 3


def _dataset(name='d', n=32, seed=0):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, C, n).astype(np.int32)
    x = rng.uniform(0, 1, (n, *INPUT_SHAPE)).astype(np.float32)
    return ArrayDataset(x, y, name)


def _job():
    import jax
    cfg = CVNetConfig(input_shape=INPUT_SHAPE, num_labels=C, type='cvae',
                      encoder=(8,), decoder=(8,), classifier=(4,),
                      latent_dim=4, latent_sampling=1, test_latent_sampling=2,
                      gamma=10.0, beta=1e-2, sigma=SigmaConfig(value=0.3),
                      prior=PriorConfig(dim=4, num_priors=C))
    return new_job(cfg, OptimizerConfig(lr=1e-3), key=jax.random.PRNGKey(0))


# -- empty method lists skip the pass entirely ----------------------------


def test_empty_method_lists_are_none_not_all():
    from joint_vae_tpu.evals.engines import (accuracy, ood_detection_rates)
    job = _job()
    ds = _dataset()
    assert accuracy(job, ds, method=[]) == {}
    assert ood_detection_rates(job, ds, [], method=[]) == {}


def test_cli_methods_flag_semantics():
    """--predict-methods with zero values parses to [], absent to None."""
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument('--predict-methods', nargs='*', default=None)
    assert p.parse_args([]).predict_methods is None
    assert p.parse_args(['--predict-methods']).predict_methods == []


# -- combo join letters are unique per method ------------------------------


def test_combo_letters_unique():
    import inspect
    import joint_vae_tpu.cli.aggregate as agg
    src = inspect.getsource(agg)
    # the letter map literal: parse it out and assert injectivity
    import re
    m = re.search(r"letter = ({[^}]*})", src)
    assert m, 'letter map not found'
    letter = eval(m.group(1))
    assert len(set(letter.values())) == len(letter), letter


# -- recorder twin cleanup after a folding save ----------------------------


def test_save_recorder_removes_superseded_twin():
    from joint_vae_tpu.evals.engines import _save_recorder
    with tempfile.TemporaryDirectory() as d:
        r1 = LossRecorder(4)
        r1.append_batch(a=np.ones((1, 4)), b=np.zeros((1, 4)))
        npz = os.path.join(d, 'record-x.npz')
        r1.save(npz)

        r2 = LossRecorder(4)
        r2.append_batch(a=2 * np.ones((1, 4)))
        jvr = os.path.join(d, 'record-x.jvr')
        _save_recorder(r2, jvr)

        # old-only key folded in, stale twin removed, find_record unambiguous
        assert not os.path.exists(npz)
        assert find_record(d, 'x') == jvr
        back = LossRecorder.load(jvr)
        assert set(back.keys()) == {'a', 'b'}
        np.testing.assert_array_equal(back.get('a'), 2 * np.ones((1, 4)))


def test_save_recorder_keeps_bigger_old_file():
    from joint_vae_tpu.evals.engines import _save_recorder
    with tempfile.TemporaryDirectory() as d:
        big = LossRecorder(4)
        big.append_batch(a=np.ones((1, 4)))
        big.append_batch(a=np.ones((1, 4)))
        npz = os.path.join(d, 'record-x.npz')
        big.save(npz)

        small = LossRecorder(4)
        small.append_batch(a=np.zeros((1, 4)))
        _save_recorder(small, os.path.join(d, 'record-x.jvr'))
        # refused: old npz holds more samples and must survive
        assert os.path.exists(npz)
        assert not os.path.exists(os.path.join(d, 'record-x.jvr'))


# -- grid repeat=0 errors instead of silently expanding to nothing ---------


def test_grid_repeat_zero_raises():
    from joint_vae_tpu.cli.grid import expand_grid
    with pytest.raises(ValueError):
        expand_grid({'dataset': 'mnist', 'repeat': '0'})
    assert len(expand_grid({'dataset': 'mnist', 'repeat': '2'})) == 2


# -- trainer flags the first bad batch in a batched flush ------------------


def test_trainer_derailed_reports_first_bad_batch(caplog, tmp_path):
    import logging

    import jax

    from joint_vae_tpu.train.trainer import train_model

    job = _job()
    # poison the params so the loss is non-finite from batch 0
    job.state = job.state.replace(params=jax.tree_util.tree_map(
        lambda a: a * np.nan, job.state.params))
    ds = _dataset(n=64)
    with caplog.at_level(logging.ERROR):
        train_model(job, ds, epochs=1, batch_size=8,
                    save_dir=str(tmp_path), metrics_every=4)
    msgs = [r.getMessage() for r in caplog.records
            if 'non-finite' in r.getMessage()]
    assert msgs, 'derailment not logged'
    assert 'batch 0' in msgs[0], msgs
    assert os.path.exists(os.path.join(tmp_path, 'derailed'))

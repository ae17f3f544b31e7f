"""True multi-process jax.distributed execution (VERDICT r3 item 1).

Spawns 2 real Python processes (2 virtual CPU devices each, localhost
coordinator) that train one job over a cross-process 4-device
('data' x 'model'=2) mesh via ``train_model``, write a sharded checkpoint
(per-process shard files, host-0 JSONs), then compares against the SAME
training run in this process on a single-process 4-device mesh:

- the loss trajectory must match (the aligned loader reproduces the exact
  single-process data order; only collective reduction order may differ),
- the restored params from the 2-process sharded checkpoint must match the
  single-process run's, and must restore onto a different mesh shape.

This is the one multi-chip correctness axis the 8-virtual-device dryrun
cannot cover: process-boundary sharding, host-0-only writes, coordinator
setup (parallel/mesh.py::distributed_init, sharded_data.py,
sharded_checkpoint.py).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(('localhost', 0))
        return s.getsockname()[1]


def _spawn_workers(n, outdir, timeout=600, mode='train'):
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items()
           if k not in ('PALLAS_AXON_POOL_IPS', 'JAX_PLATFORMS', 'XLA_FLAGS')}
    env.update(JAX_PLATFORMS='cpu',
               XLA_FLAGS='--xla_force_host_platform_device_count=2',
               PYTHONPATH=REPO + os.pathsep + env.get('PYTHONPATH', ''))
    # workers inherit JAX_COMPILATION_CACHE_DIR, which conftest.py now
    # fingerprints per host CPU type — same-machine runs stay warm while a
    # foreign machine's AOT entries (which SIGILLed a worker once) can
    # never be served
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(HERE, 'mp_worker.py'),
         str(i), str(n), port, outdir, mode],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(n)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, 'worker {} failed:\n{}'.format(i, out)
    return outs


@pytest.fixture(scope='module')
def mp_run(tmp_path_factory):
    outdir = str(tmp_path_factory.mktemp('mp'))
    _spawn_workers(2, outdir)
    return outdir


def _single_process_run(tmp_path, epochs=2, n_devices=4):
    from joint_vae_tpu.parallel.mesh import make_mesh
    from tests.mp_worker import make_job, train_with_eval

    job = make_job()
    mesh = make_mesh(n_devices, model_axis=2)
    train_with_eval(job, mesh, str(tmp_path), epochs)
    return job


@pytest.fixture(scope='module')
def sp(tmp_path_factory):
    """ONE single-process reference run shared by every comparison test
    (several tests compare against the identical 4-device config —
    rerunning it per test multiplies a multi-minute cost on the 1-core
    host).  -> (job, outdir)."""
    d = str(tmp_path_factory.mktemp('sp'))
    return _single_process_run(d), d


@pytest.fixture(scope='module')
def sp_job(sp):
    return sp[0]


def test_multiprocess_trajectory_matches_single_process(mp_run, sp_job):
    with open(os.path.join(mp_run, 'traj.json')) as f:
        mp_traj = json.load(f)
    job = sp_job
    for e in (1, 2):
        sp = job.train_history[e]['train_loss']
        mp = mp_traj[str(e)]
        assert set(sp) == set(mp)
        for k in sp:
            np.testing.assert_allclose(mp[k], sp[k], rtol=1e-5, err_msg=k)


def test_multiprocess_checkpoint_is_sharded_and_restores(mp_run, sp_job):
    """The 2-process job dir has host-0 JSONs + one shard file per process;
    it restores in THIS (single) process onto a different mesh and matches
    the single-process run's params."""
    from joint_vae_tpu.save_load.checkpoint import flatten_pytree
    from joint_vae_tpu.save_load.jobs import load_job
    from joint_vae_tpu.save_load.sharded_checkpoint import (
        is_sharded_checkpoint, load_checkpoint_sharded)

    job_dir = os.path.join(mp_run, 'job')
    for stem in ('state', 'optimizer'):
        d = os.path.join(job_dir, stem + '.shards')
        assert is_sharded_checkpoint(d), d
        for p in range(2):
            assert os.path.exists(os.path.join(d, 'shard-%d.npz' % p))
    # stitched arrays == single-process run's state (same data order, same
    # init; collective order may round differently in the last ulp)
    arrays = load_checkpoint_sharded(os.path.join(job_dir, 'state.shards'))
    ref = flatten_pytree(sp_job.state.params)
    for k, v in ref.items():
        got = arrays['params/' + k]
        np.testing.assert_allclose(got, v, rtol=3e-5, atol=1e-7, err_msg=k)

    # restore-on-different-mesh: plain load_job + pure-DP continuation
    job2 = load_job(job_dir)
    assert job2.trained == 2
    import jax
    from joint_vae_tpu.parallel.mesh import make_mesh
    from joint_vae_tpu.train.trainer import train_model
    from joint_vae_tpu.utils.print_log import EpochOutput
    from tests.mp_worker import make_dataset
    train_model(job2, make_dataset(), None, None, epochs=3, batch_size=16,
                final_test=False, final_ood=False,
                outputs=EpochOutput(stdout=False), mesh=make_mesh(8))
    assert job2.trained == 3
    assert np.isfinite(job2.train_history[3]['train_loss']['total'])


def test_multiprocess_in_training_eval_matches(mp_run, sp_job):
    """The full production loop under 2 processes — in-training validation
    losses, per-epoch test accuracy and OOD AUCs — matches the
    single-process run (same data order, same rng folds; only collective
    reduction order differs, so counts may flip by at most a sample)."""
    from tests.mp_worker import eval_summary
    with open(os.path.join(mp_run, 'results.json')) as f:
        mp_res = json.load(f)
    sp = eval_summary(sp_job)
    for e, vl in sp['validation'].items():
        if vl is None:
            continue
        for k, v in vl.items():
            np.testing.assert_allclose(mp_res['validation'][e][k], v,
                                       rtol=1e-4, err_msg='val ' + k)
    # the loss comparison above is the bit-level correctness anchor;
    # accuracy/AUC are rank statistics of a 2-epoch near-chance model whose
    # per-class scores are nearly tied, so ulp-level collective reduction
    # differences legitimately flip argmaxes — loose bounds only catch
    # structural bugs (wrong data order / sharding / rng)
    for e, accs in sp['testing'].items():
        for m, a in accs.items():
            assert abs(mp_res['testing'][e][m] - a) <= 0.1, \
                (e, m, mp_res['testing'][e][m], a)
    assert sp['ood'], 'single-process run produced no OOD results'
    for e, sets in sp['ood'].items():
        for s, ms in sets.items():
            for m, auc in ms.items():
                assert abs(mp_res['ood'][e][s][m] - auc) <= 0.06, \
                    (e, s, m, mp_res['ood'][e][s][m], auc)


def test_four_process_trajectory_matches(tmp_path):
    """4 processes x 2 devices: the ('data'=4 x 'model'=2) mesh spans three
    process boundaries; the trajectory still matches a single-process run
    on the same 8-device mesh shape (the aligned loader's data order is
    mesh- and process-count-independent)."""
    outdir = str(tmp_path / 'mp4')
    os.makedirs(outdir)
    _spawn_workers(4, outdir)
    with open(os.path.join(outdir, 'traj.json')) as f:
        mp_traj = json.load(f)
    job = _single_process_run(tmp_path, n_devices=8)
    for e in (1, 2):
        sp = job.train_history[e]['train_loss']
        for k in sp:
            np.testing.assert_allclose(mp_traj[str(e)][k], sp[k],
                                       rtol=1e-5, err_msg=k)
    d = os.path.join(outdir, 'job', 'state.shards')
    for p in range(4):
        assert os.path.exists(os.path.join(d, 'shard-%d.npz' % p))


def test_multiprocess_json_written_once(mp_run):
    """history.json exists exactly once (host 0), valid JSON with 2 epochs."""
    p = os.path.join(mp_run, 'job', 'history.json')
    assert os.path.exists(p)
    with open(p) as f:
        hist = json.load(f)
    assert hist['epochs'] == 2


def _load_records(job_dir):
    """{relpath: {key: array}} for every record-*.{jvr,npz} under samples/."""
    from joint_vae_tpu.save_load.recorders import LossRecorder
    out = {}
    sroot = os.path.join(job_dir, 'samples')
    for dirpath, _, files in os.walk(sroot):
        for f in sorted(files):
            if f.startswith('record-'):
                rec = LossRecorder.load(os.path.join(dirpath, f))
                rel = os.path.relpath(os.path.join(dirpath, f), sroot)
                out[rel] = {k: rec.get(k) for k in rec.keys()}
    return out


def _assert_records_match(mp_recs, sp_recs):
    assert mp_recs, 'multi-process run wrote no record files'
    assert set(mp_recs) == set(sp_recs), (set(mp_recs), set(sp_recs))
    for rel, tensors in sp_recs.items():
        got = mp_recs[rel]
        assert set(got) == set(tensors), (rel, set(got), set(tensors))
        for k, v in tensors.items():
            if np.issubdtype(np.asarray(v).dtype, np.integer):
                np.testing.assert_array_equal(got[k], v,
                                              err_msg='{}/{}'.format(rel, k))
            else:
                np.testing.assert_allclose(got[k], v, rtol=2e-4, atol=1e-5,
                                           err_msg='{}/{}'.format(rel, k))


def test_multiprocess_recorders_match_single_process(mp_run, sp):
    """VERDICT r4 item 3: recorder CAPTURE stays on under multi-process —
    host 0 writes the same samples/<epoch>/record-* files (same sets, same
    keys, same tensors to reduction-order tolerance) a single-process run
    leaves, keeping the post-hoc tiers alive for pod runs."""
    _, sp_dir = sp
    _assert_records_match(_load_records(os.path.join(mp_run, 'job')),
                          _load_records(os.path.join(sp_dir, 'job')))


@pytest.mark.parametrize('n', [2, 4])
def test_multiprocess_wim_matches_single_process(tmp_path, n):
    """n-process WIM fine-tuning + Poscod over a cross-process
    ('data' x 'model'=2) mesh bit-matches the same finetune() on a
    single-process mesh of the same shape (VERDICT r4 item 1's tolerance
    regime): final params, OOD AUCs of the WIM score grammar, the poscod
    head/llr scores, and the record files under samples/."""
    from joint_vae_tpu.parallel.mesh import make_mesh
    from tests.mp_worker import make_job, run_wim

    outdir = str(tmp_path / 'mp')
    os.makedirs(outdir)
    _spawn_workers(n, outdir, mode='wim')
    with open(os.path.join(outdir, 'wim.json')) as f:
        mp_res = json.load(f)

    sp_dir = str(tmp_path / 'sp')
    os.makedirs(sp_dir)
    sp_res = run_wim(make_job(), make_mesh(2 * n, model_axis=2), sp_dir)

    assert sp_res['ood'], 'single-process WIM produced no OOD results'
    for s, ms in sp_res['ood'].items():
        for m, auc in ms.items():
            assert abs(mp_res['ood'][s][m] - auc) <= 5e-3, \
                (s, m, mp_res['ood'][s][m], auc)
    for k, v in sp_res['params_head'].items():
        np.testing.assert_allclose(mp_res['params_head'][k], v,
                                   rtol=3e-5, atol=1e-7, err_msg=k)
    np.testing.assert_allclose(mp_res['poscod_w'], sp_res['poscod_w'],
                               rtol=3e-5, atol=1e-7, err_msg='poscod head')
    np.testing.assert_allclose(mp_res['poscod_llr'], sp_res['poscod_llr'],
                               rtol=3e-5, atol=1e-6, err_msg='poscod llr')
    # host-0 artifacts: wim prior + init/post records match single-process
    assert os.path.exists(os.path.join(outdir, 'wimjob', 'wim_prior.npz'))
    _assert_records_match(_load_records(os.path.join(outdir, 'wimjob')),
                          _load_records(os.path.join(sp_dir, 'wimjob')))

"""Array aggregation, scheduler, poscod head tests."""

import pytest

pytestmark = pytest.mark.slow

import os
import tempfile
import threading
import time

import numpy as np
import jax

from joint_vae_tpu.data.loaders import ArrayDataset
from joint_vae_tpu.ft.array import WIMArray
from joint_vae_tpu.ft.poscod import PoscodJob
from joint_vae_tpu.ft.scheduler import Scheduler
from joint_vae_tpu.models.cvnet import CVNetConfig
from joint_vae_tpu.ops.sigma import SigmaConfig
from joint_vae_tpu.save_load.jobs import new_job
from joint_vae_tpu.save_load.recorders import LossRecorder

RNG = np.random.default_rng(3)


def test_scheduler_serializes():
    with tempfile.TemporaryDirectory() as d:
        order = []
        s0 = Scheduler(d, seed=1, task=0, poll=0.02)
        s1 = Scheduler(d, seed=1, task=1, poll=0.02)
        s1.register()
        s0.register()

        def run1():
            s1.wait_for_turn(timeout=5)
            order.append(1)
            s1.done()

        t = threading.Thread(target=run1)
        t.start()
        time.sleep(0.1)
        assert order == []          # task 1 blocked on task 0's sentinel
        order.append(0)
        s0.done()
        t.join(timeout=5)
        assert order == [0, 1]


def _fake_wim_job_dir(d, n=40, seed=0):
    """A job dir with samples/0001/record-{ind,ood}.npz of wim losses."""
    rng = np.random.default_rng(seed)
    sd = os.path.join(d, 'samples', '0001')
    for name, shift in (('blobs', 2.0), ('noise', 0.0)):
        rec = LossRecorder(n)
        C = 3
        base = {k: rng.normal(size=(C, n)).astype(np.float32) + shift
                for k in ('total', 'kl', 'zdist', 'iws')}
        base.update({k + '@': rng.normal(size=(n,)).astype(np.float32)
                     for k in ('total', 'kl', 'zdist', 'iws')})
        base['logits'] = rng.normal(size=(C, n)).astype(np.float32)
        base['y_true'] = rng.integers(0, C, n).astype(np.int32)
        rec.append_batch(**base)
        rec.save(os.path.join(sd, 'record-{}.npz'.format(name)))


def test_wim_array_merge_and_rates():
    cfg = CVNetConfig(input_shape=(1, 6, 6), num_labels=3, type='cvae',
                      encoder=(16,), decoder=(16,), classifier=(8,),
                      latent_dim=4, latent_sampling=1, gamma=10.0,
                      sigma=SigmaConfig(value=0.3))
    from joint_vae_tpu.ft.wim import WIMJob
    job = new_job(cfg, key=jax.random.PRNGKey(0))
    wim = WIMJob(job=job)
    wim.set_alternate_prior(init_mean=8.0, num_priors=1)

    with tempfile.TemporaryDirectory() as root:
        j1, j2 = os.path.join(root, 'j1'), os.path.join(root, 'j2')
        _fake_wim_job_dir(j1, seed=1)
        _fake_wim_job_dir(j2, seed=2)
        arr = WIMArray(os.path.join(root, 'array'))
        arr.register_jobs(j1, j2)
        assert len(arr.registered_jobs()) == 2
        arr.register_jobs(j1)  # dedup
        assert len(arr.registered_jobs()) == 2

        merged = arr.merge_recorders('blobs')
        assert merged.recorded_samples == 80

        res = arr.recompute_rates(wim, 'blobs', ['noise'],
                                  methods=['elbo', 'zdist~', 'elbo@'])
        assert 'noise' in res
        assert res['noise']['elbo']['n'] == 80
        assert 0 <= res['noise']['zdist~']['auc'] <= 1
        assert os.path.exists(os.path.join(root, 'array', 'ood.json'))


def test_poscod_head_learns_separation():
    cfg = CVNetConfig(input_shape=(1, 6, 6), num_labels=3, type='vae',
                      encoder=(16,), decoder=(16,), latent_dim=4,
                      latent_sampling=1, sigma=SigmaConfig(value=0.3))
    job = new_job(cfg, key=jax.random.PRNGKey(0))
    n = 128
    ind = ArrayDataset(np.clip(
        0.3 + 0.05 * RNG.standard_normal((n, 1, 6, 6)), 0, 1
    ).astype(np.float32), np.zeros(n, np.int32), 'ind')
    mov = ArrayDataset(RNG.uniform(0.6, 1.0, (n, 1, 6, 6)).astype(np.float32),
                       np.zeros(n, np.int32), 'mov')
    pc = PoscodJob(job=job).finetune(ind, mov, epochs=20, batch_size=64)
    s_ind = pc.llr_scores(ind)
    s_mov = pc.llr_scores(mov)
    from joint_vae_tpu.ops.roc import auroc_one_sided_exact
    import jax.numpy as jnp
    auc = float(auroc_one_sided_exact(jnp.asarray(s_ind), jnp.asarray(s_mov)))
    assert auc > 0.8, auc

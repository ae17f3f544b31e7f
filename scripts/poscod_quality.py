#!/usr/bin/env python
"""Poscod mechanism study: does the frozen-net llr head actually detect OOD?

WIM earned three quality studies (docs/WIM_QUALITY/WIM_STUDY/WIM_INVERSION);
this gives poscod (ft/poscod.py, ref ft/poscod.py:11-207) the same evidence
tier.  Recipe mirrors scripts/wim_study.py: pretrain one VAE on shapes32
minus two heldout shapes, then train the single-logit llr head (net frozen,
ind=1 vs moving=0) under different moving-set compositions and measure llr
AUROC on three OOD families against the pretrained net's own best scores:

- shapes32+8+9  (heldout shapes — NEAR OOD; seen only by condition C)
- uniform32     (noise — seen by A)
- const32       (constant color — FAR OOD, never in any moving set)

Conditions: A noise-moving, B noise+ind 50/50 (label-noise control: half
the '0' labels are actually ind), C heldout-moving (oracle upper bound),
D far-moving (const).  Writes docs/POSCOD_QUALITY.json.

Run on the real TPU: python scripts/poscod_quality.py (~6 min).
CPU smoke: JVT_POSCOD_EPOCHS=1 JVT_POSCOD_TRAIN_SIZE=1024
JVT_POSCOD_FT_SIZE=512 JVT_POSCOD_EVAL_SIZE=256 JVT_POSCOD_FT_EPOCHS=1.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

from joint_vae_tpu.data.loaders import get_dataset
from joint_vae_tpu.evals.engines import ood_detection_rates
from joint_vae_tpu.ft.datasets import MixtureDataset
from joint_vae_tpu.ft.poscod import PoscodJob
from joint_vae_tpu.models.cvnet import CVNetConfig
from joint_vae_tpu.ops.priors import PriorConfig
from joint_vae_tpu.ops.sigma import SigmaConfig
from joint_vae_tpu.save_load.jobs import new_job
from joint_vae_tpu.train.device_data import train_epochs_on_device
from joint_vae_tpu.train.optimizers import OptimizerConfig


def auroc(ind_scores: np.ndarray, ood_scores: np.ndarray) -> float:
    """AUROC that ind scores rank above ood scores (Mann-Whitney U with
    tie handling via average ranks)."""
    x = np.concatenate([ind_scores, ood_scores]).astype(np.float64)
    order = np.argsort(x, kind='mergesort')
    ranks = np.empty_like(x)
    ranks[order] = np.arange(1, len(x) + 1)
    # average ranks over ties
    vals, inv, counts = np.unique(x, return_inverse=True, return_counts=True)
    if len(vals) != len(x):
        cum = np.cumsum(counts)
        avg = (cum - (counts - 1) / 2.0)
        ranks = avg[inv]
    n_i, n_o = len(ind_scores), len(ood_scores)
    u = ranks[:n_i].sum() - n_i * (n_i + 1) / 2.0
    return float(u / (n_i * n_o))


def main():
    t0 = time.time()
    epochs = int(os.environ.get('JVT_POSCOD_EPOCHS', 20))
    ft_size = int(os.environ.get('JVT_POSCOD_FT_SIZE', 8192))
    ev_size = int(os.environ.get('JVT_POSCOD_EVAL_SIZE', 4000))
    ft_epochs = int(os.environ.get('JVT_POSCOD_FT_EPOCHS', 5))
    ind_name = 'shapes32-8-9'
    tr, te = get_dataset(ind_name)
    tr_size = int(os.environ.get('JVT_POSCOD_TRAIN_SIZE', 0))
    if tr_size:                       # CPU smoke: cap the pretrain set
        tr = tr.subset(np.arange(min(tr_size, len(tr))))
    near = get_dataset('shapes32+8+9', splits=['test'], size=ev_size)[1]
    noise = get_dataset('uniform32', splits=['test'], size=ev_size)[1]
    far = get_dataset('const32', splits=['test'], size=ev_size)[1]
    sets = {'near': near, 'noise': noise, 'far': far}

    cfg = CVNetConfig(
        input_shape=(3, 32, 32), num_labels=8, type='vae',
        features='conv32', upsampler='deconv32',
        encoder=(512,), decoder=(512,), latent_dim=64,
        latent_sampling=1, test_latent_sampling=16, gamma=0.0, beta=0.05,
        sigma=SigmaConfig(value=0.2), prior=PriorConfig(dim=64))
    job = new_job(cfg, OptimizerConfig(lr=3e-4), key=jax.random.PRNGKey(0))
    job.training_parameters['set'] = ind_name
    train_epochs_on_device(job, tr, epochs=epochs, batch_size=256,
                           log_every=10)
    print('pretrained in {:.0f}s'.format(time.time() - t0), flush=True)

    pre = ood_detection_rates(job, te, list(sets.values()), batch_size=512,
                              method=['elbo', 'iws', 'zdist', 'kl'],
                              update_self_ood=False, recording=False)
    pre_best = {}
    for label, ds in sets.items():
        ms = pre[ds.name]
        pre_best[label] = max((round(v['auc'], 4), m) for m, v in ms.items())
    print('pre best:', pre_best, flush=True)

    ind_ft = tr.subset(np.arange(min(ft_size, len(tr))))

    def moving(mix_named):
        kw = {'noise': noise, 'ind': te, 'near': near, 'far': far}
        return MixtureDataset(mix=mix_named, length=ft_size,
                              **{k: kw[k] for k in mix_named})

    conditions = [
        ('A noise-moving', {'noise': 1.0}),
        ('B noise+ind-mixed', {'noise': 0.5, 'ind': 0.5}),
        ('C heldout-moving (oracle)', {'near': 1.0}),
        ('D far-moving', {'far': 1.0}),
    ]

    results = {}
    for name, mix in conditions:
        t1 = time.time()
        pc = PoscodJob(job=job)      # net frozen by construction: only the
        pc.finetune(ind_ft, moving(mix),   # head trains (ft/poscod.py)
                    epochs=ft_epochs, batch_size=128, seed=3)
        ind_scores = pc.llr_scores(te)
        row = {}
        for label, ds in sets.items():
            row[label] = round(auroc(ind_scores, pc.llr_scores(ds)), 4)
        print('{:28s} ({:.0f}s): {}'.format(name, time.time() - t1, row),
              flush=True)
        results[name] = {'mix': mix, 'llr_auroc': row}

    report = {
        'setting': '{} vae beta=0.05 K=64, {} pretrain epochs; llr head '
                   '{} epochs on ind({}) vs moving({})'.format(
                       ind_name, epochs, ft_epochs, len(ind_ft), ft_size),
        'ood_sets': {'near (seen only by C)': 'shapes32+8+9',
                     'noise (seen by A/B)': 'uniform32',
                     'far (seen only by D)': 'const32'},
        'pre_best_auroc': {k: {'auc': v[0], 'method': v[1]}
                           for k, v in pre_best.items()},
        'conditions': results,
        'seconds': round(time.time() - t0, 1),
        'backend': jax.default_backend(),
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'docs',
        os.environ.get('JVT_POSCOD_OUT', 'POSCOD_QUALITY.json'))
    with open(out, 'w') as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    return 0


if __name__ == '__main__':
    sys.exit(main())

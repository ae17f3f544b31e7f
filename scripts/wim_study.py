#!/usr/bin/env python
"""WIM mechanism study on TPU: moving-set composition x OOD transfer.

The WIM paper's claim (reference ft/wim.py, results/tabs/sota.csv) is that
fine-tuning against an *agnostic* moving set (generic noise or a mixture)
improves OOD detection — including on OOD families never seen during the
fine-tune.  This study pretrains one VAE on shapes32 minus two heldout
shape classes, snapshots it, then fine-tunes the SAME snapshot under
different moving-set compositions and alphas, measuring post AUROC on:

- shapes32+8+9  (heldout shapes — NEAR OOD, unseen except in condition D)
- uniform32     (noise — seen by the uniform conditions)
- const32       (constant color — FAR OOD, never in any moving set)

Conditions: A uniform-pure, B uniform+ind mixed 50/50, C ind-only
(control: no OOD signal, should not help), D heldout-pure (oracle upper
bound), plus an alpha sweep on A.  Writes docs/WIM_STUDY.json.

Run on the real TPU: python scripts/wim_study.py (~10 min).
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from joint_vae_tpu.data.loaders import get_dataset
from joint_vae_tpu.evals.engines import ood_detection_rates
from joint_vae_tpu.ft.datasets import MixtureDataset
from joint_vae_tpu.ft.job import finetune
from joint_vae_tpu.ft.wim import WIMJob
from joint_vae_tpu.models.cvnet import CVNetConfig
from joint_vae_tpu.ops.priors import PriorConfig
from joint_vae_tpu.ops.sigma import SigmaConfig
from joint_vae_tpu.save_load.jobs import load_job, new_job, save_job
from joint_vae_tpu.train.device_data import train_epochs_on_device
from joint_vae_tpu.train.optimizers import OptimizerConfig

METHODS = ['elbo', 'elbo@', 'zdist', 'zdist@', 'kl']


def main():
    t0 = time.time()
    epochs = int(os.environ.get('JVT_WIM_EPOCHS', 20))
    ft_size = int(os.environ.get('JVT_WIM_FT_SIZE', 20000))
    ev_size = int(os.environ.get('JVT_WIM_EVAL_SIZE', 4000))
    ind_name = 'shapes32-8-9'
    tr, te = get_dataset(ind_name)
    near = get_dataset('shapes32+8+9', splits=['test'], size=ev_size)[1]
    noise = get_dataset('uniform32', splits=['test'], size=ev_size)[1]
    far = get_dataset('const32', splits=['test'], size=ev_size)[1]
    oodsets = [near, noise, far]

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

    pre = ood_detection_rates(job, te, oodsets, batch_size=512,
                              method=['elbo', 'iws', 'zdist', 'kl'],
                              update_self_ood=False, recording=False)
    print('pre :', {s: max((round(v['auc'], 3), m) for m, v in ms.items())
                    for s, ms in pre.items()}, flush=True)

    snap = tempfile.mkdtemp(prefix='wim-study-')
    save_job(job, snap)

    def moving(mix_named):
        parts = {}
        kw = {}
        if 'noise' in mix_named:
            parts['noise'] = mix_named['noise']
            kw['noise'] = noise
        if 'ind' in mix_named:
            parts['ind'] = mix_named['ind']
            kw['ind'] = te
        if 'near' in mix_named:
            parts['near'] = mix_named['near']
            kw['near'] = near
        return MixtureDataset(mix=parts, length=512, **kw)

    ft_epochs = int(os.environ.get('JVT_WIM_FT_EPOCHS', 1))
    alpha0 = float(os.environ.get('JVT_WIM_ALPHA', 0.3))
    conditions = [
        ('A uniform-pure',  {'noise': 1.0},             alpha0),
        ('B uniform-mixed', {'noise': 0.5, 'ind': 0.5}, alpha0),
        ('C ind-control',   {'ind': 1.0},               alpha0),
        ('D heldout-pure',  {'near': 1.0},              alpha0),
    ]
    if os.environ.get('JVT_WIM_ALPHA_SWEEP', '1') == '1':
        conditions += [('A+ uniform alpha1', {'noise': 1.0}, 1.0),
                       ('A- uniform alpha.1', {'noise': 1.0}, 0.1)]

    results = {}
    for name, mix_named, alpha in conditions:
        t1 = time.time()
        j = load_job(snap)
        j.training_parameters['set'] = ind_name
        wim = WIMJob(job=j)
        wim.set_alternate_prior(init_mean=6.0, num_priors=1,
                                key=jax.random.PRNGKey(7))
        finetune(wim, tr, moving(mix_named), te, oodsets,
                 epochs=ft_epochs, alpha=alpha, train_size=ft_size,
                 batch_size=128, test_batch_size=512, ood_methods=METHODS,
                 seed=0)
        post = j.ood_results[j.trained]
        row = {s: {m: round(v['auc'], 4) for m, v in ms.items()}
               for s, ms in post.items()}
        best = {s: max((v['auc'], m) for m, v in ms.items())
                for s, ms in post.items()}
        print('{:22s} ({:.0f}s): {}'.format(
            name, time.time() - t1,
            {s: (round(a, 3), m) for s, (a, m) in best.items()}), flush=True)
        results[name] = {'mix': mix_named, 'alpha': alpha, 'auroc': row}

    report = {
        'setting': '{} vae beta=0.05 K=64, {} pretrain epochs; '
                   '{} ft epoch(s), moving length 512'.format(
                       ind_name, epochs, ft_epochs),
        'ood_sets': {'near (unseen unless D)': 'shapes32+8+9',
                     'noise (seen by A/B)': 'uniform32',
                     'far (never seen)': 'const32'},
        'pre_auroc': {s: {m: round(v['auc'], 4) for m, v in ms.items()}
                      for s, ms in pre.items()},
        'conditions': results,
        'seconds': round(time.time() - t0, 1),
        'backend': jax.default_backend(),
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'docs',
        os.environ.get('JVT_WIM_OUT', 'WIM_STUDY.json'))
    with open(out, 'w') as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    return 0


if __name__ == '__main__':
    sys.exit(main())

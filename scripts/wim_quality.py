#!/usr/bin/env python
"""WIM quality experiment on TPU: train a plain VAE on shapes32, then run
the WIM alternate-prior flow against a uniform-noise moving set and compare
pre/post OOD AUROC (the reference's headline mechanism,
results/tabs/sota.csv).  Writes docs/WIM_QUALITY.json."""

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
from joint_vae_tpu.ft.job import finetune
from joint_vae_tpu.ft.wim import WIMJob
from joint_vae_tpu.models.cvnet import CVNetConfig
from joint_vae_tpu.ops.priors import PriorConfig
from joint_vae_tpu.ops.sigma import SigmaConfig
from joint_vae_tpu.save_load.jobs import new_job
from joint_vae_tpu.train.device_data import train_epochs_on_device
from joint_vae_tpu.train.optimizers import OptimizerConfig


def main():
    t0 = time.time()
    epochs = int(os.environ.get('JVT_WIM_EPOCHS', 20))
    ind_name = os.environ.get('JVT_WIM_IND', 'shapes32')
    ood_names = os.environ.get('JVT_WIM_OOD', 'uniform32,const32').split(',')
    tr, te = get_dataset(ind_name)
    oods = [get_dataset(n, splits=['test'], size=4000)[1] for n in ood_names]
    ood, ood2 = oods[0], (oods[1] if len(oods) > 1 else oods[0])

    # plain VAE (the WIM paper setting), tilted-prior style operating point
    cfg = CVNetConfig(
        input_shape=(3, 32, 32), num_labels=10, type='vae',
        features='conv32', upsampler='deconv32',
        encoder=(512,), decoder=(512,), latent_dim=64,
        latent_sampling=1, test_latent_sampling=16, gamma=0.0, beta=0.05,
        sigma=SigmaConfig(value=0.2),
        prior=PriorConfig(dim=64))
    job = new_job(cfg, OptimizerConfig(lr=3e-4), key=jax.random.PRNGKey(0))
    job.training_parameters['set'] = ind_name
    train_epochs_on_device(job, tr, epochs=epochs, batch_size=256,
                           log_every=10)
    print('pretrained in {:.0f}s'.format(time.time() - t0), flush=True)

    pre = ood_detection_rates(job, te, [ood, ood2], batch_size=512,
                              method=['elbo', 'iws', 'zdist', 'kl'],
                              update_self_ood=False, recording=False)
    pre_best = {s: max((v['auc'], m) for m, v in ms.items())
                for s, ms in pre.items()}
    print('pre :', pre_best, flush=True)

    wim = WIMJob(job=job)
    wim.set_alternate_prior(init_mean=6.0, num_priors=1,
                            key=jax.random.PRNGKey(7))
    mix = float(os.environ.get('JVT_WIM_MIX', 1.0))   # ood fraction
    moving = MixtureDataset(mix={'ood': mix, 'ind': 1.0 - mix}, length=512,
                            ood=ood, ind=te)
    finetune(wim, tr, moving, te, [ood, ood2],
             epochs=int(os.environ.get('JVT_WIM_FT_EPOCHS', 1)),
             alpha=float(os.environ.get('JVT_WIM_ALPHA', 0.3)),
             train_size=20000, batch_size=128, test_batch_size=512,
             ood_methods=['elbo', 'elbo@', 'zdist', 'zdist@', 'kl'],
             seed=0)
    post = job.ood_results[job.trained]
    post_best = {s: max((v['auc'], m) for m, v in ms.items())
                 for s, ms in post.items()}
    print('post:', post_best, flush=True)

    report = {
        'dataset': '{} vae (beta=0.05), ood={}'.format(ind_name, ood_names),
        'epochs': epochs,
        'pre_auroc': {s: {m: round(v['auc'], 4) for m, v in ms.items()}
                      for s, ms in pre.items()},
        'post_auroc': {s: {m: round(v['auc'], 4) for m, v in ms.items()}
                       for s, ms in post.items()},
        'seconds': round(time.time() - t0, 1),
        'backend': jax.default_backend(),
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'docs', 'WIM_QUALITY.json')
    with open(out, 'w') as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    return 0


if __name__ == '__main__':
    sys.exit(main())

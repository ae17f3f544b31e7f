#!/usr/bin/env python
"""Quality run: train the conv CVAE properly on the procedural shapes32 set
(the sandbox has no real image data), then measure classification accuracy,
OOD detection and the WIM flow — evidence that the full pipeline learns,
not just runs.  Results printed as JSON and written to docs/QUALITY.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from joint_vae_tpu.data.loaders import get_dataset
from joint_vae_tpu.evals.engines import accuracy, ood_detection_rates
from joint_vae_tpu.models.cvnet import CVNetConfig
from joint_vae_tpu.ops.priors import PriorConfig
from joint_vae_tpu.ops.sigma import SigmaConfig
from joint_vae_tpu.save_load.jobs import new_job
from joint_vae_tpu.train.device_data import train_epochs_on_device
from joint_vae_tpu.train.optimizers import OptimizerConfig


def main():
    epochs = int(os.environ.get('JVT_QUALITY_EPOCHS', 30))
    t0 = time.time()
    tr, te = get_dataset('shapes32')
    print('train {} test {}'.format(len(tr), len(te)), flush=True)

    beta = float(os.environ.get('JVT_QUALITY_BETA', 0.03))
    init_mean = float(os.environ.get('JVT_QUALITY_MEAN', 3.0))
    cfg = CVNetConfig(
        input_shape=(3, 32, 32), num_labels=10, type='cvae',
        features='conv32', upsampler='deconv32',
        encoder=(512,), decoder=(512,), classifier=(),
        latent_dim=64, latent_sampling=1, test_latent_sampling=16,
        gamma=500.0, beta=beta, sigma=SigmaConfig(value=0.15),
        prior=PriorConfig(dim=64, num_priors=10, init_mean=init_mean,
                          learned_means=True))
    job = new_job(cfg, OptimizerConfig(lr=3e-4), key=jax.random.PRNGKey(0))
    job.training_parameters['set'] = 'shapes32'

    last = train_epochs_on_device(job, tr, epochs=epochs, batch_size=256,
                                  warmup=(0, 5), log_every=5)
    t_train = time.time() - t0
    print('trained {} epochs in {:.1f}s'.format(epochs, t_train), flush=True)

    acc = accuracy(job, te, batch_size=512, recording=False)
    print('accuracy:', acc, flush=True)

    oods = []
    for n in ('uniform32', 'const32'):
        _, s = get_dataset(n, splits=['test'], size=4000)
        oods.append(s)
    res = ood_detection_rates(job, te, oods, batch_size=512,
                              method=['iws', 'elbo', 'iws-2s', 'elbo-2s',
                                      'zdist', 'soft'],
                              recording=False)
    best = {s: max((v['auc'], m) for m, v in ms.items())
            for s, ms in res.items()}
    print('ood best:', best, flush=True)

    report = {
        'dataset': 'shapes32 (procedural, 10 classes)',
        'epochs': epochs,
        'train_seconds': round(t_train, 1),
        'final_train': {k: round(float(v), 4) for k, v in last.items()
                        if k in ('total', 'cross_y', 'mse', 'kl')},
        'accuracy': {m: round(v, 4) for m, v in acc.items()},
        'ood_auroc_best': {s: {'auc': round(a, 4), 'method': m}
                           for s, (a, m) in best.items()},
        'backend': jax.default_backend(),
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'docs', 'QUALITY.json')
    with open(out, 'w') as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    return 0


if __name__ == '__main__':
    sys.exit(main())

#!/usr/bin/env python
"""Why does plain `kl` beat the WIM LLR (`elbo@`/`zdist@`) on shapes32?
(round-2 verdict item 4; reference headline method ref ft/wim.py:132-201,
results/tabs/sota.csv wim-vae column.)

The LLR score k@ = sign*k(original prior) - sign*k(alternate prior)
subtracts two discriminators.  This study decomposes it for two pretrain
prior families x two WIM operating points:

  families — 'gaussian': the WIM_QUALITY.json benchmark config (where
  tests/test_wim_llr_identity.py proves kl@ == zdist@ == elbo@ exactly, so
  there is only ONE LLR method); 'tilted': the reference's sota.csv
  headline operating point (ref config.ini [tilted]: tilted prior, forced
  encoder variance 1.0, sigma 0.7071, beta 1, tau/init_mean scaled from
  K=100's 25 to K=64's 20; alternate prior = tilted mean-0 same-tau, ref
  config.ini [wim-default] prior_means=0/tau), where the LLR scores
  genuinely decouple;

  operating points — A: the reference's (mix 0.5, alpha 0.3, 1 ft epoch)
  and B: the strong dose WIM_QUALITY.json was measured at (pure-OOD moving
  set, alpha 1.0, 8 ft epochs).

Reported per score k in {elbo, zdist, kl}:

    auc_plain  AUROC of the original-prior score alone (higher = ind)
    auc_alt    AUROC of the alternate-prior twin alone (same orientation)
    auc_llr    AUROC of the difference (the k@ method)
    r_ind/r_ood  Pearson correlation of the two components per population

If auc_alt > 0.5 with the same orientation (the fine-tuned encoder sends
OOD toward the alternate prior, but the ORIGINAL score already separates),
the subtraction cancels shared signal and auc_llr < auc_plain — the
inversion is an operating-point effect, not a scoring bug.

Run on the TPU: python scripts/wim_inversion_study.py  (~10 min)
Writes docs/WIM_INVERSION.json.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def rank_auc(pos, neg):
    """P(pos > neg) + 0.5 P(pos == neg) via ranks (ind = positive)."""
    pos, neg = np.asarray(pos, np.float64), np.asarray(neg, np.float64)
    allv = np.concatenate([pos, neg])
    order = np.argsort(allv, kind='mergesort')
    ranks = np.empty(len(allv))
    ranks[order] = np.arange(1, len(allv) + 1)
    # midranks for ties
    sv = allv[order]
    i = 0
    while i < len(sv):
        j = i
        while j + 1 < len(sv) and sv[j + 1] == sv[i]:
            j += 1
        if j > i:
            ranks[order[i:j + 1]] = 0.5 * (i + j) + 1
        i = j + 1
    rp = ranks[:len(pos)].sum()
    return float((rp - len(pos) * (len(pos) + 1) / 2)
                 / (len(pos) * len(neg)))


def collect_twins(wim, dataset, batch_size=512, L=16, seed=0):
    """Per-input losses on both priors over a dataset -> {k: np(N,)}."""
    import jax
    import jax.numpy as jnp
    state = wim.job.state
    variables = {'params': state.params}
    outs = []
    x = dataset.data
    for i in range(0, len(x), batch_size):
        xb = jnp.asarray(np.asarray(x[i:i + batch_size], np.float32))
        _, _, losses, _ = wim.evaluate_on_both_priors(
            variables, xb, rng=jax.random.fold_in(jax.random.PRNGKey(seed),
                                                  i),
            sigma_state=state.sigma_state, L=L)
        outs.append({k: np.asarray(v) for k, v in losses.items()
                     if np.asarray(v).ndim == 1})
    return {k: np.concatenate([o[k] for o in outs]) for k in outs[0]}


def decompose(ind, ood):
    """Per-score plain/alt/LLR AUROCs + component correlations."""
    from joint_vae_tpu.ft.wim import K_SIGN
    rows = {}
    for k in ('elbo', 'zdist', 'kl'):
        key = 'total' if k == 'elbo' else k
        sgn = K_SIGN[k] * (-1.0 if k == 'elbo' else 1.0)  # elbo = -total
        p_main = sgn * ind[key]
        n_main = sgn * ood[key]
        p_alt = sgn * ind[key + '@']
        n_alt = sgn * ood[key + '@']
        rows[k] = {
            'auc_plain': round(rank_auc(p_main, n_main), 4),
            'auc_alt': round(rank_auc(p_alt, n_alt), 4),
            'auc_llr': round(rank_auc(p_main - p_alt, n_main - n_alt), 4),
            'r_ind': round(float(np.corrcoef(p_main, p_alt)[0, 1]), 4),
            'r_ood': round(float(np.corrcoef(n_main, n_alt)[0, 1]), 4),
        }
    return rows


def main():
    t0 = time.time()
    import jax

    from joint_vae_tpu.data.loaders import get_dataset
    from joint_vae_tpu.ft.datasets import MixtureDataset
    from joint_vae_tpu.ft.job import finetune
    from joint_vae_tpu.ft.wim import WIMJob
    from joint_vae_tpu.models.cvnet import CVNetConfig
    from joint_vae_tpu.ops.priors import PriorConfig
    from joint_vae_tpu.ops.sigma import SigmaConfig
    from joint_vae_tpu.save_load.jobs import load_job, new_job, save_job
    from joint_vae_tpu.train.device_data import train_epochs_on_device
    from joint_vae_tpu.train.optimizers import OptimizerConfig
    from joint_vae_tpu.utils.print_log import EpochOutput

    smoke = bool(os.environ.get('JVT_WIM_SMOKE'))
    epochs = int(os.environ.get('JVT_WIM_EPOCHS', 1 if smoke else 20))
    ind_name = os.environ.get('JVT_WIM_IND', 'shapes32-8-9')
    ood_name = os.environ.get('JVT_WIM_OOD', 'shapes32+8+9')
    eval_n = int(os.environ.get('JVT_WIM_EVAL_N', 48 if smoke else 2000))
    tr, te = get_dataset(ind_name, size=512 if smoke else None)
    _, ood = get_dataset(ood_name, splits=['test'], size=eval_n)
    te_eval_idx = np.arange(min(len(te), eval_n))

    dtype = os.environ.get('JVT_WIM_DTYPE', 'bfloat16')
    common = dict(input_shape=(3, 32, 32), num_labels=10, type='vae',
                  features='conv32', upsampler='deconv32',
                  encoder=(512,), decoder=(512,), latent_dim=64,
                  latent_sampling=1, test_latent_sampling=16, gamma=0.0,
                  compute_dtype=dtype)
    families = {
        # the WIM_QUALITY.json benchmark config: LLRs provably collapse
        'gaussian': dict(
            cfg=CVNetConfig(beta=0.05, sigma=SigmaConfig(value=0.2),
                            prior=PriorConfig(dim=64), **common),
            alt=dict(init_mean=6.0, num_priors=1),
        ),
        # the reference sota.csv operating point (config.ini [tilted] +
        # [wim-default]), tau/init_mean rescaled 25 -> 20 for K=64
        'tilted': dict(
            cfg=CVNetConfig(beta=1.0, sigma=SigmaConfig(value=0.7071),
                            encoder_forced_variance=1.0,
                            prior=PriorConfig(dim=64, distribution='tilted',
                                              tau=20.0, init_mean=20.0),
                            **common),
            alt=dict(distribution='tilted', tau=20.0, init_mean=0.0,
                     num_priors=1),
        ),
    }
    if os.environ.get('JVT_WIM_FAMILIES'):
        keep = os.environ['JVT_WIM_FAMILIES'].split(',')
        families = {k: v for k, v in families.items() if k in keep}

    class _Slice:
        def __init__(self, ds, idx):
            self.data, self.name = np.asarray(ds.data)[idx], ds.name

        def __len__(self):
            return len(self.data)

    conditions = {
        'A_reference_point': dict(mix=0.5, alpha=0.3, ft_epochs=1),
        'B_strong_dose': dict(mix=1.0, alpha=1.0, ft_epochs=8),
    }
    train_size = int(os.environ.get('JVT_WIM_TRAIN_SIZE', 20000))
    if os.environ.get('JVT_WIM_SMOKE'):      # CPU smoke: tiny everything
        train_size = 128
        for c in conditions.values():
            c['ft_epochs'] = 1
    report = {'ind': ind_name, 'ood': ood_name, 'pretrain_epochs': epochs,
              'conditions': {}}
    for fam, f in families.items():
        job = new_job(f['cfg'], OptimizerConfig(lr=3e-4),
                      key=jax.random.PRNGKey(0))
        job.training_parameters['set'] = ind_name
        train_epochs_on_device(job, tr, epochs=epochs, batch_size=256,
                               log_every=10)
        print('{} pretrained at {:.0f}s'.format(fam, time.time() - t0),
              flush=True)
        snap = tempfile.mkdtemp(prefix='wim_inv_{}_'.format(fam))
        save_job(job, snap)
        for name, c in conditions.items():
            jb = load_job(snap)
            wim = WIMJob(job=jb)
            wim.set_alternate_prior(key=jax.random.PRNGKey(7), **f['alt'])
            moving = MixtureDataset(mix={'ood': c['mix'], 'ind': 1 - c['mix']},
                                    length=512, ood=ood, ind=te)
            finetune(wim, tr, moving, te, [ood], epochs=c['ft_epochs'],
                     alpha=c['alpha'], train_size=train_size,
                     batch_size=32 if smoke else 128,
                     moving_batch_size=4 if smoke else None,
                     test_batch_size=512,
                     ood_methods=['elbo', 'elbo@', 'zdist', 'zdist@', 'kl'],
                     seed=0, outputs=EpochOutput(stdout=False))
            ind_tw = collect_twins(wim, _Slice(te, te_eval_idx))
            ood_tw = collect_twins(wim, _Slice(ood, np.arange(len(ood))))
            rows = decompose(ind_tw, ood_tw)
            key = '{}/{}'.format(fam, name)
            report['conditions'][key] = {'operating_point': c, 'scores': rows}
            print(key, json.dumps(rows), flush=True)

    report['seconds'] = round(time.time() - t0, 1)
    report['backend'] = jax.default_backend()
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'docs', 'WIM_INVERSION.json')
    with open(out, 'w') as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    return 0


if __name__ == '__main__':
    sys.exit(main())

"""Flat model-summary dicts + the 3-tier available-results planner.

- :func:`make_dict_from_model` (ref utils/save_load/dictify.py:474-876):
  one flat dict per job with architecture / training / results keys — the
  rows of the fleet-query dataframes and the operands of ParamFilters.
- :func:`available_results` (ref dictify.py:215-382): for a wanted epoch
  (with tolerance) and method sets, what is available from three tiers —
  'json' (stored results), 'recorders' (recorded loss tensors, checked
  against :func:`needed_components`), 'compute' (re-run the model).
"""

import os
import zlib
from typing import Any, Dict, List, Optional, Sequence

from ..models.cvnet import METHODS_PARAMS
from ..ops.scores import develop_starred_methods, strip_roc_suffix
from .jobs import Job
from .recorders import LossRecorder


def needed_components(method: str) -> List[str]:
    """Which recorded loss keys a method needs (ref dictify.py:434-471)."""
    m = strip_roc_suffix(method)
    if m.endswith('~@') or m.endswith('@') or m.endswith('~'):
        base = m.rstrip('~@')
        base = base[4:] if base.startswith('soft') else base
        keys = ['kl']
        if base == 'elbo':
            keys += ['total', 'total@']
        else:
            keys += [base, base + '@'] if m.endswith('@') or m.endswith('~@') \
                else [base]
        return keys
    if m.startswith('odin'):
        return [m, 'logits']
    if m in ('baseline', 'logits', 'hyz') or m.startswith('baseline'):
        return ['logits']
    if m == 'elbo' or m in ('sum', 'max', 'mean', 'std', 'mag', 'nstd', 'IYx'):
        return ['total']
    if m == 'iws' or m.startswith('softiws'):
        return ['iws']
    if m in ('soft', 'softkl') or m.startswith('softkl'):
        return ['kl']
    if m.startswith('softzdist'):
        return ['zdist']
    if m == 'mse':
        return ['cross_x']
    if m == 'wmse':
        return ['wmse']
    if m in ('kl', 'zdist', 'total', 'cross_x', 'cross_y', 'var_kl'):
        return [m]
    # predict methods
    if m == 'esty':
        return ['logits']
    if m == 'loss':
        return ['total']
    if m == 'closest':
        return ['zdist']
    if m == 'already':
        return ['y_est_already']
    return [m]


def available_results(job: Job,
                      testset: Optional[str] = None,
                      oodsets: Optional[Sequence[str]] = None,
                      predict_methods='all',
                      ood_methods='all',
                      misclass_methods='all',
                      wanted_epoch='last',
                      epoch_tolerance: int = 5,
                      where: Sequence[str] = ('json', 'recorders', 'compute'),
                      ) -> Dict[int, Dict[str, dict]]:
    """-> {epoch: {set: {'json': {m: n}, 'recorders': {m: n},
    'compute': {m: n}, 'where': {tier: bool}}}} sorted by closeness to the
    wanted epoch (ref dictify.py:215-382)."""
    cfg = job.model_cfg
    if wanted_epoch == 'last':
        wanted_epoch = job.trained
    if testset is None:
        testset = job.training_parameters.get('set')
    if oodsets is None:
        from ..data.registry import get_same_size_by_name
        try:
            oodsets = get_same_size_by_name(testset)
        except Exception:
            oodsets = []

    pm = (cfg.predict_methods if predict_methods == 'all'
          else list(predict_methods))
    om = (develop_starred_methods(cfg.ood_methods, METHODS_PARAMS)
          if ood_methods == 'all' else list(ood_methods))
    mm = (develop_starred_methods(cfg.misclass_methods, METHODS_PARAMS)
          if misclass_methods == 'all' else list(misclass_methods))

    epochs = set()
    if isinstance(wanted_epoch, int):
        epochs.add(wanted_epoch)
    epochs |= {e for e in job.testing if isinstance(e, int)}
    epochs |= {e for e in job.ood_results if isinstance(e, int)}
    if job.saved_dir and os.path.isdir(os.path.join(job.saved_dir, 'samples')):
        for d in os.listdir(os.path.join(job.saved_dir, 'samples')):
            if d.isdigit():
                epochs.add(int(d))
    epochs = sorted(e for e in epochs
                    if abs(e - wanted_epoch) <= epoch_tolerance)
    epochs.sort(key=lambda e: (abs(e - wanted_epoch), -e))

    out: Dict[int, Dict[str, dict]] = {}
    for epoch in epochs:
        sets = {}
        sdir = (os.path.join(job.saved_dir, 'samples', '{:04d}'.format(epoch))
                if job.saved_dir else None)
        recorders = (LossRecorder.loadall(sdir, output='paths')
                     if sdir else {})
        for s in [testset] + list(oodsets or []):
            if s is None:
                continue
            avail = {'json': {}, 'recorders': {}, 'compute': {}}
            methods = om if s != testset else (om + pm + mm)
            json_src = (job.testing.get(epoch, {}) if s == testset
                        else job.ood_results.get(epoch, {}).get(s, {}))
            rec = None
            if s in recorders:
                rec = LossRecorder.load(recorders[s])
            for m in methods:
                r = json_src.get(m)
                avail['json'][m] = (r.get('n', 0) if isinstance(r, dict)
                                    else 0) if 'json' in where else 0
                n_rec = 0
                if rec is not None and 'recorders' in where:
                    if all(c in rec for c in needed_components(m)):
                        n_rec = rec.recorded_samples
                avail['recorders'][m] = n_rec
                avail['compute'][m] = (10 ** 9 if 'compute' in where
                                       and epoch == job.trained else 0)
            avail['where'] = {
                t: any(avail[t].values()) for t in ('json', 'recorders',
                                                    'compute')}
            sets[s] = avail
        out[epoch] = sets
    return out


def make_dict_from_model(job: Job, directory: Optional[str] = None,
                         wanted_epoch='last') -> Dict[str, Any]:
    """Flat ~summary dict per job (ref dictify.py:474-876)."""
    cfg = job.model_cfg
    tp = job.training_parameters
    opt = job.opt_cfg
    if wanted_epoch == 'last':
        wanted_epoch = job.trained

    arch_str = _arch_string(cfg)
    d = {
        'job': job.job_number,
        'dir': directory or job.saved_dir,
        'type': cfg.type,
        'set': tp.get('set'),
        'arch': arch_str,
        # stable digest: Python hash() is salted per process, which would
        # fragment groupby keys across sessions (ref uses hashlib, dictify.py)
        'arch_code': format(zlib.crc32(arch_str.encode()), 'x'),
        'features': cfg.features or 'none',
        'upsampler': cfg.upsampler or 'none',
        'encoder': '-'.join(map(str, cfg.encoder)),
        'decoder': '-'.join(map(str, cfg.decoder)),
        'classifier': '-'.join(map(str, cfg.classifier)) or 'none',
        'depth': cfg.depth,
        'width': cfg.width,
        'K': cfg.latent_dim,
        'latent_dim': cfg.latent_dim,
        'L': cfg.latent_sampling,
        'latent_sampling': cfg.latent_sampling,
        'test_latent_sampling': cfg.test_latent_sampling,
        'sigma': cfg.sigma_cfg.describe(),
        'sigma_train': ('rmse' if cfg.sigma_cfg.is_rmse else
                        ('learned' if cfg.sigma_cfg.learned else 'constant')),
        'beta': cfg.beta,
        'gamma': cfg.gamma,
        'prior': cfg.prior.distribution,
        'prior_means': cfg.prior.init_mean,
        'learned_prior_means': cfg.prior.learned_means,
        'tilted_tau': cfg.prior.tau if cfg.prior.distribution != 'gaussian'
                      else None,
        'forced_var': cfg.encoder_forced_variance,
        'output_distribution': cfg.output_distribution,
        'batch_norm': cfg.batch_norm or 'none',
        'activation': cfg.activation,
        'output_activation': cfg.output_activation,
        'optim': opt.optim_type,
        'lr': opt.lr,
        'lr_decay': opt.lr_decay,
        'grad_clipping': opt.grad_clipping,
        'batch_size': tp.get('batch_size'),
        'data_augmentation': '-'.join(tp.get('data_augmentation') or []) or 'none',
        'epochs': tp.get('epochs', 0),
        'done': job.trained,
        'trained': job.trained,
        'finished': job.trained >= (tp.get('epochs') or 0),
        'validation': tp.get('validation', 0),
        'wim': bool(tp.get('wim')),
        'wim_prior': (tp.get('wim') or {}).get('distribution'),
        'wim_mean': (tp.get('wim') or {}).get('init_mean'),
        'wim_alpha': None,
        'version': cfg.version,
    }
    for ft in tp.get('fine_tuning') or []:
        if isinstance(ft, dict) and ft.get('type') == 'wim':
            d['wim_alpha'] = ft.get('alpha')

    # accuracy summaries at the closest epoch
    epoch = _closest(job.testing, wanted_epoch)
    if epoch is not None:
        for m, r in job.testing[epoch].items():
            if isinstance(r, dict) and 'accuracy' in r:
                d['accuracy_{}'.format(m)] = r['accuracy']
        accs = [v for k, v in d.items() if k.startswith('accuracy_')]
        if accs:
            d['accuracy'] = max(accs)
            d['accuracy_epoch'] = epoch

    # ood summaries: best auc per set
    epoch = _closest(job.ood_results, wanted_epoch)
    if epoch is not None:
        for s, per_method in job.ood_results[epoch].items():
            aucs = {m: r.get('auc') for m, r in per_method.items()
                    if isinstance(r, dict) and r.get('auc') is not None}
            if aucs:
                best = max(aucs, key=aucs.get)
                d['ood_{}_auc'.format(s)] = aucs[best]
                d['ood_{}_method'.format(s)] = best
                r = per_method[best]
                if r.get('fpr') and r.get('tpr'):
                    # one column per kept-TPR grid point (fpr90..fpr99),
                    # selected per-table via the results INI `tpr` option
                    for t, f in zip(r['tpr'], r['fpr']):
                        tt = int(round(100 * t))
                        if abs(100 * t - tt) < 1e-6:
                            d['ood_{}_fpr{}'.format(s, tt)] = f
    return d


def _closest(results: Dict, wanted: int) -> Optional[int]:
    epochs = [e for e in results if isinstance(e, int) and results[e]]
    if not epochs:
        return None
    return min(epochs, key=lambda e: abs(e - wanted))


def _arch_string(cfg) -> str:
    """Compact architecture string used in job paths and summaries
    (the spirit of ref print_architecture)."""
    parts = [cfg.type]
    if cfg.features:
        parts.append(cfg.features)
    parts.append('e' + '-'.join(map(str, cfg.encoder)))
    parts.append('K{}'.format(cfg.latent_dim))
    if cfg.x_is_generated:
        parts.append('d' + '-'.join(map(str, cfg.decoder)))
        if cfg.upsampler:
            parts.append(cfg.upsampler)
    clf = '-'.join(map(str, cfg.classifier))
    if clf:
        parts.append('c' + clf)
    parts.append(cfg.prior.distribution)
    if cfg.prior.conditional:
        parts.append('cond')
    return '--'.join(parts)

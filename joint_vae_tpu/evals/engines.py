"""Accuracy / OOD / misclassification engines.

Re-designs of the reference's measurement loops:

- :func:`accuracy` (ref cvae.py:1187-1446): batched label-free evaluation,
  prediction per method, recorder capture, testing-results update.
- :func:`ood_detection_rates` (ref cvae.py:1455-1911): per-set score
  accumulation fully on device, ODIN grid for logit models, ROC per method
  with suffix-selected geometry, ood_results update with the reference's
  JSON schema {epochs, n, mean, std, auc, tpr, fpr, thresholds}.
- :func:`misclassification_detection_rates` (ref cvae.py:1913-2080):
  correct-vs-missed ROC per (predict method, misclass method) with
  precision/recall at kept TPRs.

Engines take a Job (model config + train state) and ArrayDatasets; they reuse
record files under ``samples/<epoch>/`` when present ('recorders' tier) and
recompute otherwise ('compute' tier).
"""

import logging
import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loaders import ArrayDataset, DataLoader, get_dataset
from ..models.cvnet import CVNet
from ..models.evaluate import evaluate
from ..ops.roc import roc_curve, two_sided_from_method, DEFAULT_KEPT_TPR
from ..ops.scores import (batch_dist_measures, develop_starred_methods,
                          predict_after_evaluate)
from ..save_load.jobs import Job
from ..save_load.recorders import LossRecorder
from .odin import make_odin_scores

KEPT_TPR = DEFAULT_KEPT_TPR


def _epoch_of(job: Job, epoch):
    return job.trained if epoch in (None, 'last') else int(epoch)


def _sample_dir(job: Job, epoch: int) -> Optional[str]:
    if not job.saved_dir:
        return None
    return os.path.join(job.saved_dir, 'samples', '{:04d}'.format(epoch))


def _make_eval_fn(model: CVNet, sigma_state, with_odin: bool,
                  methods: Sequence[str] = ()):
    """One jitted program per batch: evaluate (+ ODIN grid) + all score
    measures — scores stay on device, one host transfer per set.

    The ODIN pass is restricted to the (T, eps) pairs the requested methods
    actually need (the full reference grid is 10x21)."""
    methods = tuple(methods)
    odin = None
    if with_odin:
        temps, eps = set(), set()
        for m in methods:
            if m.startswith('odin-'):
                parts = m.split('-')
                temps.add(float(parts[1]))
                eps.add(float(parts[2]))
        odin = make_odin_scores(model,
                                temps=sorted(temps) or None,
                                eps_grid=sorted(eps) or None)

    @jax.jit
    def eval_batch(variables, x, key):
        out = evaluate(model, variables, x, None, rng=key,
                       sigma_state=sigma_state, train=False)
        losses = dict(out.losses)
        if odin is not None:
            losses.update(odin(variables, x, key))
        scores = (batch_dist_measures(model.cfg, out.logits, losses, methods)
                  if methods else {})
        return losses, out.logits, scores

    return eval_batch, odin


def _collect_scores(job: Job, dataset: ArrayDataset, methods: Sequence[str],
                    batch_size: int, recorder: Optional[LossRecorder],
                    eval_batch, odin, key, num_batch: Optional[int] = None):
    """Run the model over a dataset; returns {method: np(N,)} scores and the
    (optionally filled) recorder.  Device arrays accumulate per batch; the
    host pull happens once at the end (tunnel/transfer friendly)."""
    variables = job.state.variables
    loader = DataLoader(dataset, batch_size, shuffle=False,
                        seed=((recorder.restore_seed() or 0)
                              if recorder is not None else 0),
                        drop_last=False)
    per_method: Dict[str, List] = {m: [] for m in methods}
    rec_batches = []
    for i, (x, y) in enumerate(loader):
        if num_batch is not None and i >= num_batch:
            break
        k = jax.random.fold_in(key, i)
        losses, logits, scores = eval_batch(variables, jnp.asarray(x), k)
        for m in methods:
            per_method[m].append(scores[m])
        if recorder is not None:
            rec_batches.append((losses, logits, np.asarray(y)))
    if recorder is not None and rec_batches:
        host = jax.device_get([(l, lo) for l, lo, _ in rec_batches])
        for (losses, logits), (_, _, y) in zip(host, rec_batches):
            rec = {k_: np.asarray(v) for k_, v in losses.items()}
            rec['logits'] = np.asarray(logits).T
            rec['y_true'] = y
            recorder.append_batch(**rec)
    out = jax.device_get({m: jnp.concatenate(v) for m, v in per_method.items()})
    return {m: np.asarray(v) for m, v in out.items()}


def _scores_from_recorder(job: Job, recorder: LossRecorder,
                          methods: Sequence[str]):
    losses = {k: jnp.asarray(recorder.get(k)) for k in recorder.keys()
              if k not in ('logits', 'y_true')}
    logits = jnp.asarray(recorder.get('logits')).T
    ms = batch_dist_measures(job.model_cfg, logits, losses, methods)
    return {m: np.asarray(v) for m, v in ms.items()}


def ood_detection_rates(job: Job, testset: Optional[ArrayDataset] = None,
                        oodsets: Optional[Sequence[ArrayDataset]] = None,
                        batch_size: int = 100,
                        num_batch: Optional[int] = None,
                        method: str = 'all',
                        epoch='last',
                        update_self_ood: bool = True,
                        recording: bool = True,
                        from_where: Sequence[str] = ('recorders', 'compute'),
                        key: Optional[jax.Array] = None,
                        outputs=None) -> Dict[str, Dict[str, dict]]:
    """OOD scores + ROC for the test set against each OOD set."""
    cfg = job.model_cfg
    epoch = _epoch_of(job, epoch)
    methods = (develop_starred_methods(cfg.ood_methods) if method == 'all'
               else ([method] if isinstance(method, str) else list(method)))
    if testset is None:
        name = job.training_parameters.get('set') or 'cifar10'
        _, testset = get_dataset(name, splits=['test'])
    if oodsets is None:
        oodsets = []
        for n in testset.same_size:
            try:
                _, s = get_dataset(n, splits=['test'])
                oodsets.append(s)
            except Exception as e:
                logging.debug('skipping oodset %s: %s', n, e)

    key = key if key is not None else jax.random.PRNGKey(epoch)
    sdir = _sample_dir(job, epoch)
    has_odin = any(m.startswith('odin') for m in methods)
    eval_batch, odin = _make_eval_fn(job.model, job.state.sigma_state,
                                     has_odin, methods)

    all_sets = [testset] + list(oodsets)
    measures: Dict[str, Dict[str, np.ndarray]] = {}
    for s in all_sets:
        rec = None
        rec_path = os.path.join(sdir, 'record-{}.npz'.format(s.name)) if sdir else None
        if (rec_path and os.path.exists(rec_path) and 'recorders' in from_where):
            loaded = LossRecorder.load(rec_path)
            if all((m in loaded or not m.startswith('odin')) for m in methods):
                try:
                    measures[s.name] = _scores_from_recorder(job, loaded, methods)
                    continue
                except KeyError:
                    pass
        if 'compute' not in from_where:
            continue
        if recording and rec_path:
            rec = LossRecorder(batch_size)
            rec.init_seed_for_dataloader(0)
        measures[s.name] = _collect_scores(job, s, methods, batch_size, rec,
                                           eval_batch, odin, key, num_batch)
        if rec is not None:
            rec.save(rec_path)

    ind = measures.get(testset.name)
    results: Dict[str, Dict[str, dict]] = {}
    if ind is None:
        return results
    for s in oodsets:
        if s.name not in measures:
            continue
        results[s.name] = {}
        for m in methods:
            r = roc_curve(jnp.asarray(ind[m]), jnp.asarray(measures[s.name][m]),
                          kept_tpr=KEPT_TPR,
                          two_sided=two_sided_from_method(m))
            results[s.name][m] = {
                'epochs': epoch,
                'n': int(ind[m].shape[0]),
                'mean': float(np.mean(measures[s.name][m])),
                'std': float(np.std(measures[s.name][m])),
                'auc': float(r['auc']),
                'tpr': [float(t) for t in KEPT_TPR],
                'fpr': np.asarray(r['fpr']).tolist(),
                'thresholds': np.asarray(r['thresholds_low']).tolist(),
                'thresholds_up': np.asarray(r['thresholds_up']).tolist(),
                'precision': np.asarray(r['precision']).tolist(),
            }
    if update_self_ood:
        job.ood_results.setdefault(epoch, {})
        for s_name, rs in results.items():
            job.ood_results[epoch].setdefault(s_name, {}).update(rs)
    return results


def accuracy(job: Job, testset: Optional[ArrayDataset] = None,
             batch_size: int = 100,
             num_batch: Optional[int] = None,
             method: str = 'all',
             epoch='last',
             update_self_testing: bool = True,
             recording: bool = True,
             key: Optional[jax.Array] = None,
             from_where: Optional[Sequence[str]] = None,
             outputs=None) -> Dict[str, float]:
    """Classification accuracy per predict method (ref cvae.py:1187-1446).

    from_where=('json',) reuses stored results without recomputing."""
    cfg = job.model_cfg
    epoch = _epoch_of(job, epoch)
    predict_methods = (cfg.predict_methods if method == 'all'
                       else ([method] if isinstance(method, str) else list(method)))
    if not predict_methods:
        return {}
    if testset is None:
        name = job.training_parameters.get('set') or 'cifar10'
        _, testset = get_dataset(name, splits=['test'])
    # json tier: reuse stored accuracies with enough samples
    # (ref available_results short-circuit, cvae.py:1241-1263)
    if from_where is not None and 'compute' not in from_where:
        stored = job.testing.get(epoch, {})
        return {m: stored[m]['accuracy'] for m in predict_methods
                if isinstance(stored.get(m), dict)
                and stored[m].get('n', 0) >= len(testset)
                and 'accuracy' in stored[m]}
    key = key if key is not None else jax.random.PRNGKey(epoch + 1)

    model = job.model
    variables = job.state.variables
    sigma_state = job.state.sigma_state
    pm_tuple = tuple(predict_methods)

    @jax.jit
    def eval_batch(variables, x, y, k):
        out = evaluate(model, variables, x, None, rng=k,
                       sigma_state=sigma_state, train=False)
        correct = {m: jnp.sum(predict_after_evaluate(cfg, out.logits,
                                                     out.losses, m) == y)
                   for m in pm_tuple if m != 'already'}
        return out.losses, out.logits, correct

    loader = DataLoader(testset, batch_size, shuffle=False, drop_last=False)
    n_correct = {m: 0 for m in predict_methods}
    n_total = 0
    sdir = _sample_dir(job, epoch)
    rec = LossRecorder(batch_size) if (recording and sdir) else None

    # datasets carrying pseudo-labels feed the 'already' method
    # (ref EstimatedLabelsDataset + y_est_already, ft/job.py:70-105)
    estimated = getattr(testset, 'estimated', None)

    counts = []
    rec_batches = []
    for i, (x, y) in enumerate(loader):
        if num_batch is not None and i >= num_batch:
            break
        k = jax.random.fold_in(key, i)
        losses, logits, correct = eval_batch(variables, jnp.asarray(x),
                                             jnp.asarray(y), k)
        if estimated is not None and 'already' in predict_methods:
            y_hat = estimated[i * batch_size:i * batch_size + len(y)]
            correct = dict(correct)
            correct['already'] = int((y_hat == y).sum())
        counts.append(correct)
        n_total += len(y)
        if rec is not None:
            rec_batches.append((losses, logits, np.asarray(y)))

    for correct in jax.device_get(counts):
        for m in predict_methods:
            if m in correct:
                n_correct[m] += int(correct[m])
    if rec is not None and rec_batches:
        host = jax.device_get([(l, lo) for l, lo, _ in rec_batches])
        for (losses, logits), (_, _, y) in zip(host, rec_batches):
            r = {k_: np.asarray(v) for k_, v in losses.items()}
            r['logits'] = np.asarray(logits).T
            r['y_true'] = y
            rec.append_batch(**r)
        rec.save(os.path.join(sdir, 'record-{}.npz'.format(testset.name)))

    acc = {m: n_correct[m] / max(n_total, 1) for m in predict_methods}
    if update_self_testing:
        job.testing.setdefault(epoch, {})
        for m in predict_methods:
            prev = job.testing[epoch].get(m, {})
            if n_total >= prev.get('n', 0):
                job.testing[epoch][m] = {
                    'n': n_total, 'epochs': epoch,
                    'sampling': cfg.test_latent_sampling,
                    'accuracy': acc[m]}
    return acc


def misclassification_detection_rates(job: Job,
                                      testset: Optional[ArrayDataset] = None,
                                      predict_methods='all',
                                      misclass_methods='all',
                                      epoch='last',
                                      shown_tpr: float = 0.95,
                                      batch_size: int = 100,
                                      num_batch: Optional[int] = None,
                                      update_self_results: bool = True,
                                      key: Optional[jax.Array] = None,
                                      outputs=None) -> Dict[str, dict]:
    """Detect misclassifications by thresholding confidence scores
    (ref cvae.py:1913-2080)."""
    cfg = job.model_cfg
    epoch = _epoch_of(job, epoch)
    pms = (cfg.predict_methods if predict_methods == 'all'
           else list(predict_methods))
    mms = (develop_starred_methods(cfg.misclass_methods)
           if misclass_methods == 'all' else list(misclass_methods))
    if not pms or not mms:
        return {}

    # source: recorder if available, else fresh compute
    sdir = _sample_dir(job, epoch)
    name = (testset.name if testset is not None
            else job.training_parameters.get('set') or 'cifar10')
    rec_path = os.path.join(sdir, 'record-{}.npz'.format(name)) if sdir else None
    if rec_path and os.path.exists(rec_path):
        rec = LossRecorder.load(rec_path)
    else:
        if testset is None:
            _, testset = get_dataset(name, splits=['test'])
        has_odin = any(m.startswith('odin') for m in mms)
        eval_batch, odin = _make_eval_fn(job.model, job.state.sigma_state,
                                         has_odin, mms)
        rec = LossRecorder(batch_size)
        key = key if key is not None else jax.random.PRNGKey(epoch + 2)
        _collect_scores(job, testset, list(mms), batch_size, rec,
                        eval_batch, odin, key, num_batch)
        if rec_path:
            rec.save(rec_path)

    losses = {k: jnp.asarray(rec.get(k)) for k in rec.keys()
              if k not in ('logits', 'y_true')}
    logits = jnp.asarray(rec.get('logits')).T
    y = np.asarray(rec.get('y_true'))

    mms_avail = [m for m in mms
                 if not m.startswith('odin') or m in rec]
    results = {}
    for pm in pms:
        try:
            y_ = np.asarray(predict_after_evaluate(cfg, logits, losses, pm))
        except KeyError:
            continue
        correct = y_ == y
        missed = ~correct
        if correct.sum() == 0 or missed.sum() == 0:
            continue
        acc = correct.mean()
        ms = batch_dist_measures(cfg, logits, losses, mms_avail)
        results[pm] = {'accuracy': float(acc)}
        for m in mms_avail:
            v = np.asarray(ms[m])
            r = roc_curve(jnp.asarray(v[correct]), jnp.asarray(v[missed]),
                          kept_tpr=KEPT_TPR)
            thr = np.asarray(r['thresholds_low'])
            pos = v[None, :] >= thr[:, None]
            tp = (pos & correct[None]).sum(1)
            fp = (pos & missed[None]).sum(1)
            precision = tp / np.maximum(tp + fp, 1)
            recall = tp / max(correct.sum(), 1)
            results[pm][m] = {
                'n': int(len(y)), 'epochs': epoch,
                'sampling': cfg.test_latent_sampling,
                'auc': float(r['auc']),
                'tpr': [float(t) for t in KEPT_TPR],
                'fpr': np.asarray(r['fpr']).tolist(),
                'precision': precision.tolist(),
                'recall': recall.tolist(),
            }
        if update_self_results:
            job.testing.setdefault(epoch, {})
            prev = job.testing[epoch].get(pm, {})
            base = {'n': int(len(y)), 'epochs': epoch,
                    'sampling': cfg.test_latent_sampling,
                    'accuracy': float(acc)}
            base.update({k: v for k, v in prev.items()
                         if k not in base})
            for m in mms_avail:
                base[m] = results[pm][m]
            job.testing[epoch][pm] = base
    return results

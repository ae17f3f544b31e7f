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

import functools
import logging
import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loaders import ArrayDataset, DataLoader, get_dataset
from ..models.cvnet import CVNet
from ..models.evaluate import evaluate
from ..parallel.mesh import host_get
from ..ops.roc import roc_curve, two_sided_from_method, DEFAULT_KEPT_TPR
from ..ops.scores import (batch_dist_measures, develop_starred_methods,
                          predict_after_evaluate, strip_roc_suffix)
from ..save_load.dictify import needed_components
from ..save_load.jobs import Job
from ..save_load.recorders import (LossRecorder, find_record,
                                    record_filename)
from .odin import make_odin_scores

KEPT_TPR = DEFAULT_KEPT_TPR


def _epoch_of(job: Job, epoch):
    return job.trained if epoch in (None, 'last') else int(epoch)


def _multiprocess_tiers(from_where, recording):
    """Multi-process runs must keep every process on the SAME compute path:
    the recorder *replay* tier depends on per-host filesystem state (host 0
    writes recorders, other hosts never see them on a pod), so one host
    replaying a recorder while the rest run collective-bearing forwards
    would deadlock.  Recorder reuse is disabled at process_count>1; the
    json tier stays (job state is replicated in-memory, identical
    everywhere).

    Recorder *capture* stays ON: the scores/losses are gathered to every
    host anyway (host_get runs a process_allgather collective that all
    processes execute on the same tensors), and only the write process
    touches the filesystem (_save_recorder's is_write_process guard) — so
    a pod run leaves the same record files a single-process run would,
    keeping the post-hoc tiers (arrays, inspection, mutual-info) alive."""
    if jax.process_count() > 1:
        return tuple(w for w in from_where if w != 'recorders'), recording
    return from_where, recording


def _is_wim_method(m: str) -> bool:
    """'~'/'@'-suffixed methods need the WIM twin recordings (alternate
    prior losses / estimated labels, ref ft/wim.py) — a plain evaluate
    cannot produce them, so they are recorder/json-tier only."""
    b = strip_roc_suffix(m)
    return bool(b) and b[-1] in '~@'


def _sample_dir(job: Job, epoch: int) -> Optional[str]:
    if not job.saved_dir:
        return None
    return os.path.join(job.saved_dir, 'samples', '{:04d}'.format(epoch))


def _make_eval_fn(model: CVNet, sigma_state, with_odin: bool,
                  methods: Sequence[str] = (), mesh=None):
    """Jitted scoring programs: evaluate (+ ODIN grid) + all score measures —
    scores stay on device, one host transfer per set.

    Returns ``(eval_batch, eval_scan, odin)``: ``eval_batch`` runs one batch;
    ``eval_scan`` runs a (nb, B, ...) stack of batches through a
    ``lax.scan`` inside a single compiled program (kills the ~1.4 ms/batch
    Python dispatch of a per-batch loop on the tunneled TPU).  The mean
    (sample-0) reconstruction is never consumed by scores, so its decode is
    skipped (1/(L+1) of the decode FLOPs).

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

    constrain_z = None
    if mesh is not None:
        from ..parallel.mesh import sample_constraint
        constrain_z = sample_constraint(mesh)

    # JVT_EVAL_NATIVE: native-layout loss epilogue in the forward-only
    # scoring program ('0' = off, '1'/'bf16'/'barrier'/'bf16+barrier' — see
    # models/evaluate.py native_scores; measured in docs/BENCH.md round 3:
    # 'bf16' wins +7% on bf16 models, score deviation <=8e-4 relative, so
    # it is the default there; f32 models keep the canonical layout, where
    # the native epilogue measured a wash).  Safe here because nothing
    # downstream renders x_reco (scores/losses only); recorders get
    # identical loss dicts.
    ns = os.environ.get('JVT_EVAL_NATIVE', '')
    if ns == '':
        ns = 'bf16' if model.cfg.compute_dtype == 'bfloat16' else '0'
    ns = False if ns in ('', '0') else (True if ns == '1' else ns)

    def _one(variables, x, key):
        out = evaluate(model, variables, x, None, rng=key,
                       sigma_state=sigma_state, train=False,
                       decode_mean=False, constrain_z=constrain_z,
                       native_scores=ns)
        losses = dict(out.losses)
        if odin is not None:
            losses.update(odin(variables, x, key))
        scores = (batch_dist_measures(model.cfg, out.logits, losses, methods)
                  if methods else {})
        return losses, out.logits, scores

    # JVT_EVAL_DONATE=1 donates the input batch/stack — MEASURED INERT
    # (+-0.1%, docs/BENCH.md round 5): the scan consumes xs slices through
    # its last iteration and no output shares the stack's shape, so XLA
    # cannot alias it ("donated buffers were not usable").  Kept as a knob
    # for the probe; off by default to avoid the per-trace warning.
    donate = os.environ.get('JVT_EVAL_DONATE', '0').strip().lower() \
        not in ('0', 'off', 'false', 'no')
    dn = (1,) if donate else ()
    eval_batch = jax.jit(_one, donate_argnums=dn)

    @functools.partial(jax.jit, donate_argnums=dn)
    def eval_scan(variables, xs, keys):
        def body(carry, inp):
            x, k = inp
            return carry, _one(variables, x, k)
        _, outs = jax.lax.scan(body, 0, (xs, keys))
        return outs                       # leaves stacked along batch axis 0

    return eval_batch, eval_scan, odin


_SCAN_CHUNK = 16         # batches per compiled scan dispatch


def _collect_scores(job: Job, dataset: ArrayDataset, methods: Sequence[str],
                    batch_size: int, recorder: Optional[LossRecorder],
                    eval_batch, eval_scan, odin, key,
                    num_batch: Optional[int] = None, mesh=None):
    """Run the model over a dataset; returns {method: np(N,)} scores and the
    (optionally filled) recorder.

    Full-size batches are grouped into stacks of ``_SCAN_CHUNK`` and scored
    by one ``lax.scan`` dispatch each (device-resident loop); the partial
    tail batch goes through the per-batch program.  Device arrays accumulate
    across dispatches; the host pull happens once at the end
    (tunnel/transfer friendly)."""
    variables = job.state.variables
    put_b = put_s = jnp.asarray
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..parallel.mesh import (eval_batch_putters, put_global,
                                     warn_replicated_fallback)
        tail = [None] * len(dataset.shape)
        warn_flag = {}       # shared: one eval warns at most once
        put_b, _ = eval_batch_putters(mesh, 1 + len(dataset.shape),
                                      warn_flag=warn_flag)
        sh_s = NamedSharding(mesh, P(None, 'data', *tail))    # (nb, B, ...)
        rep = NamedSharding(mesh, P())
        nd = mesh.shape['data']

        def put_s(a):
            # stacked full batches shard on axis 1; a batch size that does
            # not divide the data axis goes in replicated (exact, slower —
            # pick a divisible batch size; eval_batch_putters docstring)
            a = np.asarray(a)
            if a.shape[1] % nd:
                warn_replicated_fallback(warn_flag, a.shape[1], nd)
                return put_global(a, rep)
            return put_global(a, sh_s)
    loader = DataLoader(dataset, batch_size, shuffle=False,
                        seed=((recorder.restore_seed() or 0)
                              if recorder is not None else 0),
                        drop_last=False)
    batches = []
    for i, (x, y) in enumerate(loader):
        if num_batch is not None and i >= num_batch:
            break
        batches.append((x, y))

    per_method: Dict[str, List] = {m: [] for m in methods}
    rec_outs = []           # (device (losses, logits), [y...], stacked?)
    idx = 0
    while idx < len(batches):
        run = batches[idx:idx + _SCAN_CHUNK]
        run = run[:next((j for j, b in enumerate(run)
                         if b[0].shape[0] != batch_size), len(run))]
        if len(run) >= 2:
            xs = put_s(np.stack([b[0] for b in run]))
            keys = jax.vmap(jax.random.fold_in, (None, 0))(
                key, jnp.arange(idx, idx + len(run)))
            losses, logits, scores = eval_scan(variables, xs, keys)
            # flatten (nb, B) -> (nb*B,) inside jit: eager reshape is not
            # allowed on cross-process global arrays (spmd_mode=allow_jit)
            flat = _flatten_scores({m: scores[m] for m in methods})
            for m in methods:
                per_method[m].append(flat[m])
        else:
            x, y = batches[idx]
            losses, logits, scores = eval_batch(
                variables, put_b(x), jax.random.fold_in(key, idx))
            for m in methods:
                per_method[m].append(scores[m])
        if recorder is not None:
            rec_outs.append(((losses, logits),
                             [b[1] for b in run] if len(run) >= 2 else
                             [batches[idx][1]],
                             len(run) >= 2))
        idx += max(len(run), 1)

    if recorder is not None and rec_outs:
        host = host_get([t for t, _, _ in rec_outs])
        for (losses, logits), (_, ys, stacked) in zip(host, rec_outs):
            for j, y in enumerate(ys):
                rec = {k_: np.asarray(v[j] if stacked else v)
                       for k_, v in losses.items()}
                rec['logits'] = np.asarray(logits[j] if stacked else logits).T
                rec['y_true'] = np.asarray(y)
                recorder.append_batch(**rec)
    out = host_get(_concat_scores(per_method))
    return {m: np.asarray(v) for m, v in out.items()}


@jax.jit
def _flatten_scores(scores):
    # (nb, B, ...) per-dispatch stacks -> (nb*B, ...)
    return jax.tree_util.tree_map(
        lambda v: v.reshape((-1,) + v.shape[2:]), scores)


@jax.jit
def _concat_scores(per_method):
    return {m: jnp.concatenate(v) for m, v in per_method.items()}


def _recorder_tensors(recorder: LossRecorder):
    """(losses, logits, y_true) from a recorder, undoing the stored
    logits transpose — the one place that knows the layout."""
    losses = {k: jnp.asarray(recorder.get(k)) for k in recorder.keys()
              if k not in ('logits', 'y_true')}
    logits = (jnp.asarray(recorder.get('logits')).T
              if 'logits' in recorder else None)
    y_true = (np.asarray(recorder.get('y_true'))
              if 'y_true' in recorder else None)
    return losses, logits, y_true


def _scores_from_recorder(job: Job, recorder: LossRecorder,
                          methods: Sequence[str]):
    losses, logits, _ = _recorder_tensors(recorder)
    ms = batch_dist_measures(job.model_cfg, logits, losses, methods)
    return {m: np.asarray(v) for m, v in ms.items()}


def _save_recorder(rec: LossRecorder, path: str):
    """Never degrade a stored recorder (ref recorders accumulate per
    epoch dir): keep the old file when it holds more samples; fold
    old-only keys in when the sample counts match (under multi-process a
    tie keeps the OLD tensors — see the branch below).

    Multi-process: host 0 writes only (concurrent writers would race the
    file); recorder CAPTURE stays on there while replay is disabled
    (_multiprocess_tiers)."""
    from ..save_load.checkpoint import is_write_process
    if not is_write_process():
        return
    base = path[:-4]  # same set stored in either format counts
    for ext in ('.jvr', '.npz'):
        p = base + ext
        if not os.path.exists(p):
            continue
        try:
            old = LossRecorder.load(p)
        except Exception:
            continue
        if old.recorded_samples > rec.recorded_samples:
            logging.info('keeping %s (%d > %d recorded samples)', p,
                         old.recorded_samples, rec.recorded_samples)
            return
        if old.recorded_samples == rec.recorded_samples:
            if jax.process_count() > 1:
                # pod runs disable the replay tier (_multiprocess_tiers),
                # so a later engine recomputes what a single-process run
                # would have replayed — letting it overwrite would leave
                # fresh-ε tensors where single-process keeps the first
                # recording.  Tie keeps the OLD tensors (record files
                # identical across process counts); new-only keys fold in.
                for k in rec.keys():
                    if k not in old:
                        old._tensors[k] = rec.get(k)
                rec = old
            else:
                for k in old.keys():
                    if k not in rec:
                        rec._tensors[k] = old.get(k)
    rec.save(path)
    # the saved file supersedes any other-format twin (keys folded in
    # above); remove it so find_record's newest-wins rule can't resurrect
    # the stale one after an mtime-mangling copy of the job dir
    other = base + ('.npz' if path.endswith('.jvr') else '.jvr')
    if os.path.exists(other):
        try:
            os.remove(other)
        except OSError:
            pass


def ood_detection_rates(job: Job, testset: Optional[ArrayDataset] = None,
                        oodsets: Optional[Sequence[ArrayDataset]] = None,
                        batch_size: int = 100,
                        num_batch: Optional[int] = None,
                        method: str = 'all',
                        epoch='last',
                        update_self_ood: bool = True,
                        recording: bool = True,
                        record_dir: Optional[str] = None,
                        from_where: Sequence[str] = ('json', 'recorders',
                                                     'compute'),
                        key: Optional[jax.Array] = None,
                        mesh=None,
                        outputs=None) -> Dict[str, Dict[str, dict]]:
    """OOD scores + ROC for the test set against each OOD set.

    Per-(set, method) 3-tier reuse (ref available_results dictify.py:215-382
    consumed by cvae.py:1455-1620): a method whose stored json already covers
    the wanted sample count is returned as-is; one whose needed loss
    components sit in a recorder is re-scored without model forwards; only
    the remainder triggers fresh evaluation — and the in-distribution scores
    are only computed for methods some OOD set still needs.
    """
    cfg = job.model_cfg
    epoch = _epoch_of(job, epoch)
    methods = develop_starred_methods(
        cfg.ood_methods if method == 'all'
        else ([method] if isinstance(method, str) else list(method)))
    if not methods:
        return {}
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

    from_where, recording = _multiprocess_tiers(from_where, recording)
    key = key if key is not None else jax.random.PRNGKey(epoch)
    sdir = _sample_dir(job, epoch)

    def n_wanted(s):
        n = len(s)
        return min(n, num_batch * batch_size) if num_batch else n

    # --- tier 1: stored json per (ood set, method) -------------------------
    stored = job.ood_results.get(epoch, {})
    json_ok: Dict[str, set] = {}
    for s in oodsets:
        per = stored.get(s.name, {}) if 'json' in from_where else {}
        json_ok[s.name] = {m for m in methods
                           if isinstance(per.get(m), dict)
                           and per[m].get('n', 0) >= n_wanted(s)}

    need: Dict[str, List[str]] = {
        s.name: [m for m in methods if m not in json_ok[s.name]]
        for s in oodsets}
    ind_methods = [m for m in methods
                   if any(m in ms for ms in need.values())]
    need[testset.name] = ind_methods

    all_sets = [testset] + list(oodsets)
    sets_to_score = [s for s in all_sets if need.get(s.name)]

    # --- tier 2: recorders per method; plan tier-3 residue -----------------
    measures: Dict[str, Dict[str, np.ndarray]] = {}
    to_compute: List = []            # (dataset, [methods])
    for s in sets_to_score:
        wanted = need[s.name]
        rec_path = find_record(sdir, s.name) if sdir else None
        loaded = None
        if rec_path and 'recorders' in from_where:
            loaded = LossRecorder.load(rec_path)
        from_rec, residue = [], []
        for m in wanted:
            if (loaded is not None
                    and loaded.recorded_samples >= n_wanted(s)
                    and all(c in loaded for c in needed_components(m))):
                from_rec.append(m)
            elif _is_wim_method(m):
                logging.warning(
                    "method %s needs WIM twin recordings absent for %s — "
                    'skipped (the ft flow records them)', m, s.name)
            else:
                residue.append(m)
        if from_rec:
            measures[s.name] = _scores_from_recorder(job, loaded, from_rec)
        if residue and 'compute' in from_where:
            to_compute.append((s, residue))

    # --- tier 3: fresh evaluation, one compiled program for the union ------
    if to_compute:
        union = [m for m in methods
                 if any(m in ms for _, ms in to_compute)]
        has_odin = any(m.startswith('odin') for m in union)
        eval_batch, eval_scan, odin = _make_eval_fn(
            job.model, job.state.sigma_state, has_odin, union, mesh=mesh)
        for s, ms in to_compute:
            rec = None
            # record_dir redirects fresh recordings (the WIM pre-tuning
            # baseline writes samples/<epoch>/init/, ref ft/job.py:302-313)
            wdir = record_dir or sdir
            rec_path = (os.path.join(wdir, record_filename(s.name))
                        if wdir else None)
            if recording and rec_path:
                rec = LossRecorder(batch_size)
                rec.init_seed_for_dataloader(0)
            scored = _collect_scores(job, s, ms, batch_size, rec,
                                     eval_batch, eval_scan, odin, key,
                                     num_batch, mesh=mesh)
            measures.setdefault(s.name, {}).update(scored)
            if rec is not None:
                _save_recorder(rec, rec_path)

    # --- assemble: ROC for fresh methods, stored entries for json-tier -----
    ind = measures.get(testset.name, {})
    results: Dict[str, Dict[str, dict]] = {}
    fresh: Dict[str, Dict[str, dict]] = {}
    for s in oodsets:
        results[s.name] = {}
        for m in json_ok[s.name]:
            results[s.name][m] = stored[s.name][m]
        ood_scores = measures.get(s.name, {})
        for m in need[s.name]:
            if m not in ind or m not in ood_scores:
                continue
            r = roc_curve(jnp.asarray(ind[m]), jnp.asarray(ood_scores[m]),
                          kept_tpr=KEPT_TPR,
                          two_sided=two_sided_from_method(m))
            entry = {
                'epochs': epoch,
                # n counts the OOD samples (ref cvae.py:1886); the tier-1
                # reuse check compares it against n_wanted(oodset)
                'n': int(ood_scores[m].shape[0]),
                'mean': float(np.mean(ood_scores[m])),
                'std': float(np.std(ood_scores[m])),
                'auc': float(r['auc']),
                'tpr': [float(t) for t in KEPT_TPR],
                'fpr': np.asarray(r['fpr']).tolist(),
                'thresholds': np.asarray(r['thresholds_low']).tolist(),
                'thresholds_up': np.asarray(r['thresholds_up']).tolist(),
                'precision': np.asarray(r['precision']).tolist(),
            }
            results[s.name][m] = entry
            fresh.setdefault(s.name, {})[m] = entry
        if not results[s.name]:
            results.pop(s.name)
    if update_self_ood and fresh:
        job.ood_results.setdefault(epoch, {})
        for s_name, rs in fresh.items():
            job.ood_results[epoch].setdefault(s_name, {}).update(rs)
    if outputs is not None:
        # one grouped live row per OOD set (ref EpochOutput fpr columns)
        for s_name, rs in results.items():
            from ..save_load.dictify import _fpr_at
            fpr95 = {m: _fpr_at(r, 0.95) for m, r in rs.items()
                     if isinstance(r, dict)}
            aucs = {m: r.get('auc') for m, r in rs.items()
                    if isinstance(r, dict)}
            outputs.results(0, 1, epoch, epoch,
                            preambule='ood:' + s_name,
                            accuracy={'auc:' + m: v
                                      for m, v in list(aucs.items())[:4]},
                            fpr={m: v for m, v in list(fpr95.items())[:4]
                                 if v is not None})
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
             mesh=None,
             outputs=None) -> Dict[str, float]:
    """Classification accuracy per predict method (ref cvae.py:1187-1446).

    3-tier per-method reuse: stored json with enough samples is returned
    as-is; a recorder holding the needed loss components is *replayed*
    (predictions recomputed from recorded tensors, zero model forwards — ref
    cvae.py:1268-1330); only the residue evaluates the model."""
    cfg = job.model_cfg
    epoch = _epoch_of(job, epoch)
    predict_methods = (cfg.predict_methods if method == 'all'
                       else ([method] if isinstance(method, str) else list(method)))
    if not predict_methods:
        return {}
    if testset is None:
        name = job.training_parameters.get('set') or 'cifar10'
        _, testset = get_dataset(name, splits=['test'])
    if from_where is None:
        from_where = ('json', 'recorders', 'compute')
    from_where, recording = _multiprocess_tiers(from_where, recording)

    n_want = (min(len(testset), num_batch * batch_size) if num_batch
              else len(testset))
    acc: Dict[str, float] = {}

    # tier 1: stored json (ref available_results short-circuit, cvae.py:1241)
    stored = job.testing.get(epoch, {})
    if 'json' in from_where:
        for m in predict_methods:
            r = stored.get(m)
            if (isinstance(r, dict) and r.get('n', 0) >= n_want
                    and 'accuracy' in r):
                acc[m] = r['accuracy']
    remaining = [m for m in predict_methods if m not in acc]

    # tier 2: recorder replay (ref cvae.py:1268-1330)
    sdir = _sample_dir(job, epoch)
    rec_path = find_record(sdir, testset.name) if sdir else None
    if remaining and 'recorders' in from_where and rec_path:
        loaded = LossRecorder.load(rec_path)
        if loaded.recorded_samples >= n_want and 'y_true' in loaded:
            losses, logits, y_true = _recorder_tensors(loaded)
            replayed = {}
            for m in remaining:
                if m == 'already' or not all(
                        c in loaded for c in needed_components(m)):
                    continue
                y_ = np.asarray(predict_after_evaluate(cfg, logits, losses, m))
                replayed[m] = float((y_ == y_true).mean())
            if replayed and update_self_testing:
                job.testing.setdefault(epoch, {})
                for m, a in replayed.items():
                    prev = job.testing[epoch].get(m, {})
                    if len(y_true) >= prev.get('n', 0):
                        job.testing[epoch][m] = {
                            'n': int(len(y_true)), 'epochs': epoch,
                            'sampling': cfg.test_latent_sampling,
                            'accuracy': a}
            acc.update(replayed)
            remaining = [m for m in remaining if m not in acc]

    if not remaining or 'compute' not in from_where:
        return acc
    predict_methods = remaining
    key = key if key is not None else jax.random.PRNGKey(epoch + 1)

    model = job.model
    variables = job.state.variables
    sigma_state = job.state.sigma_state
    pm_tuple = tuple(predict_methods)

    @jax.jit
    def eval_batch(variables, x, y, k):
        out = evaluate(model, variables, x, None, rng=k,
                       sigma_state=sigma_state, train=False,
                       decode_mean=False)
        correct = {m: jnp.sum(predict_after_evaluate(cfg, out.logits,
                                                     out.losses, m) == y)
                   for m in pm_tuple if m != 'already'}
        return out.losses, out.logits, correct

    put_x = put_y = jnp.asarray
    if mesh is not None:
        from ..parallel.mesh import eval_batch_putters
        put_x, put_y = eval_batch_putters(mesh, 1 + len(testset.shape))

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
        losses, logits, correct = eval_batch(variables, put_x(x),
                                             put_y(y), k)
        if estimated is not None and 'already' in predict_methods:
            y_hat = estimated[i * batch_size:i * batch_size + len(y)]
            correct = dict(correct)
            correct['already'] = int((y_hat == y).sum())
        counts.append(correct)
        n_total += len(y)
        if rec is not None:
            rec_batches.append((losses, logits, np.asarray(y)))

    for correct in host_get(counts):
        for m in predict_methods:
            if m in correct:
                n_correct[m] += int(correct[m])
    if rec is not None and rec_batches:
        host = host_get([(l, lo) for l, lo, _ in rec_batches])
        for (losses, logits), (_, _, y) in zip(host, rec_batches):
            r = {k_: np.asarray(v) for k_, v in losses.items()}
            r['logits'] = np.asarray(logits).T
            r['y_true'] = y
            rec.append_batch(**r)
        _save_recorder(rec, os.path.join(sdir, record_filename(testset.name)))

    computed = {m: n_correct[m] / max(n_total, 1) for m in predict_methods
                if m != 'already' or estimated is not None}
    if outputs is not None and computed:
        outputs.results(0, 1, epoch, epoch, preambule='test',
                        accuracy=computed)
    if update_self_testing:
        job.testing.setdefault(epoch, {})
        for m in computed:
            prev = job.testing[epoch].get(m, {})
            if n_total >= prev.get('n', 0):
                job.testing[epoch][m] = {
                    'n': n_total, 'epochs': epoch,
                    'sampling': cfg.test_latent_sampling,
                    'accuracy': computed[m]}
    acc.update(computed)
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
                                      from_where: Sequence[str] = (
                                          'recorders', 'compute'),
                                      mesh=None,
                                      outputs=None) -> Dict[str, dict]:
    """Detect misclassifications by thresholding confidence scores
    (ref cvae.py:1913-2080).  The recorder tier replays recorded tensors
    without model forwards (ref from_where=('json', 'recorders')).
    ``mesh``: the compute tier feeds mesh-sharded global batches like
    accuracy/ood_detection_rates (required under process_count>1 against
    cross-process state)."""
    from_where, _ = _multiprocess_tiers(from_where, False)
    cfg = job.model_cfg
    epoch = _epoch_of(job, epoch)
    pms = (cfg.predict_methods if predict_methods == 'all'
           else list(predict_methods))
    mms = develop_starred_methods(
        cfg.misclass_methods if misclass_methods == 'all'
        else list(misclass_methods))
    if not pms or not mms:
        return {}

    # source: recorder if available, else fresh compute
    sdir = _sample_dir(job, epoch)
    name = (testset.name if testset is not None
            else job.training_parameters.get('set') or 'cifar10')
    rec_path = find_record(sdir, name) if sdir else None
    if rec_path and 'recorders' in from_where:
        rec = LossRecorder.load(rec_path)
    elif 'compute' not in from_where:
        return {}
    else:
        if testset is None:
            _, testset = get_dataset(name, splits=['test'])
        # WIM twin methods are recorder-only (see _is_wim_method)
        fresh = [m for m in mms if not _is_wim_method(m)]
        for m in mms:
            if _is_wim_method(m):
                logging.warning('misclass method %s needs WIM twin '
                                'recordings — skipped', m)
        mms = fresh
        if not mms:
            return {}
        has_odin = any(m.startswith('odin') for m in mms)
        eval_batch, eval_scan, odin = _make_eval_fn(
            job.model, job.state.sigma_state, has_odin, mms, mesh=mesh)
        rec = LossRecorder(batch_size)
        key = key if key is not None else jax.random.PRNGKey(epoch + 2)
        _collect_scores(job, testset, list(mms), batch_size, rec,
                        eval_batch, eval_scan, odin, key, num_batch,
                        mesh=mesh)
        # persist the fresh recording even when no prior record file
        # existed (find_record only returns pre-existing files)
        if rec_path is None and sdir:
            rec_path = os.path.join(sdir, record_filename(name))
        if rec_path:
            _save_recorder(rec, rec_path)

    losses, logits, y = _recorder_tensors(rec)

    mms_avail = [m for m in mms
                 if (not m.startswith('odin') or m in rec)
                 and (not _is_wim_method(m)
                      or all(c in rec for c in needed_components(m)))]
    ms = batch_dist_measures(cfg, logits, losses, mms_avail)
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
        results[pm] = {'accuracy': float(acc)}
        for m in mms_avail:
            v = np.asarray(ms[m])
            # honor the -2s / -a-p-q suffix geometry here too (the reference's
            # misclass path omits it, cvae.py:2003, but none of its default
            # misclass methods carry a suffix — with one, one-sided would be
            # silently wrong).
            two_sided = two_sided_from_method(m)
            r = roc_curve(jnp.asarray(v[correct]), jnp.asarray(v[missed]),
                          kept_tpr=KEPT_TPR, two_sided=two_sided)
            thr = np.asarray(r['thresholds_low'])
            if two_sided:
                thr_up = np.asarray(r['thresholds_up'])
                pos = ((v[None, :] >= thr[:, None])
                       & (v[None, :] <= thr_up[:, None]))
            else:
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
            if len(y) < prev.get('n', 0):
                # never let a smaller-sample misclass run degrade a stored
                # higher-confidence accuracy (mirrors accuracy()'s guard)
                continue
            base = {'n': int(len(y)), 'epochs': epoch,
                    'sampling': cfg.test_latent_sampling,
                    'accuracy': float(acc)}
            base.update({k: v for k, v in prev.items()
                         if k not in base})
            for m in mms_avail:
                base[m] = results[pm][m]
            job.testing[epoch][pm] = base
    return results

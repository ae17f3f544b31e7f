"""The fine-tuning driver (ref ft/job.py:170-478).

Flow: build the moving set -> pre-tuning OOD baseline (original prior,
records under ``samples/<epoch>/init/``) -> fine-tune loop (train batches
paired with cycling moving-set batches) -> estimated labels from kl-argmin ->
post-tuning OOD with both-prior WIM scores -> misclassification rates.

The reference subclasses the god-class and mutates priors in place;
here the WIMJob wraps a Job and the steps are explicit jitted programs.
"""

import logging
import os
import time
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loaders import ArrayDataset, DataLoader
from ..evals.engines import ood_detection_rates
from ..models.evaluate import evaluate
from ..ops.roc import roc_curve, two_sided_from_method, DEFAULT_KEPT_TPR
from ..ops.scores import batch_dist_measures
from ..save_load.jobs import save_job, load_job
from ..save_load.recorders import LossRecorder, record_filename
from ..train.optimizers import build_optimizer
from .wim import WIMJob, wim_measures, is_wim_method, WIM_OOD_METHODS_PER_TYPE


WIM_PRIOR_FILE = 'wim_prior.npz'


def save_wim_prior(wim: WIMJob, job_dir: str):
    """Persist the frozen alternate-prior arrays next to state.npz.

    The reference reconstructs its alternate prior from the torch seed in
    wim.json (ref ft/__main__.py:171, priors.py:66-71); storing the arrays
    makes a reloaded native (or imported reference) WIM job score '@'
    methods with the *same* prior it was tuned against, not a re-seeded
    one."""
    if wim.alternate_prior_params is None:
        return
    np.savez(os.path.join(job_dir, WIM_PRIOR_FILE),
             **{k: np.asarray(v) for k, v in
                wim.alternate_prior_params.items()})


def load_wim_job(job_dir: str, key=None, **alternate_prior) -> WIMJob:
    """Load a trained plain job for WIM tuning: lenient state load + OOD
    results reset (ref FTJob.load, ft/job.py:121-169).

    An already-finetuned WIM job (train_params 'wim' section, ref
    wim.json) reloads its alternate prior: arrays from wim_prior.npz when
    present, else re-derived from the persisted seed."""
    job = load_job(job_dir, strict=False, key=key)
    wim = WIMJob(job=job)
    saved = dict(job.training_parameters.get('wim') or {})
    if alternate_prior:
        job.ood_results = {}
        wim.set_alternate_prior(key=key, **alternate_prior)
    elif saved.get('distribution'):
        import dataclasses
        from ..ops.priors import build_prior_config, PriorConfig
        # every PriorConfig field (incl. force_conditional) — a hand list
        # here silently dropped fields as the config grew
        known = tuple(f.name for f in dataclasses.fields(PriorConfig))
        p = {k: saved[k] for k in known if saved.get(k) is not None}
        p.setdefault('dim', job.model_cfg.latent_dim)
        dim = p.pop('dim')
        dist = p.pop('distribution')
        wim.alternate_prior_cfg = build_prior_config(dim, dist, **p)
        wim.ft_params = saved
        prior_path = os.path.join(job_dir, WIM_PRIOR_FILE)
        if os.path.exists(prior_path):
            with np.load(prior_path) as z:
                wim.alternate_prior_params = {k: jnp.asarray(z[k])
                                              for k in z.files}
        else:
            from ..ops.priors import init_prior_params
            seed = int(saved.get('seed') or 0)    # tolerate seed: null
            wim.alternate_prior_params = init_prior_params(
                wim.alternate_prior_cfg, jax.random.PRNGKey(seed))
    else:
        job.ood_results = {}
    return wim


def _both_prior_losses(wim: WIMJob, dataset: ArrayDataset, batch_size: int,
                       key, L: Optional[int] = None,
                       mesh=None) -> Dict[str, np.ndarray]:
    """Full-set losses incl. '@' twins and sample-mean logits.

    ``mesh``: batches feed mesh-sharded (eval_batch_putters; required
    against cross-process state) and the device outputs accumulate until
    ONE host_get at the end — the SPMD-safe gather every process runs."""
    from ..parallel.mesh import host_get
    state = wim.job.state

    @jax.jit
    def eval_batch(variables, x, k):
        _, logits, losses, _ = wim.evaluate_on_both_priors(
            variables, x, rng=k, sigma_state=state.sigma_state, L=L)
        return losses, logits

    put_x = jnp.asarray
    if mesh is not None:
        from ..parallel.mesh import eval_batch_putters
        put_x, _ = eval_batch_putters(mesh, 1 + len(dataset.shape))

    acc: Dict[str, list] = {}
    logits_l = []
    ys = []
    loader = DataLoader(dataset, batch_size, shuffle=False)
    for i, (x, y) in enumerate(loader):
        k = jax.random.fold_in(key, i)
        losses, logits = eval_batch(state.variables, put_x(x), k)
        for kk, vv in losses.items():
            acc.setdefault(kk, []).append(vv)
        logits_l.append(logits)
        ys.append(np.asarray(y))
    acc_h, logits_h = host_get((acc, logits_l))
    out = {kk: np.concatenate([np.asarray(a) for a in v], axis=-1)
           for kk, v in acc_h.items()}
    out['y_true'] = np.concatenate(ys)
    out['logits'] = np.concatenate([np.asarray(a) for a in logits_h], axis=0)
    return out


def wim_scores_for_set(wim: WIMJob, losses: Dict[str, np.ndarray],
                       methods: Sequence[str]) -> Dict[str, np.ndarray]:
    """Plain + WIM measures for one set; estimated labels = kl argmin over
    the class axis (ref ft/job.py:447-455)."""
    cfg = wim.cfg
    y_est = None
    if cfg.losses_per_class and losses['kl'].ndim > 1:
        y_est = jnp.asarray(np.argmin(losses['kl'], axis=0))
    wm = [m for m in methods if is_wim_method(m)]
    pm = [m for m in methods if not is_wim_method(m)]
    jl = {k: jnp.asarray(v) for k, v in losses.items()
          if k not in ('y_true', 'logits')}
    out = {}
    if pm:
        out.update({k: np.asarray(v) for k, v in batch_dist_measures(
            cfg, jnp.asarray(losses['logits']), jl, pm).items()})
    if wm:
        out.update({k: np.asarray(v) for k, v in
                    wim_measures(cfg, jl, wm, y_est=y_est).items()})
    return out


def record_latents(wim: WIMJob, datasets: Sequence[ArrayDataset],
                   batch_size: int, key, out_dir: str,
                   max_batches: int = 8, mesh=None) -> None:
    """SampleRecorder dumps of encoder means per set, with both priors'
    centroids as auxiliaries — the input of the post-hoc PCA / latent-shift
    inspection (ref ft/__main__.py:209-221 feeding ft/inspection.py).

    Multi-process: every process runs the forwards + gathers (host_get is
    a collective), host 0 writes the files."""
    from ..parallel.mesh import host_get
    from ..save_load.checkpoint import is_write_process
    from ..save_load.recorders import SampleRecorder
    job = wim.job
    state = job.state
    model = job.model

    @jax.jit
    def mu_of(variables, x, k):
        out = evaluate(model, variables, x, rng=k,
                       sigma_state=state.sigma_state, L=1)
        return out.mu

    put_x = jnp.asarray
    if mesh is not None:
        from ..parallel.mesh import ensure_placed, eval_batch_putters
        job.state = state = ensure_placed(state, mesh)
        put_x, _ = eval_batch_putters(mesh, 1 + len(datasets[0].shape))

    centroids = np.asarray(host_get(state.params['prior']['mean']),
                           np.float32)
    alternate = (np.asarray(wim.alternate_prior_params['mean'], np.float32)
                 if wim.alternate_prior_params is not None else None)
    for ds in datasets:
        rec = SampleRecorder()
        loader = DataLoader(ds, batch_size, shuffle=False)
        mus, ys = [], []
        for i, (x, y) in enumerate(loader):
            if i >= max_batches:
                break
            mus.append(mu_of(state.variables, put_x(x),
                             jax.random.fold_in(key, i)))
            ys.append(np.asarray(y))
        for mu, y in zip(host_get(mus), ys):
            rec.append_batch(mu=np.asarray(mu, np.float32), y=y)
        rec.append_batch(centroids=centroids)
        if alternate is not None:
            rec.append_batch(alternate=alternate)
        if is_write_process():
            rec.save(os.path.join(out_dir, 'sample-{}.npz'.format(ds.name)))


def finetune(wim: WIMJob,
             trainset: ArrayDataset,
             moving_set: ArrayDataset,
             testset: ArrayDataset,
             oodsets: Sequence[ArrayDataset] = (),
             epochs: int = 1,
             alpha: float = 0.1,
             train_size: Optional[int] = None,
             batch_size: int = 64,
             moving_batch_size: Optional[int] = None,
             test_batch_size: int = 256,
             ood_methods: Optional[Sequence[str]] = None,
             save_dir: Optional[str] = None,
             seed: int = 0,
             mesh=None,
             outputs=None) -> WIMJob:
    """Run the WIM fine-tuning flow; updates wim.job in place.

    ``mesh``: optional jax.sharding.Mesh — exactly the trainer's contract
    (train/trainer.py::train_model): state placed with the framework's
    sharding rules, fine-tune batches sharded over 'data' (multi-process:
    aligned global batches, bit-identical data order to a single-process
    run), pre/post OOD snapshots mesh-fed, host-0-only file writes."""
    cfg = wim.cfg
    assert wim.alternate_prior_cfg is not None, 'set_alternate_prior first'
    moving_batch_size = moving_batch_size or batch_size
    methods = list(ood_methods if ood_methods is not None
                   else WIM_OOD_METHODS_PER_TYPE.get(cfg.type, ['elbo', 'zdist']))
    job = wim.job
    epoch0 = job.trained

    from ..parallel.mesh import host_get
    from ..save_load.checkpoint import is_write_process
    multiprocess = jax.process_count() > 1
    if multiprocess and mesh is None:
        raise ValueError('multi-process fine-tuning needs an explicit mesh')
    # engines run mesh-fed only under multi-process (single-process sharded
    # state accepts plain device batches; GSPMD reshards — same contract as
    # train/trainer.py)
    eng_mesh = mesh if multiprocess else None

    # mesh placement + optimizer re-init — the placed state feeds both the
    # pre-tuning engines and the fine-tune loop.  With a mesh the init runs
    # under jit (eager optax init on cross-process globals is rejected);
    # the fresh moments inherit the params' shardings.
    tx = build_optimizer(job.opt_cfg)
    if mesh is not None:
        from ..parallel.mesh import batch_sharding, ensure_placed
        state = ensure_placed(job.state, mesh)
        state = state.replace(opt_state=jax.jit(tx.init)(state.params))
        nd = mesh.shape['data']
        if batch_size % nd or moving_batch_size % nd:
            raise ValueError(
                'batch sizes ({}, moving {}) must divide the mesh data '
                'axis ({})'.format(batch_size, moving_batch_size, nd))
        x_sh = batch_sharding(mesh, 1 + len(trainset.shape))
        y_sh = batch_sharding(mesh, 1)
        if multiprocess:
            from ..parallel.mesh import put_global

            def put_x(x):
                # every process runs the same full-dataset loader; ship
                # only the addressable slice (parallel/mesh.put_global) —
                # data order bit-identical to a single-process run
                return put_global(np.asarray(x), x_sh)

            def put_y(y):
                return put_global(np.asarray(y), y_sh)
        else:
            def put_x(x):
                return jax.device_put(np.asarray(x), x_sh)

            def put_y(y):
                return jax.device_put(np.asarray(y), y_sh)
    else:
        state = job.state.replace(opt_state=tx.init(job.state.params))
        put_x = put_y = jnp.asarray
    job.state = state

    # ---- pre-tuning baseline into samples/<epoch>/init (ref ft/job.py:302-313)
    if save_dir:
        job.saved_dir = save_dir
        init_dir = os.path.join(save_dir, 'samples', '{:04d}'.format(epoch0),
                                'init')
        os.makedirs(init_dir, exist_ok=True)
        # fresh compute + recorders into init/ — the array layer merges
        # these 'pre-' records across jobs (ft/array.py merge_recorders
        # with init=True; ref WIM arrays' pre-tuning records)
        pre = ood_detection_rates(job, testset, list(oodsets),
                                  batch_size=test_batch_size,
                                  method=[m for m in methods
                                          if not is_wim_method(m)],
                                  update_self_ood=False, recording=True,
                                  record_dir=init_dir,
                                  from_where=('compute',), mesh=eng_mesh)
        from ..save_load.checkpoint import save_json
        save_json(pre, os.path.join(init_dir, 'ood.json'))

    # ---- fine-tune loop (ref ft/job.py:356-424)
    if train_size:
        rng = np.random.default_rng(seed)
        idx = rng.permutation(len(trainset))[:train_size]
        trainset = trainset.subset(idx)

    train_loader = DataLoader(trainset, batch_size, shuffle=True, seed=seed,
                              drop_last=True)
    moving_loader = DataLoader(moving_set, moving_batch_size, shuffle=True,
                               seed=seed + 1, drop_last=True)
    key = jax.random.PRNGKey(seed)

    finetune_step = jax.jit(
        lambda st, xi, yi, xm, k: wim.finetune_batch(
            st, xi, yi, xm, alpha, rng=k, tx=tx, train_L=cfg.latent_sampling))

    # batched host metric pulls, like the trainer: a round-trip per batch
    # is ruinous on tunneled/remote devices (train/trainer.py metrics_every)
    me = 1 if jax.default_backend() == 'cpu' else 8
    per_epoch = len(train_loader)
    step_i = 0
    for epoch in range(epochs):
        mov_iter = iter(moving_loader)
        pending = []
        running = {}
        t0 = time.time()
        for i, (x, y) in enumerate(train_loader):
            try:
                xm, _ = next(mov_iter)
            except StopIteration:
                mov_iter = iter(moving_loader)
                xm, _ = next(mov_iter)
            k = jax.random.fold_in(key, step_i)
            state, metrics = finetune_step(state, put_x(x), put_y(y),
                                           put_x(xm), k)
            step_i += 1
            pending.append(metrics)
            if len(pending) < me and i != per_epoch - 1:
                continue
            # live rows per batch window (ref ft/job.py:356-424 prints the
            # running fine-tune losses through its outputs table)
            for mts in host_get(pending):
                for kk, v in mts.items():
                    running[kk] = running.get(kk, 0.0) + float(v)
            pending = []
            if outputs is not None:
                mean = {kk: running[kk] / (i + 1) for kk in running}
                outputs.results(i, per_epoch, epoch + 1, epochs,
                                preambule='wim',
                                losses={'total': mean.get('total'),
                                        'in': mean.get('in_total'),
                                        'mix': mean.get('mix_total')},
                                time_per_i=(time.time() - t0) / (i + 1),
                                batch_size=batch_size)
        if step_i == 0:
            raise ValueError(
                'no fine-tuning batches: train set ({} samples) smaller '
                'than the batch size ({})'.format(len(trainset), batch_size))
        logging.info('wim epoch %d: total=%.4f (in=%.4f mix=%.4f)', epoch,
                     running.get('total', float('nan')) / max(per_epoch, 1),
                     running.get('in_total', float('nan')) / max(per_epoch, 1),
                     running.get('mix_total', float('nan')) / max(per_epoch, 1))
    job.state = state
    job.training_parameters.setdefault('fine_tuning', []).append(
        {'type': 'wim', 'epochs': epochs, 'alpha': alpha,
         'moving_size': len(moving_set), 'train_size': len(trainset),
         'from_epoch': epoch0})
    job.training_parameters['wim'] = dict(wim.ft_params)

    # ---- post-tuning evaluation with WIM scores (ref ft/job.py:433-477)
    key_eval = jax.random.fold_in(key, 10_000)
    ind_losses = _both_prior_losses(wim, testset, test_batch_size, key_eval,
                                    mesh=eng_mesh)
    ind_scores = wim_scores_for_set(wim, ind_losses, methods)

    epoch_key = job.trained
    job.ood_results.setdefault(epoch_key, {})
    ood_loss_sets = {}
    for i, ood in enumerate(oodsets):
        ood_losses = _both_prior_losses(wim, ood, test_batch_size,
                                        jax.random.fold_in(key_eval, i + 1),
                                        mesh=eng_mesh)
        ood_loss_sets[ood.name] = ood_losses
        ood_scores = wim_scores_for_set(wim, ood_losses, methods)
        job.ood_results[epoch_key].setdefault(ood.name, {})
        for m in methods:
            r = roc_curve(jnp.asarray(ind_scores[m]),
                          jnp.asarray(ood_scores[m]),
                          kept_tpr=DEFAULT_KEPT_TPR,
                          two_sided=two_sided_from_method(m))
            job.ood_results[epoch_key][ood.name][m] = {
                # 'n' counts the OOD samples (ref cvae.py:1886) — the json
                # reuse tier compares it against n_wanted(oodset)
                'epochs': epoch_key, 'n': int(ood_scores[m].shape[0]),
                'mean': float(np.mean(ood_scores[m])),
                'std': float(np.std(ood_scores[m])),
                'auc': float(r['auc']),
                'tpr': [float(t) for t in DEFAULT_KEPT_TPR],
                'fpr': np.asarray(r['fpr']).tolist(),
                'thresholds': np.asarray(r['thresholds_low']).tolist()}

    # ---- misclassification rates with WIM scores on estimated labels
    # (ref ft/job.py:477 + WIM misclass methods softzdist~/zdist~)
    from .wim import WIM_MISCLASS_METHODS_PER_TYPE
    mm = WIM_MISCLASS_METHODS_PER_TYPE.get(cfg.type, [])
    if mm and cfg.losses_per_class and ind_losses['kl'].ndim > 1:
        y_est = np.argmin(ind_losses['kl'], axis=0)
        y_true = ind_losses['y_true']
        correct = y_est == y_true
        missed = ~correct
        if correct.any() and missed.any():
            scores = wim_scores_for_set(wim, ind_losses, mm)
            job.testing.setdefault(epoch_key, {})
            entry = {'n': int(len(y_true)), 'epochs': epoch_key,
                     'accuracy': float(correct.mean()),
                     'sampling': cfg.test_latent_sampling}
            for m in mm:
                v = scores[m]
                r = roc_curve(jnp.asarray(v[correct]),
                              jnp.asarray(v[missed]),
                              kept_tpr=DEFAULT_KEPT_TPR)
                entry[m] = {'auc': float(r['auc']),
                            'tpr': [float(t) for t in DEFAULT_KEPT_TPR],
                            'fpr': np.asarray(r['fpr']).tolist(),
                            'precision': np.asarray(r['precision']).tolist()}
            job.testing[epoch_key]['already'] = entry

    # save recorders (ind + ood sets) for array aggregation; multi-process
    # runs gathered the full global losses on every host (host_get in
    # _both_prior_losses) — host 0 writes
    if save_dir:
        sdir = os.path.join(save_dir, 'samples', '{:04d}'.format(epoch_key))
        for set_name, losses_ in [(testset.name, ind_losses),
                                  *ood_loss_sets.items()]:
            rec = LossRecorder(max(1, int(losses_['y_true'].shape[0])))
            extra = {}
            if cfg.losses_per_class and losses_['kl'].ndim > 1:
                # kl-argmin pseudo-labels so '~' methods can be replayed
                # from the recorders tier (ref ft/job.py:88 stores
                # y_est_already per batch; needed_components('k~'))
                extra['y_est_already'] = np.argmin(
                    losses_['kl'], axis=0).astype(np.int32)
            rec.append_batch(**{k: v for k, v in losses_.items()
                                if k not in ('logits',)},
                             logits=losses_['logits'].T, **extra)
            if is_write_process():
                rec.save(os.path.join(sdir, record_filename(set_name)))
        save_job(job, save_dir)
        if is_write_process():
            save_wim_prior(wim, save_dir)
    return wim

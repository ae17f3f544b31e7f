"""The training driver: epoch loop with periodic evaluation, checkpointing,
live output and signal-aware stopping.

Re-design of ref ``train_model`` (cvae.py:2081-2547):

- seeded validation split persisted in train_params (ref :2155-2167)
- per-epoch: optional OOD eval (every ood_detection_every) + full test
  (every full_test_every), per-epoch checkpoint save, warmup ramps,
  per-epoch LR decay, NaN-parameter guard, live EpochOutput rows
- graceful stops on signal levels (ref :2377-2542)
- the hot loop is ONE compiled XLA program per step (train/steps.py); data
  batches stream from pinned numpy arrays.
"""

import logging
import time
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loaders import ArrayDataset, DataLoader, get_dataset
from ..evals.engines import accuracy, ood_detection_rates
from ..models.cvnet import CVNet
from ..models.evaluate import evaluate
from ..save_load.jobs import Job, save_job
from ..utils.print_log import EpochOutput
from ..utils.signaling import SIGHandler
from .optimizers import build_optimizer, set_learning_rate
from .steps import make_train_step


def split_validation(dataset: ArrayDataset, validation: int, seed: int):
    """Deterministic validation split (ref cvae.py:2155-2167)."""
    if not validation:
        return dataset, None
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(dataset))
    return dataset.subset(perm[validation:]), dataset.subset(perm[:validation])


def train_model(job: Job,
                trainset: Optional[ArrayDataset] = None,
                testset: Optional[ArrayDataset] = None,
                oodsets: Optional[Sequence[ArrayDataset]] = None,
                epochs: int = 2,
                batch_size: int = 64,
                test_batch_size: int = 512,
                validation: int = 0,
                data_augmentation: Sequence[str] = (),
                warmup=(0, 0), warmup_gamma=(0, 0),
                full_test_every: int = 10,
                ood_detection_every: int = 10,
                test_sample_size: int = 0,
                save_dir: Optional[str] = None,
                signal_handler: Optional[SIGHandler] = None,
                outputs: Optional[EpochOutput] = None,
                seed: int = 0,
                train_accuracy: bool = False,
                fine_tuning: bool = False,
                final_test: bool = True,
                final_ood: bool = True,
                metrics_every: int = 0,
                device_data: bool = False,
                mesh=None) -> Job:
    """Train job.state in place (functionally); returns the job.

    ``mesh``: optional jax.sharding.Mesh — state is placed with the
    framework's sharding rules (prior dictionary / classifier head on
    'model') and batches are sharded over 'data'; GSPMD inserts the
    collectives (parallel/mesh.py)."""
    cfg = job.model_cfg
    model = job.model
    outputs = outputs or EpochOutput()
    signal_handler = signal_handler or _NullSignal()
    # cap for the in-training monitoring evals; the final pass stays full
    # (ref validation_sample_size, cvae.py:2098,2171)
    eval_num_batch = (-(-test_sample_size // test_batch_size)
                      if test_sample_size else None)

    if trainset is None:
        name = job.training_parameters.get('set') or 'cifar10'
        trainset, ts = get_dataset(name)
        testset = testset if testset is not None else ts

    # persisted warmup + validation seed (ref cvae.py:2196-2202, 2155-2167)
    tp = job.training_parameters
    w_prev = tp.get('warmup', [0, 0])
    wg_prev = tp.get('warmup_gamma', [0, 0])
    warmup = [max(a, b) for a, b in zip(list(warmup), w_prev)]
    warmup_gamma = [max(a, b) for a, b in zip(list(warmup_gamma), wg_prev)]
    tp['warmup'], tp['warmup_gamma'] = warmup, warmup_gamma
    tp.setdefault('validation_seed', seed or 1)
    tp['set'] = getattr(trainset, 'name', tp.get('set'))
    tp['batch_size'] = batch_size
    tp['data_augmentation'] = list(data_augmentation)
    tp['epochs'] = max(tp.get('epochs') or 0, epochs)
    trainset, validationset = split_validation(trainset, validation,
                                               tp['validation_seed'])

    tx = build_optimizer(job.opt_cfg)
    frozen = tuple(tp.get('frozen_modules') or ())
    # device-resident fast path: whole trainset in HBM, contiguous in-jit
    # batch slices from a per-epoch on-device shuffle — no host->device
    # transfer in the hot loop.  Keeps every trainer feature (OOD/test
    # cadence, checkpoints, signals, live rows).  Host-side augmentation
    # needs the host loader, so it disables the fast path.
    device_data = device_data and not data_augmentation and mesh is None
    if device_data:
        from .device_data import DeviceDataset, make_device_train_step
        step = make_device_train_step(model, tx, batch_size, tuple(warmup),
                                      tuple(warmup_gamma), frozen)
        dd = DeviceDataset(trainset)
    else:
        step = make_train_step(model, tx, tuple(warmup), tuple(warmup_gamma),
                               donate=True, frozen_modules=frozen)
    state = job.state

    multiprocess = jax.process_count() > 1
    if multiprocess and mesh is None:
        raise ValueError('multi-process training needs an explicit mesh')
    # in-training eval engines run mesh-fed under multi-process (global
    # batches via put_global, recorder tiers disabled — engines.py
    # _multiprocess_tiers); single-process keeps its validated feeding
    # (GSPMD reshards plain device batches against the sharded state)
    eng_mesh = mesh if multiprocess else None
    if mesh is not None:
        from ..parallel.mesh import state_shardings, batch_sharding, put_tree
        state = put_tree(state, state_shardings(mesh, state))
        x_sh = batch_sharding(mesh, 1 + len(cfg.input_shape))
        y_sh = batch_sharding(mesh, 1)

        if multiprocess:
            from ..parallel.sharded_data import aligned_global_batch

            def put_batch(x, y):
                # every process runs the same full-dataset loader; each
                # ships its slice of the global batch (parallel/sharded_data)
                return aligned_global_batch(mesh, np.asarray(x), np.asarray(y))
        else:
            def put_batch(x, y):
                # device_put on the host array ships each shard once (an
                # intermediate jnp.asarray would commit the whole batch to
                # the default device first, then reshard)
                return (jax.device_put(np.asarray(x), x_sh),
                        jax.device_put(np.asarray(y), y_sh))
    else:
        def put_batch(x, y):
            return jnp.asarray(x), jnp.asarray(y)

    if device_data:
        loader = None
        per_epoch = dd.n // batch_size
    else:
        loader = DataLoader(trainset, batch_size, shuffle=True, seed=seed,
                            data_augmentation=data_augmentation,
                            drop_last=True)
        per_epoch = len(loader)

    first_epoch = job.trained
    for epoch in range(first_epoch, epochs):
        full_test = ((epoch - first_epoch) % full_test_every == 0
                     and epoch > first_epoch)
        ood_now = ((epoch - first_epoch) % ood_detection_every == 0
                   and epoch > first_epoch and oodsets)

        if signal_handler.sig > 3:
            logging.warning('Abruptly breaking training loop (%s)',
                            signal_handler)
            break
        if signal_handler.sig > 2 or (full_test and signal_handler.sig > 1):
            logging.warning('Breaking training loop after %d epochs (%s)',
                            epoch, signal_handler)
            break

        job.state = state
        if save_dir and epoch == first_epoch:
            # end-of-epoch saves cover later iterations; this initial save
            # persists the fresh/resumed job before any training
            save_job(job, save_dir)

        if ood_now and testset is not None:
            ood_detection_rates(job, testset, oodsets,
                                batch_size=test_batch_size, epoch=epoch,
                                num_batch=eval_num_batch, outputs=outputs,
                                mesh=eng_mesh)
        if full_test and testset is not None and cfg.predict_methods:
            accuracy(job, testset, batch_size=test_batch_size, epoch=epoch,
                     num_batch=eval_num_batch, outputs=outputs,
                     mesh=eng_mesh)

        # per-epoch LR decay (ref optimizer.update_lr, optimizers.py:123-127)
        state = state.replace(
            opt_state=set_learning_rate(state.opt_state,
                                        job.opt_cfg.lr_at_epoch(epoch)),
            epoch=jnp.asarray(epoch, jnp.int32))

        t0 = time.time()
        running: Dict[str, float] = {}
        metrics = {}
        batches_run = 0
        # a host metrics pull per batch costs one device round-trip per
        # step (ruinous on tunneled/remote devices where the RTT exceeds
        # the 5-7 ms step) — batch the pulls on accelerators; CPU keeps
        # the reference's per-batch live rows
        me = metrics_every or (1 if jax.default_backend() == 'cpu' else 8)
        pending = []
        if device_data:
            ex, ey = dd.shuffled(jax.random.fold_in(
                jax.random.PRNGKey(seed or 1), epoch))
            batches = range(per_epoch)
        else:
            batches = loader
        for i, batch in enumerate(batches):
            if device_data:
                state, metrics = step(state, ex, ey, i)
            else:
                xb, yb = put_batch(*batch)
                state, metrics = step(state, xb, yb)
            batches_run += 1
            pending.append(metrics)
            if (len(pending) < me and i != per_epoch - 1
                    and signal_handler.sig <= 3):
                continue
            # one host pull for the accumulated metric dicts
            got = jax.device_get(pending)
            pending = []
            metrics = got[-1]
            for mts in got:
                for k, v in mts.items():
                    running[k] = running.get(k, 0.0) + float(v)
            if not np.isfinite(running.get('total', 0.0)):
                # pinpoint the first bad batch inside the flushed window
                # (with batched pulls the flush index i can be up to
                # metrics_every-1 steps past it)
                bad = next((i - len(got) + 1 + k
                            for k, mts in enumerate(got)
                            if not np.isfinite(float(mts.get('total', 0.0)))),
                           i)
                logging.error('non-finite loss at epoch %d batch %d — '
                              'marking derailed', epoch, bad)
                if save_dir:
                    from ..save_load.jobs import mark
                    mark(save_dir, 'derailed')
                job.state = state
                return job
            t_per_i = (time.time() - t0) / (i + 1)
            mean = {k: running[k] / (i + 1) for k in running}
            outputs.results(i, per_epoch, epoch + 1, epochs, preambule='train',
                            losses={k: mean.get(k, np.nan)
                                    for k in cfg.loss_components
                                    if k in mean},
                            metrics={k: mean.get(k, np.nan)
                                     for k in cfg.metrics if k in mean},
                            accuracy=({'train': mean['train_acc']}
                                      if (train_accuracy
                                          and 'train_acc' in mean) else None),
                            time_per_i=t_per_i, batch_size=batch_size)
            if signal_handler.sig > 3:
                break

        checkpoint = {
            # divide by the batches actually run (a signal may break the
            # loop mid-epoch; per_epoch would understate the means)
            'train_loss': {k: running.get(k, np.nan) / max(batches_run, 1)
                           for k in cfg.loss_components if k in running},
            **({'train_accuracy': running['train_acc'] / max(batches_run, 1)}
               if 'train_acc' in running else {}),
            'train_measures': {k: float(metrics[k]) for k in cfg.metrics
                               if k in metrics},
            'lr': job.opt_cfg.lr_at_epoch(epoch),
        }

        if validationset is not None:
            vl, vm = _mean_losses(model, state, validationset,
                                  test_batch_size, epoch, mesh=eng_mesh)
            checkpoint['validation_loss'] = vl
            # measures (mse/rmse/dB) feed min-mse early stopping (ref
            # testing.py:31-37 reads validation_measures)
            checkpoint['validation_measures'] = vm
        # test losses/measures at full-test epochs and the last epoch (the
        # history-derived summary keys — rmse/dB/test_loss at epoch — feed
        # make_dict_from_model, ref dictify.py:656-676)
        if testset is not None and (
                epoch == epochs - 1
                or (epoch - first_epoch) % full_test_every == full_test_every - 1):
            tl, tm = _mean_losses(model, state, testset, test_batch_size,
                                  epoch, mesh=eng_mesh)
            checkpoint['test_loss'] = tl
            checkpoint['test_measures'] = tm
        job.train_history[epoch + 1] = checkpoint
        job.train_history['epochs'] = epoch + 1
        if fine_tuning:
            tp.setdefault('fine_tuning', []).append(epoch)

        job.state = state
        if save_dir and signal_handler.sig <= 3:
            save_job(job, save_dir)

    # final full evaluation (ref cvae.py:2505-2547)
    job.state = state
    if signal_handler.sig <= 3 and testset is not None:
        if cfg.predict_methods and final_test:
            accuracy(job, testset, batch_size=test_batch_size,
                     outputs=outputs, mesh=eng_mesh)
        if oodsets and final_ood:
            ood_detection_rates(job, testset, oodsets,
                                batch_size=test_batch_size, outputs=outputs,
                                mesh=eng_mesh)
        if save_dir:
            save_job(job, save_dir)
    return job


_MEAN_LOSS_CACHE: Dict[int, object] = {}


def _mean_losses(model: CVNet, state, dataset: ArrayDataset,
                 batch_size: int, epoch: int, mesh=None):
    """-> (mean per-component losses, mean measures incl. rmse/dB) with
    labels (validation/test history tracking).

    The jitted program is cached per model (sigma_state passed as an
    argument) — defining a fresh closure per call would recompile the
    whole eval every epoch.  ``mesh``: multi-process runs feed global
    batches (every process iterates the same full loader); outputs are
    batch means, replicated, so the host pull works on every process."""
    eval_batch = _MEAN_LOSS_CACHE.get(id(model))
    if eval_batch is None:
        @jax.jit
        def eval_batch(variables, sigma_state, x, y, k):
            out = evaluate(model, variables, x, y, rng=k,
                           sigma_state=sigma_state, train=False)
            return ({k_: jnp.mean(v) for k_, v in out.losses.items()},
                    {k_: jnp.mean(v) for k_, v in out.measures.items()})
        _MEAN_LOSS_CACHE[id(model)] = eval_batch
        if len(_MEAN_LOSS_CACHE) > 16:
            _MEAN_LOSS_CACHE.pop(next(iter(_MEAN_LOSS_CACHE)))

    put_x = put_y = jnp.asarray
    if mesh is not None:
        from ..parallel.mesh import eval_batch_putters
        put_x, put_y = eval_batch_putters(mesh, 1 + len(dataset.shape))

    sums: Dict[str, float] = {}
    msums: Dict[str, float] = {}
    n = 0
    loader = DataLoader(dataset, batch_size, shuffle=False)
    from ..parallel.mesh import host_get
    for i, (x, y) in enumerate(loader):
        k = jax.random.fold_in(jax.random.PRNGKey(epoch), i)
        m, meas = host_get(eval_batch(state.variables, state.sigma_state,
                                      put_x(x), put_y(y), k))
        for k_, v in m.items():
            sums[k_] = sums.get(k_, 0.0) + float(v)
        for k_, v in meas.items():
            msums[k_] = msums.get(k_, 0.0) + float(v)
        n += 1
    losses = {k_: v / max(n, 1) for k_, v in sums.items()}
    measures = {k_: v / max(n, 1) for k_, v in msums.items()}
    if 'mse' in measures:
        measures['rmse'] = float(np.sqrt(max(measures['mse'], 0.0)))
        if measures.get('xpow'):
            # SNR in dB (ref metric, cvae.py:97-101)
            measures['dB'] = float(10 * np.log10(
                measures['xpow'] / max(measures['mse'], 1e-30)))
    return losses, measures


class _NullSignal:
    sig = 0

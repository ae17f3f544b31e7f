"""Device-resident dataset training.

For datasets that fit in HBM (MNIST/CIFAR-scale: CIFAR-100 train is ~600MB
f32, ~300MB bf16), uploading the whole array once and gathering shuffled
batches *on device* removes the host->device transfer from the hot loop
entirely — on tunneled/remote devices this is the difference between
~500 img/s (per-batch transfers) and full compute speed (~100k img/s).

The epoch permutation is computed on device (jax.random.permutation); the
per-step gather is a take() inside the compiled step.  The host loop only
passes the step index.
"""

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.loaders import ArrayDataset
from ..models.cvnet import CVNet
from .state import TrainState, grad_mask, apply_grad_mask
from .steps import warmup_weight


class DeviceDataset:
    """The whole dataset as device arrays + an epoch permutation.

    ``storage='auto'`` keeps 8-bit-quantized [0,1] image data (the native
    format of MNIST/CIFAR/ImageNet files) as uint8 on device — 4x less HBM
    and 4x less epoch-shuffle traffic (the shuffle gather runs far below
    the sequential-bandwidth roofline: ~37 ms/epoch for CIFAR-100-train
    f32 on a v5e, ~9 ms as uint8) — and normalizes back to float inside
    the compiled step, where the divide fuses for free."""

    def __init__(self, dataset: ArrayDataset, sharding=None,
                 dtype=jnp.float32, storage: str = 'auto'):
        data = np.asarray(dataset.data)
        if data.dtype == np.uint8:
            # ingest-cache datasets are already uint8 (0..255) — upload
            # as-is, the step normalizes (data/ingest.py)
            x = jnp.asarray(data)
        else:
            if storage == 'auto':
                q = np.round(data * 255.0)
                eightbit = (data.size and float(data.min()) >= 0.0
                            and float(data.max()) <= 1.0
                            and float(np.abs(q / 255.0 - data).max()) < 1e-6)
                storage = 'uint8' if eightbit else 'float'
            if storage == 'uint8':
                x = jnp.asarray(np.round(data * 255.0).astype(np.uint8))
            else:
                x = jnp.asarray(data, dtype)
        y = jnp.asarray(dataset.targets, jnp.int32)
        if sharding is not None:
            x = jax.device_put(x, sharding)
            y = jax.device_put(y, sharding)
        self.x, self.y = x, y
        self.n = len(dataset)
        self.name = dataset.name

    def __len__(self):
        return self.n

    def shuffled(self, key) -> Tuple[jax.Array, jax.Array]:
        """One materialized on-device shuffle per epoch.

        A per-step random gather of the batch (take with a permutation
        window) costs ~2.5x the train step on a v5e — scattered rows defeat
        the DMA engines.  Shuffling the whole array once (~two sequential
        copies of the dataset, amortized over an epoch of steps) lets each
        step read its batch with a contiguous dynamic_slice instead."""
        perm = jax.random.permutation(key, self.n)
        return _shuffle(self.x, self.y, perm)

    def epoch_view(self, key=None):
        if key is None:
            return self.x, self.y
        return self.shuffled(key)


@jax.jit
def _shuffle(x, y, perm):
    return jnp.take(x, perm, axis=0), jnp.take(y, perm, axis=0)


def _device_step_fn(model: CVNet, tx: optax.GradientTransformation,
                    batch_size: int,
                    warmup: Tuple[int, int] = (0, 0),
                    warmup_gamma: Tuple[int, int] = (0, 0),
                    frozen_modules: Tuple[str, ...] = ()):
    """The pure (state, data_x, data_y, i) -> (state, metrics) body shared
    by the per-step jit and the fused whole-epoch program."""
    from ..models.evaluate import evaluate
    cfg = model.cfg
    has_bn = cfg.has_batch_norm

    def step(state: TrainState, data_x, data_y, i):
        # data_x/data_y are pre-shuffled per epoch (DeviceDataset.shuffled);
        # the batch read is a contiguous dynamic_slice.
        x = jax.lax.dynamic_slice_in_dim(data_x, i * batch_size, batch_size)
        y = jax.lax.dynamic_slice_in_dim(data_y, i * batch_size, batch_size)
        if x.dtype == jnp.uint8:        # uint8 storage: normalize in-step
            x = x.astype(jnp.float32) * (1.0 / 255.0)
        rng, sub = jax.random.split(state.rng)
        kl_w = warmup_weight(state.epoch, warmup)
        g_w = warmup_weight(state.epoch, warmup_gamma)

        def loss_fn(params):
            variables = {'params': params}
            if state.batch_stats is not None:
                variables['batch_stats'] = state.batch_stats
            res = evaluate(model, variables, x, y, rng=sub,
                           sigma_state=state.sigma_state, train=True,
                           with_beta=True, kl_var_weighting=kl_w,
                           gamma_weighting=g_w, return_bn_updates=has_bn,
                           native_scores=True)
            out, bn = res if has_bn else (res, None)
            return jnp.mean(out.losses['total']), (out, bn)

        (loss, (out, bn)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        m = grad_mask(model, state.params, frozen_modules)
        grads = apply_grad_mask(model, grads, m, state.epoch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        # frozen params must receive NO update at all (torch requires_grad
        # semantics): weight decay inside tx would otherwise still move them
        # — same double-masking as steps.py / shard_steps.py.
        updates = apply_grad_mask(model, updates, m, state.epoch)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=params, opt_state=opt_state,
            batch_stats=(bn['batch_stats'] if bn is not None
                         else state.batch_stats),
            sigma_state=out.sigma_state, rng=rng, step=state.step + 1)
        metrics = {k: jnp.mean(v) for k, v in out.losses.items()}
        metrics.update(out.measures)
        # same metric surface as steps.py::make_train_step — the trainer's
        # device_data path must not silently drop train_acc/grad_norm
        metrics['grad_norm'] = optax.global_norm(grads)
        if cfg.y_is_decoded:
            metrics['train_acc'] = jnp.mean(
                (jnp.argmax(out.logits, axis=-1) == y).astype(jnp.float32))
        return new_state, metrics

    return step


def make_device_train_step(model: CVNet, tx: optax.GradientTransformation,
                           batch_size: int,
                           warmup: Tuple[int, int] = (0, 0),
                           warmup_gamma: Tuple[int, int] = (0, 0),
                           frozen_modules: Tuple[str, ...] = ()):
    """(state, data_x, data_y, i) -> (state, metrics); the batch is read
    from the pre-shuffled arrays with a contiguous dynamic_slice."""
    step = _device_step_fn(model, tx, batch_size, warmup, warmup_gamma,
                           frozen_modules)
    return jax.jit(step, donate_argnums=(0,))


def make_device_epoch_fn(model: CVNet, tx: optax.GradientTransformation,
                         batch_size: int, n_batches: int,
                         warmup: Tuple[int, int] = (0, 0),
                         warmup_gamma: Tuple[int, int] = (0, 0),
                         frozen_modules: Tuple[str, ...] = ()):
    """One compiled program for a whole epoch:
    (state, x, y, key) -> (state, mean metrics).

    Shuffles on device, then ``fori_loop``s the train step ``n_batches``
    times — zero host dispatch inside the epoch (the per-step path still
    pays one dispatch per step, which tunneled/remote devices feel).
    Metric means accumulate in the loop carry."""
    step = _device_step_fn(model, tx, batch_size, warmup, warmup_gamma,
                           frozen_modules)

    def epoch(state: TrainState, data_x, data_y, key):
        perm = jax.random.permutation(key, data_x.shape[0])
        ex = jnp.take(data_x, perm, axis=0)
        ey = jnp.take(data_y, perm, axis=0)

        def body(i, carry):
            st, sums = carry
            st, metrics = step(st, ex, ey, i)
            return st, {k: sums[k] + metrics[k] for k in sums}

        state, m0 = step(state, ex, ey, 0)       # seeds the sum structure
        state, sums = jax.lax.fori_loop(1, n_batches, body, (state, m0))
        return state, {k: v / n_batches for k, v in sums.items()}

    return jax.jit(epoch, donate_argnums=(0,))


def train_epochs_on_device(job, dataset: ArrayDataset, epochs: int,
                           batch_size: int,
                           warmup=(0, 0), warmup_gamma=(0, 0),
                           seed: int = 0,
                           log_every: Optional[int] = None,
                           dtype=jnp.float32,
                           fused: bool = True) -> Dict[str, float]:
    """Fast path: train job.state for ``epochs`` over a device-resident
    dataset.  Returns the last-epoch mean metrics.

    ``fused=True`` compiles the whole epoch (shuffle + fori_loop over
    steps) into one program — zero host dispatch inside an epoch, and the
    recorded metrics are epoch means; ``fused=False`` dispatches per step
    and records the last batch's metrics."""
    from .optimizers import build_optimizer, set_learning_rate
    model = job.model
    tx = build_optimizer(job.opt_cfg)
    frozen = tuple(job.training_parameters.get('frozen_modules') or ())
    dd = DeviceDataset(dataset, dtype=dtype)
    steps_per_epoch = dd.n // batch_size
    if steps_per_epoch == 0:
        # smaller-than-batch dataset: a no-op, as the per-step loop always
        # was (the fused program would trace a step unconditionally)
        return {}
    if fused:
        epoch_fn = make_device_epoch_fn(
            model, tx, batch_size, steps_per_epoch, tuple(warmup),
            tuple(warmup_gamma), frozen)
    else:
        step = make_device_train_step(
            model, tx, batch_size, tuple(warmup), tuple(warmup_gamma),
            frozen)
    state = job.state
    pkey = jax.random.PRNGKey(seed)
    metrics = {}
    last = {}
    # resume from the epochs already completed (job.trained, as the trainer
    # does) — state.epoch is the LAST trained index and would re-run it
    first_epoch = job.trained
    for epoch in range(first_epoch, first_epoch + epochs):
        state = state.replace(
            epoch=jnp.asarray(epoch, jnp.int32),
            opt_state=set_learning_rate(state.opt_state,
                                        job.opt_cfg.lr_at_epoch(epoch)))
        ekey = jax.random.fold_in(pkey, epoch)
        if fused:
            state, metrics = epoch_fn(state, dd.x, dd.y, ekey)
        else:
            ex, ey = dd.shuffled(ekey)
            for i in range(steps_per_epoch):
                state, metrics = step(state, ex, ey, i)
        last = jax.device_get({k: v for k, v in metrics.items()})
        job.train_history[epoch + 1] = {
            'train_loss': {k: float(v) for k, v in last.items()
                           if k in model.cfg.loss_components},
            'lr': job.opt_cfg.lr_at_epoch(epoch)}
        job.train_history['epochs'] = epoch + 1
        if log_every and (epoch + 1) % log_every == 0:
            print('epoch {:4d}: total {:.4f}'.format(
                epoch + 1, float(last.get('total', float('nan')))))
    job.state = state
    return {k: float(v) for k, v in last.items()}

"""Explicit-collective data-parallel train step via shard_map.

The default path (`train/steps.py` + `parallel/mesh.py`) lets GSPMD insert
collectives from sharding annotations.  This module is the explicit
alternative — per-device local forward/backward and a `jax.lax.pmean` of the
gradients over the 'data' axis (the classic SPMD recipe; ICI all-reduce) —
useful when you want deterministic control over where the collective
happens or to sidestep a GSPMD partitioning surprise.

Per-device RNG: the step key is folded with the device's axis index so each
shard draws independent latent noise (global-batch semantics).
"""

from typing import Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.cvnet import CVNet
from ..models.evaluate import evaluate
from ..ops.sigma import update_sigma_rmse
from ..train.state import TrainState, grad_mask, apply_grad_mask
from ..train.steps import warmup_weight


def make_shard_map_train_step(model: CVNet, tx: optax.GradientTransformation,
                              mesh: Mesh,
                              warmup: Tuple[int, int] = (0, 0),
                              warmup_gamma: Tuple[int, int] = (0, 0),
                              frozen_modules: Tuple[str, ...] = (),
                              split_sampling_per_shard: bool = True,
                              donate: bool = True):
    """(state, x, y) -> (state, metrics) with explicit pmean over 'data'.

    state replicated; x/y sharded on the leading axis.  BN models are not
    supported on this path (batch_stats would need a psum'd update rule).
    ``split_sampling_per_shard=False`` keeps the sampling key identical on
    every shard, which makes the step numerically comparable to the global
    GSPMD step when sampling is disabled (L=1, beta=0)."""
    cfg = model.cfg
    assert not cfg.has_batch_norm, 'shard_map path does not handle BN state'

    def local_step(state: TrainState, x, y):
        idx = jax.lax.axis_index('data')
        rng, sub = jax.random.split(state.rng)
        if split_sampling_per_shard:
            sub = jax.random.fold_in(sub, idx)
        kl_w = warmup_weight(state.epoch, warmup)
        g_w = warmup_weight(state.epoch, warmup_gamma)

        def loss_fn(params):
            out = evaluate(model, {'params': params}, x, y, rng=sub,
                           sigma_state=state.sigma_state, train=True,
                           with_beta=True, kl_var_weighting=kl_w,
                           gamma_weighting=g_w, native_scores=True)
            return jnp.mean(out.losses['total']), out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        # the explicit ICI all-reduce
        grads = jax.lax.pmean(grads, 'data')
        m = grad_mask(model, state.params, frozen_modules)
        grads = apply_grad_mask(model, grads, m, state.epoch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        updates = apply_grad_mask(model, updates, m, state.epoch)
        params = optax.apply_updates(state.params, updates)
        # out.sigma_state tracked the LOCAL shard's batch mse; rebuild the
        # rmse/decay update from the global-batch mean so the persisted sigma
        # matches the GSPMD step (out_specs=P() would otherwise keep shard 0's).
        scfg = cfg.sigma_cfg
        sig = out.sigma_state
        if scfg.coded:
            sig = sig.replace(data=jax.lax.pmean(sig.data, 'data'))
        elif cfg.x_is_generated:
            g_mse = jax.lax.pmean(out.measures['mse'], 'data')
            sig = update_sigma_rmse(scfg, state.sigma_state,
                                    jnp.sqrt(jnp.maximum(g_mse, 0.0)))
        new_state = state.replace(params=params, opt_state=opt_state,
                                  sigma_state=sig, rng=rng,
                                  step=state.step + 1)
        metrics = {k: jax.lax.pmean(jnp.mean(v), 'data')
                   for k, v in out.losses.items()}
        metrics['grad_norm'] = optax.global_norm(grads)
        return new_state, metrics

    n_batch_dims_x = 1 + len(cfg.input_shape)
    x_spec = P('data', *([None] * (n_batch_dims_x - 1)))
    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), x_spec, P('data')),
        out_specs=(P(), P()),
        check_vma=False)

    # donate the input TrainState like train/steps.py:80 — without it XLA
    # keeps the old params+opt_state alive across the update (2x HBM)
    step = jax.jit(lambda state, x, y: sharded(state, x, y),
                   donate_argnums=(0,) if donate else ())
    return step


def replicate_state(mesh: Mesh, state: TrainState) -> TrainState:
    return jax.device_put(state, NamedSharding(mesh, P()))


def shard_batch(mesh: Mesh, x, y):
    nd = x.ndim
    return (jax.device_put(x, NamedSharding(mesh, P('data', *([None] * (nd - 1))))),
            jax.device_put(y, NamedSharding(mesh, P('data'))))

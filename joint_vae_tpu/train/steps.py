"""Jitted train / eval steps.

The hot loop of ref ``train_model`` (cvae.py:2424-2479) becomes one compiled
XLA program: evaluate -> grad -> mask -> clip -> update, with the warmup
ramps computed on-device from the epoch counter so a single compilation
serves the whole run.
"""

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.cvnet import CVNet
from ..models.evaluate import evaluate
from .state import TrainState, grad_mask, apply_grad_mask


def warmup_weight(epoch, warmup: Tuple[int, int]):
    """clip((epoch + 1 - start) / (length + 1), 0, 1) — ref cvae.py:2432."""
    return jnp.clip((epoch + 1.0 - warmup[0]) / (warmup[1] + 1.0), 0.0, 1.0)


def make_train_step(model: CVNet, tx: optax.GradientTransformation,
                    warmup: Tuple[int, int] = (0, 0),
                    warmup_gamma: Tuple[int, int] = (0, 0),
                    donate: bool = True,
                    frozen_modules: Tuple[str, ...] = ()):
    """Build the compiled train step: (state, x, y) -> (state, metrics).

    metrics: dict of scalar batch means of each loss component + measures.
    """
    cfg = model.cfg
    has_bn = cfg.has_batch_norm

    def step(state: TrainState, x: jax.Array, y: jax.Array):
        rng, sub = jax.random.split(state.rng)
        kl_w = warmup_weight(state.epoch, warmup)
        g_w = warmup_weight(state.epoch, warmup_gamma)

        def loss_fn(params):
            variables = {'params': params}
            if state.batch_stats is not None:
                variables['batch_stats'] = state.batch_stats
            res = evaluate(model, variables, x, y,
                           rng=sub, sigma_state=state.sigma_state,
                           train=True, with_beta=True,
                           kl_var_weighting=kl_w, gamma_weighting=g_w,
                           return_bn_updates=has_bn, native_scores=True)
            out, bn_updates = res if has_bn else (res, None)
            return jnp.mean(out.losses['total']), (out, bn_updates)

        (loss, (out, bn_updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        m = grad_mask(model, state.params, frozen_modules)
        grads = apply_grad_mask(model, grads, m, state.epoch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        # frozen params must receive NO update at all (torch requires_grad
        # semantics): weight decay inside tx would otherwise still move them.
        updates = apply_grad_mask(model, updates, m, state.epoch)
        params = optax.apply_updates(state.params, updates)

        new_state = state.replace(
            params=params, opt_state=opt_state,
            batch_stats=(bn_updates['batch_stats'] if bn_updates is not None
                         else state.batch_stats),
            sigma_state=out.sigma_state, rng=rng, step=state.step + 1)

        metrics = {k: jnp.mean(v) for k, v in out.losses.items()}
        metrics.update(out.measures)
        metrics['grad_norm'] = optax.global_norm(grads)
        if cfg.y_is_decoded:
            # running train accuracy from the sample-mean logits
            metrics['train_acc'] = jnp.mean(
                (jnp.argmax(out.logits, axis=-1) == y).astype(jnp.float32))
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model: CVNet, with_labels: bool, L: Optional[int] = None,
                   iws: bool = True):
    """Compiled evaluation step returning the full per-item loss dict (for
    recorders / scoring) plus logits — the engine behind accuracy and OOD
    scoring (ref cvae.py:1316-1330, 1620-1700)."""
    cfg = model.cfg

    @functools.partial(jax.jit, static_argnames=())
    def step(variables: Dict[str, Any], sigma_state, x, y, key):
        out = evaluate(model, variables, x, y if with_labels else None,
                       rng=key, sigma_state=sigma_state, train=False,
                       L=L, compute_iws=iws)
        return out.losses, out.logits, out.mu, out.log_var

    return step

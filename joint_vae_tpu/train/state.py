"""TrainState: the explicit, functional equivalent of the reference's
stateful module attributes (sigma mutation, prior thawing, optimizer state,
RNG, epoch counters — cvae.py:256,402-407, module/optimizers.py)."""

from typing import Any, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp

from ..models.cvnet import CVNet
from ..ops.sigma import SigmaState, init_sigma_state
from .optimizers import OptimizerConfig, build_optimizer


@flax.struct.dataclass
class TrainState:
    params: Dict[str, Any]
    batch_stats: Optional[Dict[str, Any]]
    opt_state: Any
    sigma_state: SigmaState
    rng: jax.Array
    epoch: jax.Array          # int32 scalar
    step: jax.Array           # int32 scalar

    @property
    def variables(self) -> Dict[str, Any]:
        v = {'params': self.params}
        if self.batch_stats is not None:
            v['batch_stats'] = self.batch_stats
        return v


def create_train_state(model: CVNet, key: jax.Array,
                       opt_cfg: OptimizerConfig,
                       batch_size: int = 2) -> TrainState:
    """Initialize params + optimizer state from the model config."""
    cfg = model.cfg
    x = jnp.zeros((batch_size, *cfg.input_shape), jnp.float32)
    y = jnp.zeros((batch_size,), jnp.int32)
    k_params, k_sampling, k_state = jax.random.split(key, 3)
    variables = model.init({'params': k_params, 'sampling': k_sampling},
                           x, y if cfg.y_is_coded else None, train=False)
    params = variables['params']
    batch_stats = variables.get('batch_stats')
    tx = build_optimizer(opt_cfg)
    opt_state = tx.init(params)
    return TrainState(params=params, batch_stats=batch_stats,
                      opt_state=opt_state,
                      sigma_state=init_sigma_state(cfg.sigma_cfg),
                      rng=k_state,
                      epoch=jnp.zeros((), jnp.int32),
                      step=jnp.zeros((), jnp.int32))


def grad_mask(model: CVNet, params, frozen_modules=()) -> Dict[str, Any]:
    """Static 0/1 mask over params: which leaves may train.

    Prior means train iff learned_means (thaw factor applied separately);
    prior var trains iff var_dim != 'scalar'; sigma_param trains iff
    cfg.sigma.learned (ref requires_grad semantics); ``frozen_modules``
    (pretrained features/upsampler, ref conv.py:237-243) never train."""
    cfg = model.cfg
    frozen = tuple(frozen_modules)

    def mask_for(path_names, leaf):
        # prefix match: 'features' freezes 'features_stack' etc. (user-facing
        # module names are shorter than some internal flax scope names)
        if frozen and any(str(n).startswith(f) for n in path_names
                          for f in frozen):
            return 0.0
        if 'prior' in path_names:
            if 'mean' in path_names:
                return 1.0 if cfg.prior.learned_means else 0.0
            if 'var_param' in path_names:
                return 1.0 if cfg.prior.learned_var else 0.0
        if 'sigma_param' in path_names:
            return 1.0 if cfg.sigma_cfg.learned else 0.0
        return 1.0

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    vals = []
    for path, leaf in flat:
        names = [getattr(p, 'key', getattr(p, 'name', str(p))) for p in path]
        vals.append(mask_for(names, leaf))
    return jax.tree_util.tree_unflatten(treedef, vals)


def apply_grad_mask(model: CVNet, grads, mask, epoch):
    """mask * grads, with the prior-mean thaw factor (epoch >= freeze_means)
    applied dynamically (ref thaw_means, module/priors.py:134-140)."""
    cfg = model.cfg
    thaw = jnp.asarray(1.0)
    if cfg.prior.learned_means and cfg.prior.freeze_means:
        thaw = (epoch >= cfg.prior.freeze_means).astype(jnp.float32)

    def scale(path, g, m):
        names = [getattr(p, 'key', getattr(p, 'name', str(p))) for p in path]
        s = m
        if 'prior' in names and 'mean' in names:
            s = m * thaw
        return g * s

    return jax.tree_util.tree_map_with_path(scale, grads, mask)

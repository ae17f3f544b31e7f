"""Optimizer wrapper: adam/sgd + per-epoch exponential LR decay + grad clipping.

TPU-native re-design of ref ``module/optimizers.py`` (Optimizer, :14-134):

- optax chain instead of torch.optim; LR decay is a *per-epoch* exponential
  (gamma = 1 - lr_decay, ref :51-53) injected as a dynamic hyperparameter so
  one compiled train step serves all epochs;
- gradient-norm clipping (ref ``clip``, :79-81);
- trainability masks: frozen prior means / scalar prior variance / non-learned
  sigma never receive updates (ref requires_grad flags); prior-mean *thawing*
  at epoch >= freeze_means (ref ``thaw_means``, module/priors.py:134-140) is a
  dynamic 0/1 factor applied in the train step, so no recompilation at thaw.
"""

import dataclasses
from typing import Any, Dict, Optional

import jax.numpy as jnp
import optax

DEFAULT_LR = {'sgd': 0.01, 'adam': 0.001}


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    optim_type: str = 'adam'
    lr: float = 0.0                      # 0 -> per-type default (ref :22-23)
    lr_decay: float = 0.0                # per-epoch: lr *= (1 - lr_decay)
    weight_decay: float = 0.0
    grad_clipping: Optional[float] = None
    momentum: float = 0.0
    nesterov: bool = False
    betas: tuple = (0.9, 0.999)
    amsgrad: bool = False

    def __post_init__(self):
        assert self.optim_type in ('sgd', 'adam'), self.optim_type
        if not self.lr:
            object.__setattr__(self, 'lr', DEFAULT_LR[self.optim_type])

    @property
    def params(self) -> Dict[str, Any]:
        """JSON summary mirroring ref Optimizer.params (:25-34)."""
        return {'optim_type': self.optim_type, 'lr': self.lr,
                'lr_decay': self.lr_decay, 'weight_decay': self.weight_decay,
                'grad_clipping': self.grad_clipping}

    def lr_at_epoch(self, epoch: int) -> float:
        return self.lr * (1.0 - self.lr_decay) ** epoch


def build_optimizer(cfg: OptimizerConfig) -> optax.GradientTransformation:
    """optax chain with an injectable learning_rate hyperparam."""
    chain = []
    if cfg.grad_clipping:
        chain.append(optax.clip_by_global_norm(cfg.grad_clipping))

    if cfg.optim_type == 'adam':
        @optax.inject_hyperparams
        def core(learning_rate):
            # torch optim.Adam couples weight decay INTO the gradient before
            # the adaptive-moment update (L2-in-gradient), unlike AdamW's
            # decoupled decay — the reference uses the former
            # (module/optimizers.py:41-49).
            inner = []
            if cfg.weight_decay:
                inner.append(optax.add_decayed_weights(cfg.weight_decay))
            inner.append(optax.scale_by_adam(b1=cfg.betas[0], b2=cfg.betas[1]))
            inner.append(optax.scale(-learning_rate))
            return optax.chain(*inner)
    else:
        @optax.inject_hyperparams
        def core(learning_rate):
            inner = []
            if cfg.weight_decay:
                inner.append(optax.add_decayed_weights(cfg.weight_decay))
            if cfg.momentum:
                inner.append(optax.trace(decay=cfg.momentum,
                                         nesterov=cfg.nesterov))
            inner.append(optax.scale(-learning_rate))
            return optax.chain(*inner)

    chain.append(core(learning_rate=cfg.lr))
    return optax.chain(*chain)


def set_learning_rate(opt_state, lr):
    """Update the injected LR (per-epoch decay without recompiling)."""
    return _map_inject(opt_state, lr)


def _map_inject(state, lr):
    if hasattr(state, 'hyperparams') and 'learning_rate' in state.hyperparams:
        hp = dict(state.hyperparams)
        hp['learning_rate'] = jnp.asarray(lr, jnp.asarray(hp['learning_rate']).dtype)
        return state._replace(hyperparams=hp)
    if isinstance(state, tuple):
        children = tuple(_map_inject(s, lr) for s in state)
        # namedtuple optimizer states (EmptyState, ScaleByAdamState, ...)
        # need positional-splat reconstruction, not a single generator arg
        if hasattr(state, '_fields'):
            return type(state)(*children)
        return children
    return state


def get_learning_rate(opt_state) -> float:
    found = []

    def walk(state):
        if isinstance(state, tuple) and not hasattr(state, 'hyperparams'):
            for s in state:
                walk(s)
        elif hasattr(state, 'hyperparams') and 'learning_rate' in state.hyperparams:
            found.append(float(state.hyperparams['learning_rate']))
    walk(opt_state)
    return found[0] if found else float('nan')


def format_optimizer(cfg: OptimizerConfig, level: int = 10) -> str:
    """Human string mirroring ref Optimizer.__format__ (:83-115), used in the
    job-directory naming scheme."""
    s_ = [cfg.optim_type, 'lr={:g}'.format(cfg.lr)]
    if cfg.lr_decay:
        s_.append('decay={:g}'.format(cfg.lr_decay))
    else:
        level -= 1
    extras = []
    if cfg.optim_type == 'sgd':
        if cfg.momentum:
            extras.append('momentum={:g}'.format(cfg.momentum))
        if cfg.nesterov:
            extras.append('nesterov')
    if cfg.weight_decay:
        extras.append('weight_decay={:g}'.format(cfg.weight_decay))
    if extras:
        s_.append('--'.join(extras))
    return '--'.join(s_[:level])

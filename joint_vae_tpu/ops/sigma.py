"""Output-noise scale sigma with its five modes.

Ref ``Sigma`` (module/vae_layers/layers.py:73-213), a torch Parameter subclass
with stateful mutation.  Here it is split into a static :class:`SigmaConfig`
and an explicit :class:`SigmaState` pytree carried in the train state — the
TPU-functional equivalent of the reference's in-place ``.data`` updates.

Modes:
- constant:        fixed value (not log-space, not trained)
- learned:         log-sigma parameter, trained by the optimizer
- rmse:            sigma tracks the per-batch RMSE (decay=1, reach=1)
- decay-to-rmse:   constant start, decays toward reach*rmse with max_step
- coded:           emitted per-sample by an encoder head (log-space); the
                   state only records the batch mean for reporting
"""

import dataclasses
import math
from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SigmaConfig:
    value: Optional[float] = None
    learned: bool = False
    is_rmse: bool = False
    sdim: int = 1
    input_dim: Optional[Tuple[int, ...]] = None   # image shape when coded
    reach: float = 1.0
    decay: float = 0.0
    max_step: Optional[float] = None
    sigma0: Optional[float] = None
    is_log: bool = False

    def __post_init__(self):
        # normalization mirroring ref Sigma.__new__/__init__ (layers.py:75-114)
        assert self.value is not None or self.is_rmse or self.input_dim
        if self.is_rmse or (self.input_dim and self.value is None):
            object.__setattr__(self, 'value', 0.0)
        if self.input_dim:
            object.__setattr__(self, 'learned', True)
        if self.learned:
            object.__setattr__(self, 'is_log', True)
        assert not (self.learned and self.is_rmse)
        assert not (self.decay and self.learned and not self.input_dim)
        if self.sigma0 is None and not self.is_rmse:
            object.__setattr__(self, 'sigma0', self.value)
        object.__setattr__(self, 'decay', 1.0 if self.is_rmse else self.decay)
        object.__setattr__(self, 'reach',
                           self.reach if (self.decay or self.is_rmse) else None)

    @property
    def coded(self) -> bool:
        return bool(self.input_dim)

    @property
    def per_dim(self) -> bool:
        return self.sdim != 1

    @property
    def output_dim(self):
        """Shape of the encoder sigma head output when coded
        (ref layers.py:111-114)."""
        if not self.coded:
            return None
        return tuple(self.input_dim) if self.per_dim else (1,) * len(self.input_dim)

    @property
    def params(self) -> dict:
        d = {k: getattr(self, k) for k in
             ('value', 'learned', 'is_rmse', 'sdim', 'input_dim',
              'reach', 'decay', 'max_step', 'sigma0', 'is_log')}
        if d['input_dim'] is not None:
            d['input_dim'] = list(d['input_dim'])
        return d

    def describe(self, state: 'SigmaState' = None) -> str:
        if self.is_rmse:
            if state is None or not bool(jnp.isfinite(state.rmse)):
                return 'rmse'
            return 'rmse ({:g})'.format(float(state.rmse))
        if self.coded:
            return 'coded {}'.format('mask' if self.per_dim else 'scalar')
        if self.learned:
            v = sigma_value(self, state) if state is not None else self.sigma0
            return '{:g}->rmse[l] ({:g})'.format(self.sigma0, v)
        if not self.decay:
            return '{:g}'.format(self.value)
        mult = '' if self.reach == 1 else '{:g}*'.format(self.reach)
        mx = '<{:g}'.format(self.max_step) if self.max_step else ''
        return '{:g}->{}rmse[-{:g}*{}]'.format(self.sigma0, mult, self.decay, mx)


@flax.struct.dataclass
class SigmaState:
    data: jax.Array          # (sdim,), log-space iff cfg.is_log
    rmse: jax.Array          # scalar, nan until first update


def init_sigma_state(cfg: SigmaConfig) -> SigmaState:
    v = cfg.value
    if cfg.is_log:
        v = math.log(v) if v > 0 else -30.0
    return SigmaState(data=jnp.full((cfg.sdim,), v, jnp.float32),
                      rmse=jnp.array(jnp.nan, jnp.float32))


def sigma_value(cfg: SigmaConfig, state: SigmaState) -> float:
    """RMS of the sigma vector (ref Sigma.value, layers.py:116-123)."""
    d = state.data
    v = jnp.exp(2.0 * d) if cfg.is_log else jnp.square(d)
    return jnp.sqrt(jnp.mean(v))


def update_sigma_rmse(cfg: SigmaConfig, state: SigmaState,
                      rmse: jax.Array) -> SigmaState:
    """Decay-to-rmse update (ref Sigma.update, layers.py:146-168).

    Pure: returns the new state.  No-op (except recording rmse) when learned
    or decay == 0.
    """
    state = state.replace(rmse=rmse)
    if cfg.learned or not cfg.decay:
        return state
    delta = cfg.decay * (cfg.reach * rmse - state.data)
    if cfg.max_step:
        delta = jnp.clip(delta, -cfg.max_step, cfg.max_step)
    return state.replace(data=state.data + delta)


def update_sigma_coded(cfg: SigmaConfig, state: SigmaState,
                       coded: jax.Array) -> SigmaState:
    """Record the batch-mean of the coded sigma head (ref Sigma.update(v=...),
    layers.py:150-157)."""
    flat = coded.reshape(-1, cfg.sdim) if cfg.per_dim else coded.reshape(-1, 1)
    return state.replace(data=jnp.mean(flat, axis=0))

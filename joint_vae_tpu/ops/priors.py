"""Latent prior families: gaussian / tilted / uniform-with-gaussian-tail.

TPU-first re-design of the reference ``module/priors.py``:

- Prior parameters are a plain pytree ``{'mean': (P, K), 'var_param': ...}``
  created by :func:`init_prior_params`; the (static) structure lives in
  :class:`PriorConfig`.  They are stored inside the model's flax params so the
  optimizer can train them (mean thawing / learned variance are handled with
  gradient masks, see ``train/optimizers.py``).
- All math is pure functions.  The class-conditional case supports two paths:
  a ``y``-gather path (labels given) and an *all-classes broadcast* path used
  by per-class evaluation — the class axis is a broadcast dim that XLA fuses,
  never a Python loop or a gather (ref expands ``mu`` when ``y.ndim == mu.ndim``,
  module/priors.py:263-267).

Parameterization (matching the reference):

- ``var_param`` encodes the *inverse* scale: for ``scalar``/``diag`` it is
  1/sigma (inv std); for ``full`` it is the inverse Cholesky factor M with
  Sigma^-1 = M^T M (ref module/priors.py:142-171).
- KL components (ref module/priors.py:252-326): ``trace`` = tr(S Sigma^-1),
  ``log_det`` = sum(log_var) (posterior), ``log_det_prior`` = log |Sigma|,
  ``distance`` = Mahalanobis(mu - mean_y), ``var_kl`` = trace - log_det +
  log_det_prior - K, and ``kl`` = (distance + w * var_kl) / 2.
- Tilted (ref module/priors.py:356-408): kl = (||mu - mean_y|| - tau)^2 / 2,
  var_kl = 0; log_density = gaussian log density - ||z|| (raw norm).
- Uniform-with-gaussian-tail (ref module/priors.py:411-491): KL of a uniform
  posterior (moment-matched to the gaussian encoder output) against a density
  that is flat on [-tau, tau] with gaussian tails.
"""

import dataclasses
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, jax.Array]

_LOG_2PI = math.log(2 * math.pi)


@dataclasses.dataclass(frozen=True)
class PriorConfig:
    """Static prior structure (hashable; safe to close over in jit)."""
    dim: int
    distribution: str = 'gaussian'        # gaussian | tilted | uniform
    num_priors: int = 1                   # 1 => unconditional
    var_dim: str = 'scalar'               # scalar | diag | full
    init_mean: Any = 0.0                  # float | 'onehot'
    mean_shift: float = 0.0
    learned_means: bool = False
    freeze_means: int = 0
    force_conditional: bool = False
    tau: float = 0.0                      # tilted: ~25; uniform: ~5
    seed: Optional[int] = None

    def __post_init__(self):
        assert self.distribution in ('gaussian', 'tilted', 'uniform'), self.distribution
        assert self.var_dim in ('scalar', 'diag', 'full'), self.var_dim
        if self.distribution in ('tilted', 'uniform'):
            # ref build_prior discards var_dim for these families (module/priors.py:46-52)
            object.__setattr__(self, 'var_dim', 'scalar')
        if self.num_priors == 1:
            object.__setattr__(self, 'learned_means', False)
        if self.distribution == 'tilted' and not self.tau:
            object.__setattr__(self, 'tau', 25.0)
        if self.distribution == 'uniform' and not self.tau:
            object.__setattr__(self, 'tau', 5.0)

    @property
    def conditional(self) -> bool:
        return self.num_priors > 1 or self.force_conditional

    @property
    def learned_var(self) -> bool:
        return self.var_dim != 'scalar'

    @property
    def params(self) -> Dict[str, Any]:
        """JSON-serializable summary, mirroring ref ``Prior.params``
        (module/priors.py:127-132, 370-371, 426-427)."""
        d = {'distribution': self.distribution, 'dim': self.dim,
             'init_mean': self.init_mean, 'var_dim': self.var_dim,
             'num_priors': self.num_priors}
        if self.conditional:
            d.update({'learned_means': self.learned_means,
                      'freeze_means': self.freeze_means})
        if self.distribution in ('tilted', 'uniform'):
            d['tau'] = self.tau
            d.pop('var_dim', None)
        return d

    @property
    def uniform_log_rho(self) -> float:
        """log rho(z) on [-tau, tau] for the uniform family
        (alpha, ref module/priors.py:423-424)."""
        tau = self.tau
        phi_tau = 0.5 * (1.0 + math.erf(tau / math.sqrt(2.0)))
        return math.log(2 * tau) - math.log(2 * phi_tau - 1)


def build_prior_config(dim: int, distribution: str = 'gaussian', **kw) -> PriorConfig:
    """Factory mirroring ref ``build_prior`` (module/priors.py:35-52)."""
    kw.pop('learned_means', None) if kw.get('num_priors', 1) == 1 else None
    kw = {k: v for k, v in kw.items() if v is not None}
    if distribution == 'gaussian':
        kw.pop('tau', None)
    return PriorConfig(dim=dim, distribution=distribution, **kw)


def init_prior_params(cfg: PriorConfig, key: jax.Array) -> Params:
    """Initialize the prior parameter pytree (ref module/priors.py:84-122)."""
    K, P = cfg.dim, cfg.num_priors
    if P == 1:
        mean = cfg.init_mean * jax.random.normal(key, (1, K)) + cfg.mean_shift
    elif cfg.init_mean == 'onehot':
        assert K >= P, 'K={} < C={}'.format(K, P)
        mean = jnp.eye(P, K)
    else:
        mean = float(cfg.init_mean) * jax.random.normal(key, (P, K)) + cfg.mean_shift

    if cfg.var_dim == 'scalar':
        v = jnp.array(1.0)
    elif cfg.var_dim == 'diag':
        v = jnp.ones((K,))
    else:
        v = jnp.eye(K)
    if cfg.conditional:
        v = jnp.stack([v] * P)
    return {'mean': mean.astype(jnp.float32), 'var_param': v.astype(jnp.float32)}


# ---------------------------------------------------------------------------
# internals
# ---------------------------------------------------------------------------

def _inv_trans(cfg: PriorConfig, var_param: jax.Array) -> jax.Array:
    """Inverse scale/Cholesky transform (ref inv_trans, module/priors.py:142-148)."""
    if cfg.var_dim == 'full':
        return jnp.tril(var_param)
    return var_param


def _log_det_per_class(cfg: PriorConfig, var_param: jax.Array) -> jax.Array:
    """log |Sigma| per class: (P,) if conditional else scalar
    (ref log_det_per_class, module/priors.py:173-186)."""
    t = _inv_trans(cfg, var_param)
    if cfg.var_dim == 'full':
        diag = jnp.diagonal(t, axis1=-2, axis2=-1)
        return -2.0 * jnp.sum(jnp.log(jnp.abs(diag)), axis=-1)
    if cfg.var_dim == 'diag':
        return -2.0 * jnp.sum(jnp.log(jnp.abs(t)), axis=-1)
    return -2.0 * cfg.dim * jnp.log(t)


def _select(cfg: PriorConfig, per_class: jax.Array, y: Optional[jax.Array]):
    """Gather a per-class quantity at labels y (or pass through when
    unconditional / all-classes broadcast)."""
    if not cfg.conditional or y is None:
        return per_class
    return jnp.take(per_class, y, axis=0)


def _centered(cfg: PriorConfig, params: Params, x: jax.Array,
              y: Optional[jax.Array], all_classes: bool) -> jax.Array:
    """x - mean_y.  ``all_classes`` broadcasts a leading class axis instead of
    gathering: x (..., K) -> (P, ..., K)."""
    mean = params['mean']
    if not cfg.conditional:
        return x - mean[0]
    if all_classes:
        m = mean.reshape((cfg.num_priors,) + (1,) * (x.ndim - 1) + (cfg.dim,))
        return x[None] - m
    return x - mean[y]


def _whiten(cfg: PriorConfig, var_param: jax.Array, u: jax.Array,
            y: Optional[jax.Array], all_classes: bool) -> jax.Array:
    """Apply the inverse-scale transform to centered latents
    (ref whiten, module/priors.py:188-209).

    u: centered latents, (..., K) or (P, ..., K) in all-classes mode."""
    t = _inv_trans(cfg, var_param)
    if not cfg.conditional:
        if cfg.var_dim == 'full':
            return jnp.einsum('ij,...j->...i', t, u)
        return u * t  # diag broadcast or scalar
    if all_classes:
        shape = (cfg.num_priors,) + (1,) * (u.ndim - 2)
        if cfg.var_dim == 'full':
            return jnp.einsum('p ij, p ... j -> p ... i', t, u)
        if cfg.var_dim == 'diag':
            return u * t.reshape(shape + (cfg.dim,))
        return u * t.reshape(shape + (1,))
    ty = jnp.take(t, y, axis=0)
    if cfg.var_dim == 'full':
        return jnp.einsum('...ij,...j->...i', ty, u)
    if cfg.var_dim == 'diag':
        return u * ty
    return u * ty[..., None]


def _mahala(cfg: PriorConfig, params: Params, x: jax.Array,
            y: Optional[jax.Array], all_classes: bool) -> jax.Array:
    x = x.astype(jnp.float32)
    if all_classes and cfg.conditional and cfg.var_dim in ('scalar', 'diag'):
        return _mahala_all_classes_matmul(cfg, params, x)
    u = _centered(cfg, params, x, y, all_classes)
    w = _whiten(cfg, params['var_param'], u, y, all_classes)
    return jnp.sum(jnp.square(w), axis=-1)


def _mahala_all_classes_matmul(cfg: PriorConfig, params: Params,
                               x: jax.Array) -> jax.Array:
    """All-classes Mahalanobis via the MXU instead of a (P, ..., K)
    broadcast: sum_k s_ck^2 (x_k - m_ck)^2 =
    (x^2) @ s2_c - 2 x @ (s2_c m_c) + sum_k s2_ck m_ck^2.

    Turns the K-reduction into matmuls (TPU-first; avoids materializing the
    P x batch x K intermediate the reference's expand creates).
    Output: (P, ...batch)."""
    mean = params['mean'].astype(jnp.float32)             # (P, K)
    vp = params['var_param'].astype(jnp.float32)
    P, K = mean.shape
    if cfg.var_dim == 'scalar':
        s2 = jnp.square(vp).reshape(P, 1)                 # (P, 1)
        s2_full = jnp.broadcast_to(s2, (P, K))
    else:
        s2_full = jnp.square(vp)                          # (P, K)
    x2 = jnp.square(x)
    quad = jnp.einsum('...k,pk->...p', x2, s2_full,
                      preferred_element_type=jnp.float32)
    cross = jnp.einsum('...k,pk->...p', x, s2_full * mean,
                       preferred_element_type=jnp.float32)
    const = jnp.sum(s2_full * jnp.square(mean), axis=-1)  # (P,)
    out = quad - 2.0 * cross + const
    return jnp.moveaxis(out, -1, 0)


def _prior_inv_var_diag(cfg: PriorConfig, var_param: jax.Array) -> jax.Array:
    """diag(Sigma^-1) per class (ref trace_prod_by_var, module/priors.py:227-250)."""
    t = _inv_trans(cfg, var_param)
    if cfg.var_dim == 'full':
        return jnp.sum(jnp.square(t), axis=-2)
    return jnp.square(t)


def mahala(cfg: PriorConfig, params: Params, x: jax.Array,
           y: Optional[jax.Array] = None, all_classes: bool = False) -> jax.Array:
    """Mahalanobis distance to the prior mean(s)."""
    return _mahala(cfg, params, x, y, all_classes)


# ---------------------------------------------------------------------------
# public: KL and log density
# ---------------------------------------------------------------------------

def prior_kl(cfg: PriorConfig, params: Params, mu: jax.Array, log_var: jax.Array,
             y: Optional[jax.Array] = None, var_weighting: float = 1.0,
             all_classes: bool = False) -> Dict[str, jax.Array]:
    """KL(q(z|x) || p(z|y)) in components.

    - mu, log_var: (..., K) posterior moments.
    - y: int labels broadcastable to mu's batch shape, or None.
    - all_classes: evaluate against every prior row; outputs gain a leading
      class axis (P, ...).  TPU-native replacement for the reference's
      build-y-and-expand trick (cvae.py:593-599 + module/priors.py:263-267).

    Returns dict with 'kl', 'distance' (zdist), 'var_kl' (+ 'trace',
    'log_det', 'log_det_prior' for gaussian).
    """
    mu = mu.astype(jnp.float32)
    log_var = log_var.astype(jnp.float32)
    # Reference broadcast quirk: y with same ndim as mu (built labels (C, N)
    # vs mu (N, K)) means "all classes". We honor it via all_classes only.
    if cfg.distribution == 'gaussian':
        return _gaussian_kl(cfg, params, mu, log_var, y, var_weighting, all_classes)
    if cfg.distribution == 'tilted':
        return _tilted_kl(cfg, params, mu, log_var, y, all_classes)
    return _uniform_kl(cfg, params, mu, log_var, y, var_weighting, all_classes)


def _gaussian_kl(cfg, params, mu, log_var, y, var_weighting, all_classes):
    var = jnp.exp(log_var)
    inv_var_diag = _prior_inv_var_diag(cfg, params['var_param'])  # (P, K') or (K') or ()
    ldp = _log_det_per_class(cfg, params['var_param'])            # (P,) or ()

    if cfg.conditional:
        if all_classes:
            shape = (cfg.num_priors,) + (1,) * (mu.ndim - 1)
            # trace on the MXU: sum_k var_k * ivd_ck as a matmul
            if cfg.var_dim == 'scalar':
                ivd_full = jnp.broadcast_to(
                    inv_var_diag.reshape(cfg.num_priors, 1),
                    (cfg.num_priors, cfg.dim))
            else:
                ivd_full = inv_var_diag
            trace = jnp.moveaxis(
                jnp.einsum('...k,pk->...p', var, ivd_full,
                           preferred_element_type=jnp.float32), -1, 0)
            log_det_prior = jnp.broadcast_to(
                ldp.reshape(shape), (cfg.num_priors,) + mu.shape[:-1])
            log_det = jnp.broadcast_to(jnp.sum(log_var, axis=-1),
                                       log_det_prior.shape)
        else:
            ivd = jnp.take(inv_var_diag, y, axis=0)
            if cfg.var_dim == 'scalar':
                ivd = ivd[..., None]
            trace = jnp.sum(var * ivd, axis=-1)
            log_det_prior = jnp.take(ldp, y, axis=0)
            log_det = jnp.sum(log_var, axis=-1)
    else:
        ivd = inv_var_diag if cfg.var_dim != 'scalar' else inv_var_diag[None]
        trace = jnp.sum(var * ivd, axis=-1)
        log_det = jnp.sum(log_var, axis=-1)
        log_det_prior = jnp.broadcast_to(ldp, log_det.shape)

    distance = _mahala(cfg, params, mu, y, all_classes)
    var_kl = trace - log_det + log_det_prior - cfg.dim
    kl = 0.5 * (distance + var_weighting * var_kl)
    return {'trace': trace, 'log_det': log_det, 'log_det_prior': log_det_prior,
            'distance': distance, 'var_kl': var_kl, 'kl': kl}


def _tilted_kl(cfg, params, mu, log_var, y, all_classes):
    distance = _mahala(cfg, params, mu, y, all_classes)
    mu_norm = jnp.sqrt(distance)
    kl = 0.5 * jnp.square(mu_norm - cfg.tau)
    return {'distance': distance, 'mu_norm': mu_norm,
            'var_kl': jnp.zeros_like(mu_norm), 'kl': kl}


def _uniform_kl(cfg, params, mu, log_var, y, var_weighting, all_classes):
    tau, alpha, c = cfg.tau, cfg.uniform_log_rho, _LOG_2PI
    mu_c = _centered(cfg, params, mu, y, all_classes)
    if all_classes and cfg.conditional:
        log_var = jnp.broadcast_to(log_var[None], mu_c.shape)
    distance = jnp.square(mu_c)                       # per-dim (ref :453)
    span = 2 * math.sqrt(3.0) * jnp.exp(0.5 * log_var)
    a = mu_c - 0.5 * span
    b = mu_c + 0.5 * span
    a_ = jnp.clip(a, -tau, tau)
    b_ = jnp.clip(b, -tau, tau)
    elogq = -0.5 * log_var - 0.5 * math.log(12.0)     # -log(span)
    neg_elogrho = (c + distance + jnp.square(span) / 12) / 2
    neg_elogrho += (alpha - c / 2) * (b_ - a_) / span
    neg_elogrho -= (b_ ** 3 - a_ ** 3) / span / 6
    var_kl = jnp.sum(elogq + alpha, axis=-1)
    kl = jnp.maximum(jnp.sum(elogq, axis=-1) + jnp.sum(neg_elogrho, axis=-1), var_kl)
    # branch-free so a traced warmup weighting works (adds 0 when w == 1)
    kl = kl + (var_weighting - 1.0) * var_kl
    return {'distance': jnp.sum(distance, axis=-1),
            'var_kl': 2 * var_kl, 'kl': kl}


def prior_log_density(cfg: PriorConfig, params: Params, z: jax.Array,
                      y: Optional[jax.Array] = None,
                      all_classes: bool = False) -> jax.Array:
    """log p(z|y) (ref log_density: module/priors.py:328-342, 381-383, 478-491)."""
    z = z.astype(jnp.float32)
    if cfg.distribution == 'uniform':
        zc = _centered(cfg, params, z, y, all_classes)
        tail = -_LOG_2PI / 2 - jnp.square(zc) / 2
        logp = jnp.where(jnp.abs(zc) > cfg.tau, tail, -cfg.uniform_log_rho)
        return jnp.sum(logp, axis=-1)

    u = _mahala(cfg, params, z, y, all_classes)
    ldp = _log_det_per_class(cfg, params['var_param'])
    if cfg.conditional:
        if all_classes:
            ldp = ldp.reshape((cfg.num_priors,) + (1,) * (u.ndim - 1))
        else:
            ldp = jnp.take(ldp, y, axis=0)
    logd = -_LOG_2PI * cfg.dim / 2 - u / 2 - ldp / 2
    if cfg.distribution == 'tilted':
        # tilt by the *raw* z norm, not centered (ref module/priors.py:381-383)
        zn = jnp.linalg.norm(z, axis=-1)
        logd = logd - (zn[None] if all_classes and cfg.conditional and zn.ndim == logd.ndim - 1
                       else zn)
    return logd


def trainable_mask(cfg: PriorConfig) -> Dict[str, bool]:
    """Which prior leaves receive gradients (thawing handled dynamically):
    means iff learned_means (ref module/priors.py:105-106), var iff
    var_dim != 'scalar' (ref :122)."""
    return {'mean': bool(cfg.learned_means), 'var_param': cfg.learned_var}

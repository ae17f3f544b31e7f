"""WIM ("watermarking") alternate-prior fine-tuning.

Re-design of ref ``ft/wim.py``:

- the trained model keeps its frozen *original* prior; a frozen *alternate*
  prior (usually unconditional, mean-shifted or tilted) is added
  (``set_alternate_prior``, ref :95-105);
- evaluation on both priors produces '@'-suffixed loss twins
  (``evaluate_on_both_priors``, ref :114-130) — here a second evaluate()
  call with ``prior_override``;
- WIM score grammar (ref :132-201): for k in {kl: -1, zdist: -1/2, iws: +1,
  elbo(=-total): +1} with estimated labels y-hat,
    k~   = sign_k * losses[k][y-hat]
    k@   = logsumexp_c(sign_k * losses[k]) - sign_k * losses[k@]
    k~@  = sign_k * losses[k][y-hat]      - sign_k * losses[k@]
    softk~ = softmax_c(sign_k * losses[k])[y-hat]
- ``finetune_batch`` (ref :215-259): L = ELBO(train x, original prior)
  + alpha * ELBO(moving x, alternate prior with y=0).
"""

import dataclasses
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from ..models.cvnet import CVNet, CVNetConfig
from ..models.evaluate import evaluate
from ..ops.priors import PriorConfig, build_prior_config, init_prior_params
from ..save_load.jobs import Job

WIM_OOD_METHODS_PER_TYPE = {
    'vae': ['zdist', 'elbo', 'kl'],
    'cvae': ['zdist', 'zdist~', 'zdist@', 'zdist~@',
             'elbo', 'elbo~', 'elbo@', 'elbo~@'],
}
WIM_MISCLASS_METHODS_PER_TYPE = {'cvae': ['softzdist~', 'zdist~'], 'vae': []}

K_SIGN = {'kl': -1.0, 'zdist': -0.5, 'iws': 1.0, 'elbo': 1.0}


@dataclasses.dataclass
class WIMJob:
    """A trained Job plus a frozen alternate prior."""
    job: Job
    alternate_prior_cfg: Optional[PriorConfig] = None
    alternate_prior_params: Optional[Dict] = None
    ft_params: Dict = dataclasses.field(default_factory=dict)

    @property
    def model(self) -> CVNet:
        return self.job.model

    @property
    def cfg(self) -> CVNetConfig:
        return self.job.model_cfg

    def set_alternate_prior(self, key: Optional[jax.Array] = None, **p):
        """(ref ft/wim.py:95-105) — frozen, usually unconditional."""
        assert self.alternate_prior_cfg is None, 'alternate prior already set'
        p.setdefault('dim', self.cfg.latent_dim)
        dim = p.pop('dim')
        dist = p.pop('distribution', 'gaussian')
        self.alternate_prior_cfg = build_prior_config(dim, dist, **p)
        self.alternate_prior_params = init_prior_params(
            self.alternate_prior_cfg, key if key is not None
            else jax.random.PRNGKey(0))
        if not self.ft_params:
            self.ft_params = dict(p, dim=dim, distribution=dist)
        return self.alternate_prior_cfg

    # ------------------------------------------------------------------

    def evaluate_on_both_priors(self, variables, x, *, rng, sigma_state,
                                L: Optional[int] = None):
        """losses + '@' twins (ref ft/wim.py:114-130)."""
        model = self.model
        out = evaluate(model, variables, x, None, rng=rng,
                       sigma_state=sigma_state, train=False, L=L)
        alt = evaluate(model, variables, x, None, rng=rng,
                       sigma_state=sigma_state, train=False, L=L,
                       prior_override=(self.alternate_prior_cfg,
                                       self.alternate_prior_params))
        losses = dict(out.losses)
        losses.update({k + '@': v for k, v in alt.losses.items()
                       if not k.endswith('~')})
        return out.x_reco, out.logits, losses, out.measures

    def finetune_batch(self, state, x_in, y_in, x_mix, alpha: float = 0.1,
                       *, rng, tx, train_L: Optional[int] = None):
        """One fine-tuning step (ref ft/wim.py:215-259).  Returns
        (new_state, metrics)."""
        model = self.model
        alt = (self.alternate_prior_cfg, self.alternate_prior_params)
        import optax

        def loss_fn(params):
            variables = {'params': params}
            if state.batch_stats is not None:
                variables['batch_stats'] = state.batch_stats
            r1, r2 = jax.random.split(rng)
            # BatchNorm stays in inference mode during WIM tuning
            # (ref FTJob._recurse_train freezes BN, ft/job.py:98-111) —
            # also what makes train=True safe with immutable batch_stats
            o_in = evaluate(model, variables, x_in, y_in, rng=r1,
                            sigma_state=state.sigma_state, train=True,
                            bn_eval=True, with_beta=True, L=train_L,
                            native_scores=True)
            y_mix = jnp.zeros((x_mix.shape[0],), jnp.int32)
            o_mix = evaluate(model, variables, x_mix, y_mix, rng=r2,
                             sigma_state=state.sigma_state, train=True,
                             bn_eval=True, with_beta=True, L=train_L,
                             prior_override=alt, native_scores=True)
            L = (jnp.mean(o_in.losses['total'])
                 + alpha * jnp.mean(o_mix.losses['total']))
            return L, (o_in, o_mix)

        (L, (o_in, o_mix)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        # priors are frozen in WIM (ref ft/wim.py:31-32,104-105)
        grads = _zero_prior_grads(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        # zero the *updates* too: weight decay inside tx would otherwise
        # still shrink the frozen original prior every step (same
        # double-masking as train/steps.py)
        updates = _zero_prior_grads(updates)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(params=params, opt_state=opt_state,
                                  sigma_state=o_in.sigma_state,
                                  step=state.step + 1)
        metrics = {'total': L,
                   'in_total': jnp.mean(o_in.losses['total']),
                   'mix_total': jnp.mean(o_mix.losses['total'])}
        return new_state, metrics


def _zero_prior_grads(grads):
    if 'prior' in grads:
        grads = dict(grads)
        grads['prior'] = jax.tree_util.tree_map(jnp.zeros_like, grads['prior'])
    return grads


def wim_measures(cfg: CVNetConfig, losses: Dict[str, jax.Array],
                 methods: Sequence[str],
                 y_est: Optional[jax.Array] = None) -> Dict[str, jax.Array]:
    """WIM score grammar k~ / k@ / k~@ (ref ft/wim.py:132-201).

    losses: per-class losses (C, N) + '@' twins (N,) from the alternate
    prior; y_est: estimated labels (N,) (kl-argmin pseudo-labels).
    """
    losses = dict(losses)
    losses['elbo'] = -losses['total']
    if any('@' in m for m in methods):
        losses['elbo@'] = -losses['total@']

    per_class = cfg.losses_per_class
    out = {}
    for m in methods:
        base = m.rstrip('~@')
        soft = base.startswith('soft')
        k = base[4:] if soft else base
        sign = K_SIGN[k]
        signed = sign * losses[k]

        if m.endswith('~@'):
            assert y_est is not None
            at_y = jnp.take_along_axis(signed, y_est[None], axis=0)[0]
            out[m] = at_y - sign * losses[k + '@']
        elif m.endswith('@'):
            if per_class and signed.ndim > 1:
                agg = jax.scipy.special.logsumexp(signed, axis=0)
            else:
                agg = signed
            out[m] = agg - sign * losses[k + '@']
        elif m.endswith('~'):
            assert y_est is not None
            v = jax.nn.softmax(signed, axis=0) if soft else signed
            out[m] = jnp.take_along_axis(v, y_est[None], axis=0)[0]
        else:
            raise ValueError('not a wim method: {}'.format(m))
    return out


def is_wim_method(m: str) -> bool:
    return m[-1] in '~@'

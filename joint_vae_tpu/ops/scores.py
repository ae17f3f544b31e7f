"""OOD / misclassification score measures — ``batch_dist_measures`` as a pure
function (ref cvae.py:972-1085).

Given the per-item loss dict from the evaluation engine (per-class losses
shaped (C, N), per-input (N,)) and the sample-averaged logits, computes one
scalar score per input for every requested method.  Higher score = more
in-distribution (the ROC convention, ref cvae.py:1857).

Method grammar: base scores ('elbo', 'iws', 'kl', 'zdist', 'mse', 'logits',
'baseline', 'soft<k>[-T]', 'max/sum/mean/std/mag/nstd/hyz/IYx') with the ROC
suffixes '-2s' / '-a-p-q' stripped here (they change the test geometry, not
the measure); starred methods ('odin*', 'softkl*', ...) are expanded into
parameter grids by ``develop_starred_methods``.
"""

import math
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp

from ..models.cvnet import CVNetConfig, METHODS_PARAMS


def develop_starred_methods(methods: Sequence[str],
                            methods_params: Dict[str, List[str]] = None,
                            add_starred: bool = False) -> List[str]:
    """'odin*' -> the full ODIN parameter grid, etc.
    (ref utils/save_load/dictify.py:198-213)."""
    methods_params = methods_params or METHODS_PARAMS
    out = []
    for m in methods:
        if m.endswith('*'):
            out.extend(methods_params.get(m[:-1], []))
            if add_starred:
                out.append(m)
        else:
            out.append(m)
    return out


def strip_roc_suffix(method: str) -> str:
    if method.endswith('-2s'):
        return method[:-3]
    if '-a-' in method:
        return method.split('-a-')[0]
    return method


def batch_dist_measures(cfg: CVNetConfig, logits, losses: Dict[str, jax.Array],
                        methods: Sequence[str]) -> Dict[str, jax.Array]:
    """Scores per method; each output is (N,) float32."""
    C = cfg.num_labels
    per_class = cfg.losses_per_class

    loss = losses['total']
    logp = -loss.astype(jnp.float32)
    if per_class:
        logp_max = jnp.max(logp, axis=0)
        d_logp = logp - logp_max[None]
    else:
        logp_max = logp
        d_logp = jnp.zeros_like(logp)

    iws = losses.get('iws')
    if iws is None and any('iws' in m for m in methods):
        iws = -losses['total']     # ref fallback warning (cvae.py:992-994)
    if iws is not None and per_class:
        iws_max = jnp.max(iws, axis=0)
        d_iws = iws - iws_max[None]

    out: Dict[str, jax.Array] = {}
    for m_full in methods:
        m = strip_roc_suffix(m_full)

        if m and m[-1] in '~@':
            # WIM variants (k~ / k@ / k~@) score from the recorded loss
            # twins + estimated labels (ft/wim.py grammar); reachable here
            # when replaying a WIM job's recorders through the engines
            from ..ft.wim import wim_measures
            y_est = losses.get('y_est_already')
            if y_est is not None:
                y_est = jnp.asarray(y_est).astype(jnp.int32)
            out[m_full] = wim_measures(cfg, losses, [m],
                                       y_est=y_est)[m].astype(jnp.float32)
            continue

        if m == 'elbo':
            v = logp_max if per_class else logp
        elif m == 'iws':
            if per_class:
                v = jnp.log(jnp.sum(jnp.exp(d_iws), axis=0)) + iws_max
                if not cfg.is_jvae:
                    v = v + math.log(C)
            else:
                v = iws
        elif m == 'sum':
            v = jnp.log(jnp.sum(jnp.exp(d_logp), axis=0)) + logp_max
        elif m == 'max':
            v = logp_max
        elif m == 'softiws':
            v = jnp.max(jax.nn.softmax(iws, axis=0), axis=0)
        elif m.startswith('softiws-'):
            T = float(m[8:])
            # sign quirk kept from ref cvae.py:1028: -iws/T for the T grid
            v = jnp.max(jax.nn.softmax(-iws / T, axis=0), axis=0)
        elif m in ('soft', 'softkl'):
            v = jnp.max(jax.nn.softmax(-losses['kl'], axis=0), axis=0)
        elif m.startswith('softkl-'):
            T = float(m[7:])
            v = jnp.max(jax.nn.softmax(-losses['kl'] / T, axis=0), axis=0)
        elif m in ('zdist', 'kl', 'fisher_rao', 'mahala', 'kl_rec'):
            v = -losses[m] if cfg.is_vae else jnp.max(-losses[m], axis=0)
        elif m.startswith('soft') and '-' in m:
            T = float(m.split('-')[-1])
            k = m.split('-')[0][4:]
            v = jnp.max(jax.nn.softmax(-losses[k] / T, axis=0), axis=0)
        elif m == 'logits':
            v = jnp.max(logits, axis=-1)
        elif m.startswith('baseline'):
            T = float(m.split('-')[-1]) if '-' in m else 1.0
            v = jnp.max(jax.nn.softmax(logits / T, axis=-1), axis=-1)
        elif m == 'mag':
            # torch.median semantics: the LOWER middle element for even C
            # (ref cvae.py:1054), not numpy's two-element average
            v = logp_max - jnp.sort(logp, axis=0)[(logp.shape[0] - 1) // 2]
        elif m == 'std':
            # torch.std default is Bessel-corrected (ddof=1), ref cvae.py:1056
            v = jnp.std(logp, axis=0, ddof=1)
        elif m == 'mean':
            v = jnp.log(jnp.mean(jnp.exp(d_logp), axis=0)) + logp_max
        elif m == 'nstd':
            e = jnp.exp(d_logp)
            v = jnp.square(jnp.exp(jnp.log(jnp.std(e, axis=0, ddof=1))
                                   - jnp.log(jnp.mean(e, axis=0))))
        elif m == 'hyz':
            p = jax.nn.softmax(logits, axis=-1)
            v = jnp.sum(p * jnp.log(jnp.maximum(p, 1e-30)), axis=-1)
        elif m == 'IYx':
            e = jnp.exp(d_logp)
            d_logp_x = jnp.log(jnp.mean(e, axis=0))
            v = (jnp.sum(d_logp * e, axis=0) / (C * jnp.exp(d_logp_x))
                 - d_logp_x)
        elif m == 'mse' and cfg.is_cvae:
            v = -losses['cross_x']
        elif m == 'wmse' and cfg.is_cvae:
            v = -losses['wmse']
        elif m.startswith('odin'):
            v = losses[m]            # precomputed by the ODIN grid pass
        else:
            raise ValueError('unknown method {}'.format(m_full))

        out[m_full] = v.astype(jnp.float32)
    return out


def predict_after_evaluate(cfg: CVNetConfig, logits, losses: Dict[str, jax.Array],
                           method: str = 'default'):
    """Label prediction from eval outputs (ref cvae.py:938-970)."""
    if method == 'default':
        method = cfg.predict_methods[0]
    if method is None:
        return jax.nn.softmax(logits, axis=-1)
    if method == 'mean':
        return jnp.argmax(jnp.mean(jax.nn.softmax(logits, axis=-1), axis=0),
                          axis=-1)
    if method == 'loss':
        return jnp.argmin(losses['total'], axis=0)
    if method == 'esty':
        return jnp.argmax(logits, axis=-1)
    if method == 'closest':
        return jnp.argmin(losses['zdist'], axis=0)
    if method == 'iws':
        return jnp.argmax(losses['iws'], axis=0)
    if method == 'already':
        return losses['y_est_already']
    raise ValueError('Unknown method {}'.format(method))

"""ODIN: input-gradient perturbation + temperature scaling.

Ref cvae.py:1646-1663 runs 2 + 21 forwards per temperature (10 temps) per
batch.  TPU-native restructuring:

- the unscaled logits are computed ONCE; every temperature's input gradient
  comes from one vjp of the logits function (logits do not depend on T);
- the 21 epsilon perturbations are batched into a single (E*N) forward per
  temperature;
- the whole grid is one jitted program.

Scores: max softmax(mean-sample logits / T) on x + eps * sign(d score / dx)
(gradient ascent on the max-softmax, ref :1651-1662).

Deliberate deviation: the reference never zeroes x.grad between
temperatures, so its perturbation direction at T_k is the sign of the
ACCUMULATED gradients of T_1..T_k (a latent torch bug); here every
temperature uses its own clean gradient.  Scores therefore match the
reference exactly only for the first temperature of a grid.
"""

from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from ..models.cvnet import CVNet, ODIN_TEMPS, ODIN_EPS


def make_odin_scores(model: CVNet, temps: Sequence[float] = None,
                     eps_grid: Sequence[float] = None):
    """Build a jitted (variables, x, rng) -> {'odin-T-eps': (N,)} function."""
    temps = list(temps if temps is not None else ODIN_TEMPS)
    eps_grid = list(eps_grid if eps_grid is not None else ODIN_EPS)

    def mean_logits_fn(variables, x, rng):
        out = model.apply(variables, x, None, train=False,
                          rngs={'sampling': rng})
        logits = out[1].astype(jnp.float32)
        return jnp.mean(logits[1:], axis=0) if logits.shape[0] > 1 else logits[0]

    @jax.jit
    def odin_scores(variables, x, rng) -> Dict[str, jax.Array]:
        ml, vjp_fn = jax.vjp(lambda xx: mean_logits_fn(variables, xx, rng), x)
        eps = jnp.asarray(eps_grid, jnp.float32)
        out = {}
        for T in temps:
            def score_sum(logits):
                return jnp.sum(jnp.max(jax.nn.softmax(logits / T, axis=-1),
                                       axis=-1))
            cot = jax.grad(score_sum)(ml)
            dx = jnp.sign(vjp_fn(cot)[0])
            # batch all epsilons into one forward: (E, N, ...) -> (E*N, ...)
            xp = x[None] + eps.reshape((-1,) + (1,) * x.ndim) * dx[None]
            flat = xp.reshape((-1,) + x.shape[1:])
            ml_p = mean_logits_fn(variables, flat, rng)
            s = jnp.max(jax.nn.softmax(ml_p / T, axis=-1), axis=-1)
            s = s.reshape(len(eps_grid), x.shape[0])
            for j, e in enumerate(eps_grid):
                out['odin-{:.0f}-{:.4f}'.format(T, e)] = s[j]
        return out

    return odin_scores

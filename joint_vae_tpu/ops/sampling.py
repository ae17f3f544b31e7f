"""Reparameterized latent sampling with the reference's (L+1, eps0=0) convention.

Ref ``Sampling`` (module/vae_layers/layers.py:216-250): every forward draws
L+1 samples where sample 0 is the pass-through mean (epsilon = 0); the epsilon
distribution is gaussian, or uniform(+-sqrt(3)) for the uniform-tail prior.

TPU-first: the sample axis is a leading broadcast dim generated in one
``random.normal`` call — downstream ops (decoder, losses) treat (L+1) x batch
as one large fused batch.
"""

from typing import Tuple

import jax
import jax.numpy as jnp

SQRT12 = 3.4641016151377544  # sqrt(12)


def draw_epsilon(key: jax.Array, shape: Tuple[int, ...], sampling_size: int,
                 distribution: str = 'gaussian',
                 dtype=jnp.float32) -> jax.Array:
    """(L+1, *shape) noise with eps[0] = 0."""
    full = (sampling_size + 1,) + tuple(shape)
    if distribution == 'gaussian':
        eps = jax.random.normal(key, full, dtype)
    elif distribution == 'uniform':
        eps = (jax.random.uniform(key, full, dtype) - 0.5) * SQRT12
    else:
        raise ValueError('{} for sampling unknown'.format(distribution))
    return eps.at[0].set(0.0)


def reparameterize(key: jax.Array, z_mean: jax.Array, z_log_var: jax.Array,
                   sampling_size: int, distribution: str = 'gaussian',
                   is_sampled: bool = True) -> Tuple[jax.Array, jax.Array]:
    """z = mu + exp(log_var / 2) * eps, eps (L+1, ...), eps[0] = 0.

    Returns (z, eps[1:]) like ref Sampling.forward
    (module/vae_layers/layers.py:230-244).  ``is_sampled=False`` collapses to
    the mean (used when L == 1 and beta == 0, ref cvae.py:276).
    """
    eps = draw_epsilon(key, z_mean.shape, sampling_size, distribution, z_mean.dtype)
    scale = jnp.exp(0.5 * z_log_var) * float(is_sampled)
    z = z_mean[None] + scale[None] * eps
    return z, eps[1:]

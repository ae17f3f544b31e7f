"""Encoder / decoder / classifier building blocks (flax).

Re-designs of ref ``module/vae_layers/layers.py``: the encoder is an MLP with
mu / log-var heads (log-var clipped to +-20, or forced), an optional
coded-sigma head, and optional one-hot label concatenation; the classifier is
an MLP on z.  Sampling lives in ``ops/sampling.py`` (functional), priors in
``ops/priors.py`` (parameters owned by :class:`PriorParams`).
"""

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.priors import PriorConfig, init_prior_params
from .conv import ACTIVATIONS

LOG_VAR_CLIP = 20.0


def onehot_encoding(y: jax.Array, num_labels: int, dtype=jnp.float32) -> jax.Array:
    """(...,) int -> (..., C) one-hot (ref module/vae_layers/misc.py:5)."""
    return jax.nn.one_hot(y, num_labels, dtype=dtype)


class MLP(nn.Module):
    """Linear+activation(+dropout) stack over the last axis."""
    dims: Sequence[int]
    activation: str = 'relu'
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        act = ACTIVATIONS[self.activation]
        for i, d in enumerate(self.dims):
            x = nn.Dense(d, dtype=self.dtype, name='dense_{}'.format(i))(x)
            x = act(x)
            if self.dropout:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class Encoder(nn.Module):
    """MLP encoder with mu / log-var (and optional sigma) heads
    (ref Encoder, layers.py:253-403).

    Input: flattened features (..., D) plus optional one-hot labels (..., C)
    concatenated on the last axis when ``y_is_coded``.
    Output: (z_mean, z_log_var, sigma_coded-or-None), each (..., K).
    """
    latent_dim: int
    num_labels: int
    intermediate_dims: Sequence[int] = (64,)
    y_is_coded: bool = False
    dropout: float = 0.0
    activation: str = 'relu'
    sigma_output_dim: int = 0           # flattened coded-sigma head size
    forced_variance: float = 0.0        # 0/False = learned log-var head
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, y_onehot: Optional[jax.Array] = None,
                 train: bool = False):
        if self.y_is_coded:
            assert y_onehot is not None, 'y is supposed to be an input of the net'
            x = jnp.concatenate(
                [x, jnp.broadcast_to(y_onehot, x.shape[:-1] + (self.num_labels,))],
                axis=-1)
        u = MLP(self.intermediate_dims, self.activation, self.dropout,
                self.dtype, name='dense_projs')(x, train)
        z_mean = nn.Dense(self.latent_dim, dtype=self.dtype, name='dense_mean')(u)
        if self.forced_variance:
            z_log_var = jnp.full_like(z_mean, float(np.log(self.forced_variance)))
        else:
            z_log_var = jnp.clip(
                nn.Dense(self.latent_dim, dtype=self.dtype, name='dense_log_var')(u),
                -LOG_VAR_CLIP, LOG_VAR_CLIP)
        sigma = None
        if self.sigma_output_dim:
            sigma = nn.Dense(self.sigma_output_dim, dtype=self.dtype, name='sigma')(u)
        return z_mean, z_log_var, sigma


class Classifier(nn.Module):
    """MLP classifier on z (ref Classifier, layers.py:456-483)."""
    num_labels: int
    intermediate_dims: Sequence[int] = ()
    activation: str = 'relu'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        act = ACTIVATIONS[self.activation]
        for i, d in enumerate(self.intermediate_dims):
            z = nn.Dense(d, dtype=self.dtype, name='dense_{}'.format(i))(z)
            z = act(z)
        return nn.Dense(self.num_labels, dtype=self.dtype, name='head')(z)


class PriorParams(nn.Module):
    """Owns the prior parameter pytree inside the flax params tree.

    Gradients for frozen means / scalar variances are masked at the optimizer
    level (ref requires_grad flags, module/priors.py:105-122)."""
    cfg: PriorConfig

    @nn.compact
    def __call__(self):
        init = lambda key: init_prior_params(self.cfg, key)
        mean = self.param('mean', lambda key: init(key)['mean'])
        var_param = self.param('var_param', lambda key: init(key)['var_param'])
        return {'mean': mean, 'var_param': var_param}


def capacity(prior_mean: jax.Array, num_labels: int) -> jax.Array:
    """Upper bound of I(Z;Y) from the class dictionary
    (ref Encoder.capacity, layers.py:323-336)."""
    m = prior_mean
    d2 = jnp.sum(jnp.square(m[:, None] - m[None]), axis=-1)
    return (np.log(num_labels)
            - jnp.sum(jnp.log(jnp.sum(jnp.exp(-d2 / 4), axis=0))) / num_labels)


def dict_min_distance(prior_mean: jax.Array) -> jax.Array:
    """Minimal pairwise distance between class means
    (ref Encoder.dict_min_distance, layers.py:338-348)."""
    C = prior_mean.shape[0]
    d = jnp.sqrt(jnp.maximum(
        jnp.sum(jnp.square(prior_mean[:, None] - prior_mean[None]), axis=-1), 0.0))
    max_norm = jnp.max(jnp.linalg.norm(prior_mean, axis=1))
    return jnp.min(d + 2 * max_norm * jnp.eye(C))

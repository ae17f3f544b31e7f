"""Color-space representation layers (ref Rgb2hsv/Hsv2rgb,
module/vae_layers/layers.py:11-70).

Pure jnp functions on (..., 3, H, W) tensors; used when the model config
sets representation='hsv' (inputs converted before features, reconstructions
converted back for display)."""

import jax
import jax.numpy as jnp


def rgb2hsv(x: jax.Array, epsilon: float = 1e-10, hmax: float = 1.0) -> jax.Array:
    """(..., 3, H, W) RGB in [0,1] -> HSV."""
    r, g, b = x[..., 0, :, :], x[..., 1, :, :], x[..., 2, :, :]
    max_rgb = jnp.max(x, axis=-3)
    min_rgb = jnp.min(x, axis=-3)
    argmin = jnp.argmin(x, axis=-3)
    max_min = max_rgb - min_rgb + epsilon

    sixth = hmax / 6
    h1 = sixth * (g - r) / max_min + sixth          # when b is min
    h2 = sixth * (b - g) / max_min + 3 * sixth      # when r is min
    h3 = sixth * (r - b) / max_min + 5 * sixth      # when g is min
    h = jnp.select([argmin == 2, argmin == 0, argmin == 1], [h1, h2, h3])
    s = max_min / (max_rgb + epsilon)
    v = max_rgb
    return jnp.stack([h, s, v], axis=-3)


def hsv2rgb(x: jax.Array, hmax: float = 1.0) -> jax.Array:
    """(..., 3, H, W) HSV -> RGB."""
    h, s, v = x[..., 0, :, :], x[..., 1, :, :], x[..., 2, :, :]
    sixth = hmax / 6
    h_ = (h - jnp.floor(h / hmax) * hmax) / sixth
    c = s * v
    xx = c * (1 - jnp.abs(jnp.mod(h_, 2) - 1))
    zero = jnp.zeros_like(c)
    idx = jnp.floor(h_).astype(jnp.int32) % 6
    options = jnp.stack([
        jnp.stack([c, xx, zero], axis=-3),
        jnp.stack([xx, c, zero], axis=-3),
        jnp.stack([zero, c, xx], axis=-3),
        jnp.stack([zero, xx, c], axis=-3),
        jnp.stack([xx, zero, c], axis=-3),
        jnp.stack([c, zero, xx], axis=-3),
    ])
    rgb = jnp.take_along_axis(
        options, idx[None, ..., None, :, :].astype(jnp.int32), axis=0)[0]
    return rgb + (v - c)[..., None, :, :]

"""Pallas TPU kernels for the hot evaluation reductions.

:func:`iws_fused`: the per-class IWAE combine of the OOD/eval path
(ref cvae.py:793-870).  For a conditional gaussian prior the log importance
weight is

    log w[l, c, n] = log_pxq[l, n] + const_c - 0.5 * s2_c * ||z[l,n] - m_c||^2

and iws[c, n] reduces over l with a stabilized log-mean-exp (or the
reference's published mean-exp-plus-max variant).  XLA materializes the
(L, C, N) weight tensor in HBM; this kernel tiles (C, N), computes the
z @ m_c^T term on the MXU inside VMEM and keeps an online (max, sum)
accumulator over l — one HBM pass over z, no (L, C, N) intermediate.

Falls back to interpret mode off-TPU (tests run it on CPU).

Status (measured on the v5e, L=16 N=512 C=100 K=128): XLA's own fusion of
the reference combine runs ~0.9ms/call vs ~8.4ms for this kernel — at the
problem sizes this model family produces, the (L, C, N) intermediate fits
comfortably and XLA's schedule wins, so the kernel is an opt-in
(``evaluate`` keeps the XLA path).  Revisit when L*C*N grows by ~100x
(e.g. imagenet-1k classes x large eval L).
"""

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOG_2PI = math.log(2 * math.pi)


def _iws_kernel(z_ref, logpxq_ref, mean_ref, s2_ref, const_ref, out_ref,
                *, L: int, ref_mode: bool):
    """Grid: (C tiles, N tiles).
    z: (L, Nt, K); logpxq: (L, Nt); mean: (Ct, K); s2, const: (Ct, 1).
    out: (Ct, Nt)."""
    mean = mean_ref[:]                                   # (Ct, K)
    s2 = s2_ref[:]                                       # (Ct, 1)
    const = const_ref[:]                                 # (Ct, 1)
    m_norm2 = jnp.sum(jnp.square(mean), axis=-1, keepdims=True)  # (Ct, 1)

    def logw(l):
        z = z_ref[l]                                     # (Nt, K)
        zz = jnp.sum(jnp.square(z), axis=-1)[None, :]    # (1, Nt)
        zm = jnp.dot(mean, z.T, preferred_element_type=jnp.float32)  # (Ct, Nt)
        mahala = s2 * (zz - 2.0 * zm + m_norm2)
        return logpxq_ref[l][None, :] + const - 0.5 * mahala

    w0 = logw(0)
    run_max = w0
    run_sum = jnp.ones_like(w0)

    def body(l, carry):
        run_max, run_sum = carry
        w = logw(l)
        new_max = jnp.maximum(run_max, w)
        run_sum = run_sum * jnp.exp(run_max - new_max) + jnp.exp(w - new_max)
        return new_max, run_sum

    run_max, run_sum = jax.lax.fori_loop(1, L, body, (run_max, run_sum))
    mean_exp = run_sum / L
    if ref_mode:
        # published estimator: mean(exp(delta)) + max (cvae.py:870)
        out_ref[:] = mean_exp + run_max
    else:
        out_ref[:] = jnp.log(mean_exp) + run_max


def _pad_to(x, axis, mult, value=0.0):
    n = x.shape[axis]
    pad = (-n) % mult
    if not pad:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(jax.jit, static_argnames=('ref_mode', 'interpret',
                                             'block_c', 'block_n'))
def iws_fused(z: jax.Array, log_pxq: jax.Array, mean: jax.Array,
              s2: jax.Array, log_det_prior: jax.Array,
              ref_mode: bool = True, interpret: Optional[bool] = None,
              block_c: int = 128, block_n: int = 128) -> jax.Array:
    """iws (C, N) from z (L, N, K), log_pxq (L, N) [= log p(x|z) + log 1/q],
    conditional gaussian prior mean (C, K), s2 (C,) inverse variances,
    log_det_prior (C,)."""
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    L, N, K = z.shape
    C = mean.shape[0]
    const = (-0.5 * K * _LOG_2PI - 0.5 * log_det_prior).reshape(C, 1)
    s2c = s2.reshape(C, 1).astype(jnp.float32)

    bc = min(block_c, max(8, C))
    bn = min(block_n, max(128, N))
    z_p = _pad_to(z.astype(jnp.float32), 1, bn)
    lp_p = _pad_to(log_pxq.astype(jnp.float32), 1, bn)
    mean_p = _pad_to(mean.astype(jnp.float32), 0, bc)
    s2_p = _pad_to(s2c, 0, bc)
    const_p = _pad_to(const, 0, bc, value=-1e30)  # padded classes -> -inf-ish
    Np, Cp = z_p.shape[1], mean_p.shape[0]

    grid = (Cp // bc, Np // bn)
    out = pl.pallas_call(
        functools.partial(_iws_kernel, L=L, ref_mode=ref_mode),
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, bn, K), lambda i, j: (0, j, 0)),
            pl.BlockSpec((L, bn), lambda i, j: (0, j)),
            pl.BlockSpec((bc, K), lambda i, j: (i, 0)),
            pl.BlockSpec((bc, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((bc, 1), lambda i, j: (i, 0)),
        ],
        out_specs=pl.BlockSpec((bc, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Cp, Np), jnp.float32),
        interpret=interpret,
    )(z_p, lp_p, mean_p, s2_p, const_p)
    return out[:C, :N]


def iws_reference_combine(z, log_pxq, mean, s2, log_det_prior,
                          ref_mode: bool = True) -> jax.Array:
    """Plain-XLA reference implementation (materializes (L, C, N)) for
    parity testing and non-gaussian fallbacks."""
    L, N, K = z.shape
    C = mean.shape[0]
    diff = z[:, None] - mean[None, :, None]              # (L, C, N, K)
    mahala = jnp.sum(jnp.square(diff), axis=-1) * s2.reshape(1, C, 1)
    const = (-0.5 * K * _LOG_2PI - 0.5 * log_det_prior).reshape(1, C, 1)
    logw = log_pxq[:, None] + const - 0.5 * mahala
    m = jnp.max(logw, axis=0)
    d = jnp.exp(logw - m[None])
    return (jnp.mean(d, axis=0) + m) if ref_mode \
        else jnp.log(jnp.mean(d, axis=0)) + m

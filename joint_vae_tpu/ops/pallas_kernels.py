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

Status (measured on the v5e): XLA's own fusion of the matmul-decomposed
combine wins at every scale this model family produces — 0.9 ms vs 8.4 ms
at L=16/N=512/C=100/K=128, and 2.1 ms vs 27.8 ms at L=64/C=1000 (the
imagenet-class revisit; the (L, N, C) intermediate is 131 MB there and XLA
still streams it faster than this kernel's per-l (Nt, K)x(K, Ct) matmuls
fill the MXU).  Kept as a parity-tested opt-in; the L axis is chunked
through a third grid dim with VMEM scratch accumulators, so arbitrarily
large L compiles (a single-slab version OOMed VMEM at L=64).
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
                m_sc, s_sc, *, L: int, Lc: int, n_lc: int, ref_mode: bool):
    """Grid: (C tiles, N tiles, L chunks) — the L axis runs innermost, so
    the VMEM scratch (running max / running sum per (Ct, Nt) tile) carries
    the online log-mean-exp across chunks and only an Lc-deep z slab is
    resident at a time (no VMEM ceiling at large L).
    z: (Lc, Nt, K); logpxq: (Lc, Nt); mean: (Ct, K); s2, const: (Ct, 1);
    out: (Ct, Nt).  Padded l entries carry logpxq = -1e30 and vanish from
    the sum; the mean divides by the true L."""
    l_blk = pl.program_id(2)
    mean = mean_ref[:]                                   # (Ct, K)
    s2 = s2_ref[:]                                       # (Ct, 1)
    const = const_ref[:]                                 # (Ct, 1)
    m_norm2 = jnp.sum(jnp.square(mean), axis=-1, keepdims=True)  # (Ct, 1)

    @pl.when(l_blk == 0)
    def _init():
        m_sc[:] = jnp.full(m_sc.shape, -1e30, m_sc.dtype)
        s_sc[:] = jnp.zeros(s_sc.shape, s_sc.dtype)

    def logw(l):
        z = z_ref[l]                                     # (Nt, K)
        zz = jnp.sum(jnp.square(z), axis=-1)[None, :]    # (1, Nt)
        zm = jnp.dot(mean, z.T, preferred_element_type=jnp.float32)  # (Ct, Nt)
        mahala = s2 * (zz - 2.0 * zm + m_norm2)
        return logpxq_ref[l][None, :] + const - 0.5 * mahala

    def body(l, carry):
        run_max, run_sum = carry
        w = logw(l)
        new_max = jnp.maximum(run_max, w)
        run_sum = run_sum * jnp.exp(run_max - new_max) + jnp.exp(w - new_max)
        return new_max, run_sum

    run_max, run_sum = jax.lax.fori_loop(0, Lc, body, (m_sc[:], s_sc[:]))
    m_sc[:] = run_max
    s_sc[:] = run_sum

    @pl.when(l_blk == n_lc - 1)
    def _finish():
        mean_exp = s_sc[:] / L
        if ref_mode:
            # published estimator: mean(exp(delta)) + max (cvae.py:870)
            out_ref[:] = mean_exp + m_sc[:]
        else:
            out_ref[:] = jnp.log(mean_exp) + m_sc[:]


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
    Lc = min(8, L) if L % 8 == 0 or L > 8 else L
    z_p = _pad_to(_pad_to(z.astype(jnp.float32), 1, bn), 0, Lc)
    # padded l rows: logpxq = -1e30 -> zero weight in the online sum
    lp_p = _pad_to(_pad_to(log_pxq.astype(jnp.float32), 1, bn),
                   0, Lc, value=-1e30)
    mean_p = _pad_to(mean.astype(jnp.float32), 0, bc)
    s2_p = _pad_to(s2c, 0, bc)
    const_p = _pad_to(const, 0, bc, value=-1e30)  # padded classes -> -inf-ish
    Np, Cp, Lp = z_p.shape[1], mean_p.shape[0], z_p.shape[0]
    n_lc = Lp // Lc

    grid = (Cp // bc, Np // bn, n_lc)
    out = pl.pallas_call(
        functools.partial(_iws_kernel, L=L, Lc=Lc, n_lc=n_lc,
                          ref_mode=ref_mode),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Lc, bn, K), lambda i, j, l: (l, j, 0)),
            pl.BlockSpec((Lc, bn), lambda i, j, l: (l, j)),
            pl.BlockSpec((bc, K), lambda i, j, l: (i, 0)),
            pl.BlockSpec((bc, 1), lambda i, j, l: (i, 0)),
            pl.BlockSpec((bc, 1), lambda i, j, l: (i, 0)),
        ],
        out_specs=pl.BlockSpec((bc, bn), lambda i, j, l: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Cp, Np), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bc, bn), jnp.float32),
                        pltpu.VMEM((bc, bn), jnp.float32)],
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

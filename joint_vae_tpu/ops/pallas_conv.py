"""Pallas same-grid conv kernel — a MEASURED NEGATIVE, kept opt-in.

The packed decoder lowering (models/conv.py) turns every hot (de)conv of
the flagship stacks into a *same-grid* NHWC conv: window strides (1, 1)
and output spatial == input spatial (pad_lo + pad_hi == tap_extent - 1).
XLA runs those at ~60% MXU inside the eval step (docs/BENCH.md xprof
breakdown); this kernel re-expresses the conv as tap_h x tap_w shifted
(M, Cin) @ (Cin, Cout) matmuls accumulated in VMEM f32 — the layout the
MXU natively wants — to chase the remaining headroom.

Verdict (scripts/probes/probe_pallas_conv.py on the v5e, N=8192 bf16):
it LOSES to lax.conv on every decode geometry — 0.86x on d3, 0.64x on
d5, 0.2-0.5x on the k5/subpixel layers — because each tap's operand must
be materialized as a row-shifted VMEM copy (±1-row shifts cannot be
sublane-aligned in any W-major flattening), and that VPU copy traffic
rivals the MXU time at these small channel counts, while XLA's native
conv streams overlapping windows into the MXU without materializing
them.  Tile size is a non-factor (max_m 1024-8192 within 0.7%).  Kept
behind JVT_PALLAS_CONV=1 with parity tests as the documented negative;
the packed-lowering + XLA conv path stands.

Geometry: for output row r = (n, i, j) and tap (a, b), the contributing
input row is r + (a - ph_lo) * W + (b - pw_lo) — one *uniform* flat shift
per tap because the grids coincide.  Shifts are static slice + zero-pad
within the batch tile (Mosaic's rotate has no bf16 lowering); rows whose
true (i + a - ph_lo, j + b - pw_lo) fall outside the image are masked,
which also covers bleed across image boundaries inside a tile.

Used opt-in (JVT_PALLAS_CONV=1) from models/conv.py; backward falls back
to the XLA conv vjp (jax.custom_vjp), so the knob is legal under grad.
Reference workload: the OOD eval loops, ref cvae.py:1455-1911.
"""

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False          # flipped by tests on hosts without a TPU


def enabled() -> bool:
    return os.environ.get('JVT_PALLAS_CONV', '') in ('1', 'auto')


def _pick_nb(n: int, hw: int, max_m: int) -> int:
    """Images per batch tile: the largest divisor of n with nb*hw <= max_m
    (at least 1 — a single image may exceed max_m for large images)."""
    nb = max(1, min(n, max_m // hw))
    while n % nb:
        nb -= 1
    return nb


def _shift_rows(x, d):
    """x shifted d rows up (shifted[r] = x[r + d]), zero-filled at the edge.
    Static slice + pad (Mosaic's dynamic_rotate lacks a bf16 lowering); the
    zero-filled rows are also masked by the caller's edge predicate."""
    if d == 0:
        return x
    if d > 0:
        return jnp.pad(x[d:], ((0, d), (0, 0)))
    return jnp.pad(x[:d], ((-d, 0), (0, 0)))


def _kernel_body(x_ref, k_ref, o_ref, acc_ref, *, nb, h, w, ci, co, th, tw,
                 ph_lo, pw_lo, out_dtype):
    m = nb * h * w
    xf = x_ref[:].reshape(m, ci)
    r = lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    i = (r // w) % h
    j = r % w
    first = True
    for a in range(th):
        di = a - ph_lo
        row_ok = None
        if di:
            row_ok = (i + di >= 0) & (i + di < h)
        for b in range(tw):
            dj = b - pw_lo
            delta = di * w + dj
            mask = row_ok
            if dj:
                col_ok = (j + dj >= 0) & (j + dj < w)
                mask = col_ok if mask is None else (mask & col_ok)
            # mask the (cheap, bf16) operand rather than the f32 product so
            # the tap's whole temporary chain stays one buffer wide
            shifted = _shift_rows(xf, delta)
            if mask is not None:
                shifted = shifted * mask.astype(shifted.dtype)
            contrib = jnp.dot(shifted, k_ref[a, b],
                              preferred_element_type=jnp.float32)
            if first:
                acc_ref[:] = contrib
                first = False
            else:
                acc_ref[:] += contrib
    o_ref[:] = acc_ref[:].reshape(nb, h * w, co).astype(out_dtype)


_STACK_BUDGET = 20 << 20          # Mosaic scoped-vmem stack for temporaries


def _same_grid_conv_impl(x: jax.Array, kern: jax.Array,
                         ph_lo: int, pw_lo: int, max_m: int) -> jax.Array:
    n, h, w, ci = x.shape
    th, tw, _, co = kern.shape
    # Mosaic stack-allocates the unrolled taps' temporaries (shifted bf16
    # operand + f32 product per tap); bound the tile so they fit
    bytes_per_row = th * tw * (2 * x.dtype.itemsize * ci + 4 * co)
    max_m = min(max_m, max(512, _STACK_BUDGET // bytes_per_row))
    nb = _pick_nb(n, h * w, max_m)
    m = nb * h * w
    body = functools.partial(
        _kernel_body, nb=nb, h=h, w=w, ci=ci, co=co, th=th, tw=tw,
        ph_lo=ph_lo, pw_lo=pw_lo, out_dtype=x.dtype)
    flops = 2 * n * h * w * th * tw * ci * co
    y = pl.pallas_call(
        body,
        grid=(n // nb,),
        in_specs=[
            pl.BlockSpec((nb, h * w, ci), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((th, tw, ci, co), lambda t: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, h * w, co), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h * w, co), x.dtype),
        scratch_shapes=[pltpu.VMEM((m, co), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(x.size + n * h * w * co) * x.dtype.itemsize
            + kern.size * kern.dtype.itemsize,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 << 20),
        interpret=_INTERPRET or jax.default_backend() != 'tpu',
    )(x.reshape(n, h * w, ci), kern)
    return y.reshape(n, h, w, co)


def _xla_conv(x, kern, ph_lo, ph_hi, pw_lo, pw_hi):
    return lax.conv_general_dilated(
        x, kern, window_strides=(1, 1),
        padding=[(ph_lo, ph_hi), (pw_lo, pw_hi)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _same_grid_conv(x, kern, ph_lo, pw_lo, max_m):
    return _same_grid_conv_impl(x, kern, ph_lo, pw_lo, max_m)


def _fwd(x, kern, ph_lo, pw_lo, max_m):
    return _same_grid_conv_impl(x, kern, ph_lo, pw_lo, max_m), (x, kern)


def _bwd(ph_lo, pw_lo, max_m, res, g):
    x, kern = res
    th, tw = kern.shape[0], kern.shape[1]
    _, vjp = jax.vjp(
        lambda x_, k_: _xla_conv(x_, k_, ph_lo, th - 1 - ph_lo,
                                 pw_lo, tw - 1 - pw_lo), x, kern)
    return vjp(g)


_same_grid_conv.defvjp(_fwd, _bwd)


def maybe_same_grid_conv(x: jax.Array, kern: jax.Array,
                         strides: Tuple[int, int],
                         padding, *, max_m: int = 0) -> Optional[jax.Array]:
    """Pallas path for a stride-(1,1) NHWC conv whose output grid equals the
    input grid; returns None when disabled or the geometry does not qualify
    (caller falls through to lax.conv_general_dilated)."""
    if not enabled():
        return None
    if strides != (1, 1) or x.ndim != 4 or kern.ndim != 4:
        return None
    (ph_lo, ph_hi), (pw_lo, pw_hi) = padding
    n, h, w, ci = x.shape
    th, tw, kci, co = kern.shape
    if kci != ci:
        return None                          # feature groups etc.
    if ph_lo + ph_hi != th - 1 or pw_lo + pw_hi != tw - 1:
        return None                          # output grid != input grid
    if min(ph_lo, ph_hi, pw_lo, pw_hi) < 0:
        return None
    if (h * w) % 8 or n * h * w < 512:
        return None                          # layout-free reshape + enough M
    if not max_m:
        max_m = int(os.environ.get('JVT_PALLAS_CONV_M', 4096))
    return _same_grid_conv(x, kern, ph_lo, pw_lo, max_m)

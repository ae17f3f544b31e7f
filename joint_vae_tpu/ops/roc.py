"""Device-resident ROC / AUROC / FPR@TPR with one-sided and two-sided tests.

TPU-native replacement for the reference's CPU threshold-sweep
(``utils/roc_curves.py:38-210``): fully vectorized with sorts +
``searchsorted`` so OOD evaluation never leaves the device (BASELINE.json
north star).  Supported test geometries (selected by method suffix at ROC
time, ref cvae.py:1849-1855):

- one-sided:      in-distribution iff score >= t           (plain methods)
- 'around-mean':  iff |score - center| <= delta            (suffix ``-2s``)
- (p, q) tuple:   iff t_low <= score <= t_up where the lower threshold walks
  the sorted in-scores p times faster than the upper walks down (suffix
  ``-a-p-q``)

Semantics matched to the reference:

- thresholds are the sorted in-distribution scores themselves;
- kept FPR@TPR: the smallest fpr whose tpr still >= the target;
- AUROC = trapezoid over the swept (fpr, tpr) points with (0, 0) appended;
- 'around-mean' centers on the mean of a validation split of ins (defaults
  to all ins, ref :59-70).

Everything is jittable with static shapes; only the final scalars are pulled
to host by callers.
"""

from typing import Dict, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

DEFAULT_KEPT_TPR = tuple(t / 100 for t in range(90, 100))

TwoSided = Union[bool, str, Tuple[int, int]]


def fpr_at_tpr(fpr, tpr, a, thresholds=None, return_threshold: bool = False):
    """First fpr (ascending-tpr order) with tpr >= a (ref roc_curves.py:8-27)."""
    fpr = jnp.asarray(fpr)
    tpr = jnp.asarray(tpr)
    ok = tpr >= a
    big = jnp.where(ok, fpr, jnp.inf)
    i = jnp.argmin(big)
    if return_threshold:
        return fpr[i], jnp.asarray(thresholds)[i]
    return fpr[i]


def tpr_at_fpr(fpr, tpr, a):
    """Max tpr among points with fpr <= a (ref roc_curves.py:30-35)."""
    fpr = jnp.asarray(fpr)
    tpr = jnp.asarray(tpr)
    return jnp.max(jnp.where(fpr <= a, tpr, -jnp.inf))


def _counts_below(sorted_scores: jax.Array, t: jax.Array) -> jax.Array:
    return jnp.searchsorted(sorted_scores, t, side='left')


def _counts_above(sorted_scores: jax.Array, t: jax.Array) -> jax.Array:
    n = sorted_scores.shape[0]
    return n - jnp.searchsorted(sorted_scores, t, side='right')


def _sweep(sorted_ins, sorted_outs, lows, ups):
    """tpr/fpr for interval tests [low_t, up_t] (vectorized over t)."""
    n_in, n_out = sorted_ins.shape[0], sorted_outs.shape[0]
    neg_in = _counts_below(sorted_ins, lows) + _counts_above(sorted_ins, ups)
    neg_out = _counts_below(sorted_outs, lows) + _counts_above(sorted_outs, ups)
    tpr = 1.0 - neg_in / n_in
    fpr = 1.0 - neg_out / n_out
    return tpr, fpr


def _auc_trapz(fpr, tpr, valid):
    """Trapezoid over swept points (fpr descending in t) + final (0,0),
    masking invalid (crossed-threshold) iterations."""
    # order: t ascending -> fpr descends from 1 to ~0. Append (0, 0).
    fpr = jnp.where(valid, fpr, 0.0)
    tpr = jnp.where(valid, tpr, 0.0)
    f = jnp.concatenate([fpr, jnp.zeros((1,))])
    t = jnp.concatenate([tpr, jnp.zeros((1,))])
    # integrate sum over segments of (f_i - f_{i+1}) * (t_i + t_{i+1}) / 2
    return jnp.sum((f[:-1] - f[1:]) * (t[:-1] + t[1:]) * 0.5)


def _kept_at_tpr(tpr, fpr, lows, ups, kept_tpr, valid):
    """Per kept-tpr target: the point with smallest fpr whose tpr >= target."""
    kept = jnp.asarray(kept_tpr)
    ok = (tpr[None, :] >= kept[:, None]) & valid[None, :]
    masked_fpr = jnp.where(ok, fpr[None, :], jnp.inf)
    idx = jnp.argmin(masked_fpr, axis=1)
    any_ok = jnp.any(ok, axis=1)
    kf = jnp.where(any_ok, fpr[idx], 1.0)
    kt = jnp.where(any_ok, tpr[idx], 1.0)
    kl = jnp.where(any_ok, lows[idx], -jnp.inf)
    ku = jnp.where(any_ok, ups[idx], jnp.inf)
    return kf, kt, kl, ku


def roc_curve(ins: jax.Array, outs: jax.Array,
              kept_tpr: Sequence[float] = DEFAULT_KEPT_TPR,
              two_sided: TwoSided = False,
              validation: Union[int, float] = 0,
              ins_are_higher: bool = True,
              key: jax.Array = None) -> Dict[str, jax.Array]:
    """Compute AUROC + FPR/thresholds at kept TPRs, on device.

    ``validation`` (two-sided tests only, ref roc_curves.py:49-64): a count
    (or fraction) of in-scores set aside by a *random permutation split*; the
    'around-mean' center (resp. the `-a-p-q` threshold base) comes from the
    held-out subset while the sweep and TPR counting use only the remaining
    ins.  ``key`` seeds the split (the reference draws a fresh OS seed; here
    it is deterministic unless a key is passed).

    Returns dict: auc (scalar), fpr (K,), tpr (K,), thresholds_low/up (K,),
    precision (K,).
    """
    sign = 1.0 if ins_are_higher else -1.0
    ins = sign * jnp.ravel(ins).astype(jnp.float32)
    outs = sign * jnp.ravel(outs).astype(jnp.float32)
    n_total = ins.shape[0]
    mean_all = jnp.mean(sign * ins)
    std_all = jnp.std(ins)

    if two_sided and validation:
        if validation < 1:
            validation = int(validation * n_total)
        validation = int(validation)
        if validation <= 0 or validation >= n_total:
            # a fraction that floors to zero (or swallows everything)
            # degenerates to validating on all ins (ref roc_curves.py:59-64)
            validation = 0
            val_scores = ins
        else:
            if key is None:
                key = jax.random.key(0)
            perm = jax.random.permutation(key, n_total)
            val_scores = ins[perm[:validation]]
            ins = ins[perm[validation:]]
    else:
        validation = 0
        val_scores = ins

    n_in = ins.shape[0]
    sorted_ins = jnp.sort(ins)
    sorted_outs = jnp.sort(outs)

    if two_sided == 'around-mean':
        center = jnp.mean(val_scores)
        deltas = jnp.sort(jnp.abs(ins - center))
        lows = jnp.concatenate([jnp.array([-jnp.inf]), center - deltas[::-1]])
        ups = jnp.concatenate([jnp.array([jnp.inf]), center + deltas[::-1]])
        valid = lows < ups
    elif isinstance(two_sided, tuple):
        p, q = two_sided
        if validation:
            # upsample the sorted validation scores back to n_total points
            # before striding (ref fits a cubic spline, roc_curves.py:76-83;
            # linear interpolation here — documented deviation).
            sv = jnp.sort(val_scores)
            xi = jnp.linspace(0.0, validation - 1.0, n_total)
            base = jnp.interp(xi, jnp.arange(validation, dtype=jnp.float32), sv)
        else:
            base = sorted_ins
        lo_seq = base[::p]
        up_seq = base[::q]
        nt = min(lo_seq.shape[0], up_seq.shape[0]) + 1
        t_idx = jnp.arange(nt)
        lows = jnp.concatenate([jnp.array([-jnp.inf]), lo_seq])[t_idx]
        ups = jnp.concatenate([jnp.array([jnp.inf]), up_seq[::-1]])[t_idx]
        valid = lows < ups
    else:
        lows = jnp.concatenate([jnp.array([-jnp.inf]), sorted_ins])
        ups = jnp.full_like(lows, jnp.inf)
        valid = jnp.ones((n_in + 1,), bool)

    tpr, fpr = _sweep(sorted_ins, sorted_outs, lows, ups)
    auc = _auc_trapz(fpr, tpr, valid)
    kf, kt, kl, ku = _kept_at_tpr(tpr, fpr, lows, ups, kept_tpr, valid)

    n_out = outs.shape[0]
    precision = kt * n_in / jnp.maximum(kt * n_in + kf * n_out, 1e-30)

    # undo the sign flip on thresholds (ref lowup mapping, roc_curves.py:41)
    if not ins_are_higher:
        kl, ku = -ku, -kl
    return {'auc': auc, 'fpr': kf, 'tpr': kt,
            'thresholds_low': kl, 'thresholds_up': ku,
            'precision': precision,
            'mean': mean_all, 'std': std_all,
            'n': jnp.asarray(n_total)}


def two_sided_from_method(method: str) -> TwoSided:
    """Method-suffix grammar -> test geometry (ref cvae.py:1849-1855)."""
    if method.endswith('-2s'):
        return 'around-mean'
    if '-a-' in method:
        parts = method.split('-')
        return (int(parts[-2]), int(parts[-1]))
    return False


def auroc_one_sided_exact(ins: jax.Array, outs: jax.Array) -> jax.Array:
    """Exact rank-statistic AUROC (Mann-Whitney U with tie correction) — the
    fast path used by benchmarks; equals the swept trapezoid for continuous
    scores."""
    ins = jnp.ravel(ins).astype(jnp.float32)
    outs = jnp.ravel(outs).astype(jnp.float32)
    n_in, n_out = ins.shape[0], outs.shape[0]
    sorted_outs = jnp.sort(outs)
    below = jnp.searchsorted(sorted_outs, ins, side='left')
    ties = jnp.searchsorted(sorted_outs, ins, side='right') - below
    return jnp.sum(below + 0.5 * ties) / (n_in * n_out)

"""ROC engine tests (vs sklearn, like the reference's own self-check in
utils/roc_curves.py:213-276) and score-measure tests vs hand math."""

import numpy as np
import pytest

import jax.numpy as jnp

from joint_vae_tpu.models.cvnet import CVNetConfig
from joint_vae_tpu.ops.roc import (roc_curve, fpr_at_tpr, tpr_at_fpr,
                                   auroc_one_sided_exact, two_sided_from_method)
from joint_vae_tpu.ops.scores import (batch_dist_measures, develop_starred_methods,
                                      strip_roc_suffix, predict_after_evaluate)

RNG = np.random.default_rng(7)


def test_one_sided_auroc_vs_sklearn():
    sklearn = pytest.importorskip('sklearn.metrics')
    ins = RNG.normal(1.0, 1.0, 2000).astype(np.float32)
    outs = RNG.normal(0.0, 1.0, 1500).astype(np.float32)
    res = roc_curve(jnp.array(ins), jnp.array(outs))
    labels = np.concatenate([np.ones_like(ins), np.zeros_like(outs)])
    want = sklearn.roc_auc_score(labels, np.concatenate([ins, outs]))
    np.testing.assert_allclose(float(res['auc']), want, atol=2e-3)
    np.testing.assert_allclose(float(auroc_one_sided_exact(jnp.array(ins),
                                                           jnp.array(outs))),
                               want, atol=1e-6)


def test_fpr_at_tpr_manual():
    ins = RNG.normal(2.0, 1.0, 5000).astype(np.float32)
    outs = RNG.normal(0.0, 1.0, 5000).astype(np.float32)
    res = roc_curve(jnp.array(ins), jnp.array(outs), kept_tpr=(0.95,))
    # manual: the highest threshold keeping >= 95% of ins
    t = np.sort(ins)[int(np.floor(0.05 * len(ins)))]
    want_fpr = (outs >= t).mean()
    got = float(res['fpr'][0])
    assert abs(got - want_fpr) < 5e-3, (got, want_fpr)
    assert float(res['tpr'][0]) >= 0.95 - 1e-5
    # threshold consistency: fpr recomputed from the reported threshold
    thr = float(res['thresholds_low'][0])
    np.testing.assert_allclose((outs >= thr).mean(), got, atol=5e-3)


def test_two_sided_around_mean_beats_one_sided():
    ins = RNG.normal(0.0, 1.0, 4000).astype(np.float32)
    outs = RNG.normal(0.0, 3.0, 4000).astype(np.float32)
    one = roc_curve(jnp.array(ins), jnp.array(outs))
    two = roc_curve(jnp.array(ins), jnp.array(outs), two_sided='around-mean')
    assert abs(float(one['auc']) - 0.5) < 0.05
    assert float(two['auc']) > 0.8
    # interval test sanity at tpr>=0.9: recompute from thresholds
    lo, up = float(two['thresholds_low'][0]), float(two['thresholds_up'][0])
    t_chk = ((ins >= lo) & (ins <= up)).mean()
    f_chk = ((outs >= lo) & (outs <= up)).mean()
    np.testing.assert_allclose(t_chk, float(two['tpr'][0]), atol=2e-3)
    np.testing.assert_allclose(f_chk, float(two['fpr'][0]), atol=2e-3)


def test_asymmetric_two_sided():
    ins = RNG.normal(0.0, 1.0, 3000).astype(np.float32)
    outs = RNG.normal(0.5, 3.0, 3000).astype(np.float32)
    res = roc_curve(jnp.array(ins), jnp.array(outs), two_sided=(1, 1))
    assert 0.6 < float(res['auc']) <= 1.0
    res41 = roc_curve(jnp.array(ins), jnp.array(outs), two_sided=(4, 1))
    assert 0.5 < float(res41['auc']) <= 1.0


def test_method_suffix_grammar():
    assert two_sided_from_method('iws') is False
    assert two_sided_from_method('iws-2s') == 'around-mean'
    assert two_sided_from_method('elbo-a-4-1') == (4, 1)
    assert strip_roc_suffix('iws-2s') == 'iws'
    assert strip_roc_suffix('elbo-a-4-1') == 'elbo'
    assert strip_roc_suffix('softkl-10') == 'softkl-10'


def test_tpr_fpr_helpers():
    fpr = jnp.array([1.0, 0.5, 0.2, 0.1])
    tpr = jnp.array([1.0, 0.97, 0.93, 0.80])
    assert float(fpr_at_tpr(fpr, tpr, 0.95)) == 0.5
    assert float(tpr_at_fpr(fpr, tpr, 0.25)) == pytest.approx(0.93)


def test_develop_starred():
    ms = develop_starred_methods(['softkl*', 'iws'])
    assert 'softkl-1' in ms and 'softkl-1000' in ms and 'iws' in ms
    odin = develop_starred_methods(['odin*'])
    assert len(odin) == 10 * 21
    assert odin[0] == 'odin-1-0.0000'


def _cvae_cfg():
    return CVNetConfig(input_shape=(1, 4, 4), num_labels=3, type='cvae',
                       encoder=(8,), decoder=(8,), latent_dim=4, gamma=1.0,
                       latent_sampling=2)


def test_batch_dist_measures_cvae():
    cfg = _cvae_cfg()
    C, N = 3, 6
    total = RNG.normal(size=(C, N)).astype(np.float32)
    iws = RNG.normal(size=(C, N)).astype(np.float32)
    kl = np.abs(RNG.normal(size=(C, N))).astype(np.float32)
    cross_x = RNG.normal(size=(N,)).astype(np.float32)
    logits = RNG.normal(size=(N, C)).astype(np.float32)
    losses = {k: jnp.array(v) for k, v in
              dict(total=total, iws=iws, kl=kl, cross_x=cross_x,
                   zdist=kl, wmse=np.abs(cross_x)).items()}

    ms = batch_dist_measures(cfg, jnp.array(logits), losses,
                             ['elbo', 'iws', 'iws-2s', 'max', 'sum', 'mse',
                              'soft', 'softkl-10', 'zdist', 'hyz', 'baseline-2',
                              'logits', 'mean', 'std', 'mag'])
    logp = -total
    np.testing.assert_allclose(np.asarray(ms['elbo']), logp.max(0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ms['max']), logp.max(0), rtol=1e-5)
    # iws = logsumexp over classes + log C
    want_iws = np.log(np.exp(iws - iws.max(0)).sum(0)) + iws.max(0) + np.log(C)
    np.testing.assert_allclose(np.asarray(ms['iws']), want_iws, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ms['iws-2s']), want_iws, rtol=1e-4)
    want_sum = np.log(np.exp(logp - logp.max(0)).sum(0)) + logp.max(0)
    np.testing.assert_allclose(np.asarray(ms['sum']), want_sum, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ms['mse']), -cross_x, rtol=1e-5)
    sm = np.exp(-kl) / np.exp(-kl).sum(0)
    np.testing.assert_allclose(np.asarray(ms['soft']), sm.max(0), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ms['zdist']), (-kl).max(0), rtol=1e-5)
    p = np.exp(logits * 0.5) / np.exp(logits * 0.5).sum(-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(ms['baseline-2']), p.max(-1), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ms['logits']), logits.max(-1), rtol=1e-5)
    # torch.std semantics (Bessel-corrected) — oracle-pinned in
    # tests/test_scores_vs_reference.py
    np.testing.assert_allclose(np.asarray(ms['std']), logp.std(0, ddof=1),
                               rtol=1e-4)


def test_predict_methods():
    cfg = _cvae_cfg()
    C, N = 3, 5
    total = RNG.normal(size=(C, N)).astype(np.float32)
    iws = RNG.normal(size=(C, N)).astype(np.float32)
    zdist = np.abs(RNG.normal(size=(C, N))).astype(np.float32)
    logits = RNG.normal(size=(N, C)).astype(np.float32)
    losses = {'total': jnp.array(total), 'iws': jnp.array(iws),
              'zdist': jnp.array(zdist)}
    np.testing.assert_array_equal(
        np.asarray(predict_after_evaluate(cfg, jnp.array(logits), losses, 'iws')),
        iws.argmax(0))
    np.testing.assert_array_equal(
        np.asarray(predict_after_evaluate(cfg, jnp.array(logits), losses, 'loss')),
        total.argmin(0))
    np.testing.assert_array_equal(
        np.asarray(predict_after_evaluate(cfg, jnp.array(logits), losses, 'closest')),
        zdist.argmin(0))
    np.testing.assert_array_equal(
        np.asarray(predict_after_evaluate(cfg, jnp.array(logits), losses, 'esty')),
        logits.argmax(-1))
    # default for cvae is its first predict method: 'iws'
    np.testing.assert_array_equal(
        np.asarray(predict_after_evaluate(cfg, jnp.array(logits), losses)),
        iws.argmax(0))


# ---------------------------------------------------------------------------
# Oracle check: a loop-based transcription of the reference's threshold walk
# (utils/roc_curves.py:38-210) written independently here — validates the
# device sweep's semantics (strict below-low / above-up counting, trapezoid
# AUC with appended (0,0), kept fpr = smallest with tpr >= target) for all
# three geometries on shared score vectors.
# ---------------------------------------------------------------------------

def _oracle_roc(ins, outs, kept_tpr, two_sided=False):
    ins = np.asarray(ins, np.float64)
    outs = np.asarray(outs, np.float64)
    s_in = np.sort(ins)
    n_in, n_out = len(ins), len(outs)

    if two_sided == 'around-mean':
        center = ins.mean()
        deltas = np.sort(np.abs(ins - center))[::-1]
        lows = np.concatenate([[-np.inf], center - deltas])
        ups = np.concatenate([[np.inf], center + deltas])
    elif isinstance(two_sided, tuple):
        p, q = two_sided
        lo_seq = s_in[::p]
        up_seq = s_in[::q][::-1]
        nt = min(len(lo_seq), len(up_seq)) + 1
        lows = np.concatenate([[-np.inf], lo_seq])[:nt]
        ups = np.concatenate([[np.inf], up_seq])[:nt]
    else:
        lows = np.concatenate([[-np.inf], s_in])
        ups = np.full_like(lows, np.inf)

    pts = []
    for lo, up in zip(lows, ups):
        if lo >= up:
            continue
        tpr = np.mean((ins >= lo) & (ins <= up))
        fpr = np.mean((outs >= lo) & (outs <= up))
        pts.append((fpr, tpr, lo, up))
    pts.append((0.0, 0.0, np.nan, np.nan))
    f = np.array([p_[0] for p_ in pts])
    t = np.array([p_[1] for p_ in pts])
    auc = np.sum((f[:-1] - f[1:]) * (t[:-1] + t[1:]) / 2)
    kept = []
    for a in kept_tpr:
        ok = t[:-1] >= a
        kept.append(f[:-1][ok].min() if ok.any() else 1.0)
    return auc, np.array(kept)


def test_roc_matches_oracle_all_geometries():
    rng = np.random.default_rng(11)
    ins = rng.normal(0.0, 1.0, 600).astype(np.float32)
    outs = rng.normal(1.8, 1.3, 500).astype(np.float32)
    kept = [0.9, 0.95, 0.99]
    for ts in (False, 'around-mean', (1, 1), (4, 1), (2, 3)):
        r = roc_curve(jnp.asarray(ins), jnp.asarray(outs), kept_tpr=kept,
                      two_sided=ts, ins_are_higher=False)
        want_auc, want_fpr = _oracle_roc(-ins, -outs, kept, two_sided=ts)
        np.testing.assert_allclose(float(r['auc']), want_auc, atol=5e-3,
                                   err_msg=str(ts))
        np.testing.assert_allclose(np.asarray(r['fpr']), want_fpr,
                                   atol=6e-3, err_msg=str(ts))

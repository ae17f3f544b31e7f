"""Ensemble-aggregation parity against the reference's posterior helpers
(module/aggregation.py:8-66), executed as oracles on shared score tensors:
log-mean-exp ensembling, joint zdist posteriors, voting, and the
latent mutual-information combine Im(T)."""

import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from joint_vae_tpu.evals.aggregation import ensemble_posterior

torch = pytest.importorskip('torch')
RNG = np.random.default_rng(31)
C, N, M = 10, 24, 3


@pytest.fixture(scope='module')
def ref_agg():
    from test_evaluate_vs_reference import _stub_torchvision
    _stub_torchvision()
    sys.path.insert(0, '/root/reference')
    try:
        import module.aggregation as agg
    finally:
        sys.path.remove('/root/reference')
    return agg


def test_lme_ensemble_parity(ref_agg):
    """'elbo' ensembling == the reference's mean_posterior at T=1
    (log-mean-exp then softmax over classes)."""
    scores = [RNG.normal(-30, 5, (C, N)).astype(np.float32)
              for _ in range(M)]
    want = ref_agg.mean_posterior(*[torch.tensor(s) for s in scores],
                                  temps=[1])[1].numpy()
    got = ensemble_posterior(scores, 'elbo')
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_joint_zdist_parity(ref_agg):
    zdists = [np.abs(RNG.normal(5, 2, (C, N))).astype(np.float32)
              for _ in range(M)]
    want = ref_agg.joint_posterior(*[torch.tensor(z) for z in zdists],
                                   temps=[1])[1].numpy()
    got = ensemble_posterior(zdists, 'joint')
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_voting_parity(ref_agg):
    scores = [RNG.normal(0, 3, (C, N)).astype(np.float32)
              for _ in range(M)]
    ys = [torch.tensor(s.argmax(0)) for s in scores]
    want = ref_agg.voting_posterior(*ys)[None].numpy()
    got = ensemble_posterior(scores, 'vote')
    np.testing.assert_allclose(got, want.T if want.shape != got.shape
                               else want, rtol=1e-6, atol=1e-8)


def test_latent_mi_combine_formula():
    """The Im(T) combine: Im[n] = E_{l1,l2}[log sum_y p1(y|z_l1) p2(y|z_l2)]
    (ref compute_latent_mutual_info, module/aggregation.py:52-66).

    The reference function itself is NOT executable on modern torch — it
    uses named tensors (.rename/.align_as), removed in torch >= 2.x — so
    this pins our einsum combine to a direct numpy transcription of its
    documented math instead."""
    L1, L2 = 4, 5
    p1 = RNG.uniform(0.1, 1, (C, L1, N))
    p2 = RNG.uniform(0.1, 1, (C, L2, N))
    p1 = p1 / p1.sum(0, keepdims=True)
    p2 = p2 / p2.sum(0, keepdims=True)
    want = np.zeros(N)
    for n in range(N):
        acc = 0.0
        for a in range(L1):
            for b in range(L2):
                acc += np.log((p1[:, a, n] * p2[:, b, n]).sum())
        want[n] = acc / (L1 * L2)

    import jax.numpy as jnp
    a = jnp.moveaxis(jnp.asarray(p1.astype(np.float32)), 0, 1)   # (L1,C,N)
    b = jnp.moveaxis(jnp.asarray(p2.astype(np.float32)), 0, 1)   # (L2,C,N)
    agree = jnp.einsum('acn,bcn->abn', a, b)
    got = np.asarray(jnp.mean(jnp.log(agree), axis=(0, 1)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)

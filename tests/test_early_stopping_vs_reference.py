"""Early-stopping parity: our epoch selection against the reference's own
``utils/testing.py::early_stopping`` run as an oracle on shared history
(min-loss and min-mse strategies, result-epoch restriction, validation->
test fallback)."""

import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from joint_vae_tpu.utils.testing import (cache_early_stopping,
                                         early_stopping_epoch)

torch = pytest.importorskip('torch')


@pytest.fixture(scope='module')
def ref_early_stopping():
    from test_evaluate_vs_reference import _stub_torchvision
    _stub_torchvision()
    sys.path.insert(0, '/root/reference')
    try:
        from utils.testing import early_stopping
    finally:
        sys.path.remove('/root/reference')
    return early_stopping


def _history(losses, mses, valid='validation'):
    """Reference-shaped history: epoch 0 holds the pre-training eval
    (cvae.py:2294-2374) — its presence decides valid_k globally; epochs
    1..n carry the per-epoch values (worse-than-everything at 0 keeps it
    out of both selectors)."""
    hist = {'epochs': len(losses),
            0: {valid + '_loss': {'total': max(losses) + 1.0},
                valid + '_measures': {'mse': max(mses) + 1.0}}}
    for e in range(1, len(losses) + 1):
        hist[e] = {valid + '_loss': {'total': losses[e - 1]},
                   valid + '_measures': {'mse': mses[e - 1]}}
    return hist


def _ref_model(hist, result_epochs, mtype='cvae'):
    m = types.SimpleNamespace()
    m.type = mtype
    m.train_history = hist
    m.ood_results = {e: {} for e in result_epochs}
    m.testing = {e: {} for e in result_epochs}
    m.job_number = 1
    return m


def _our_job(hist, result_epochs):
    j = types.SimpleNamespace()
    j.train_history = hist
    j.ood_results = {e: {} for e in result_epochs}
    j.testing = {e: {} for e in result_epochs}
    j.training_parameters = {}
    return j


LOSSES = [5.0, 3.0, 4.0, 2.5, 6.0]
MSES = [0.9, 0.4, 0.2, 0.5, 0.3]


@pytest.mark.parametrize('which,metric', [('loss', 'total'), ('mse', 'mse')])
@pytest.mark.parametrize('result_epochs', [
    (1, 2, 3, 4, 5),          # everything reported
    (2, 4),                   # sparse reports: only these are candidates
])
def test_epoch_selection_matches(ref_early_stopping, which, metric,
                                 result_epochs):
    hist = _history(LOSSES, MSES)
    want = ref_early_stopping(_ref_model(hist, result_epochs), which=which)
    got = cache_early_stopping(_our_job(hist, result_epochs), metric=metric)
    assert got == want, (which, result_epochs, got, want)


def test_validation_to_test_fallback_matches(ref_early_stopping):
    """Without validation, the reference falls back to test_loss
    (testing.py:22-26); so do we."""
    hist = _history(LOSSES, MSES, valid='test')
    epochs = (1, 2, 3, 4, 5)
    want = ref_early_stopping(_ref_model(hist, epochs), which='loss')
    got = cache_early_stopping(_our_job(hist, epochs))
    assert got == want == int(np.argmin(LOSSES)) + 1


def test_results_free_job_is_a_documented_deviation():
    """The reference returns None for a job with no stored results
    (testing.py:16-19); we fall back to the full history (more useful for
    fresh jobs) — asserted here so the deviation stays deliberate."""
    hist = _history(LOSSES, MSES)
    assert cache_early_stopping(_our_job(hist, ())) == 4
    assert early_stopping_epoch(hist, metric='mse') == 3


def test_fresh_job_placeholder_does_not_disable_selection():
    """new_job seeds testing={0: placeholders} (mirroring the reference's
    pre-training entry); the candidate restriction must intersect with the
    epochs the history actually holds, or --early-stopping silently
    no-ops on every fresh job."""
    import jax
    from joint_vae_tpu.models.cvnet import CVNetConfig
    from joint_vae_tpu.ops.sigma import SigmaConfig
    from joint_vae_tpu.save_load.jobs import new_job
    job = new_job(CVNetConfig(input_shape=(1, 4, 4), num_labels=2,
                              type='cvae', encoder=(4,), decoder=(4,),
                              classifier=(4,), latent_dim=2, gamma=1.0,
                              sigma=SigmaConfig(value=0.5)),
                  key=jax.random.PRNGKey(0))
    assert 0 in job.testing                     # the placeholder exists
    # OUR trainer writes history epochs 1..N only (no pre-training entry)
    job.train_history = {'epochs': len(LOSSES)}
    for e in range(1, len(LOSSES) + 1):
        job.train_history[e] = {'validation_loss': {'total': LOSSES[e - 1]}}
    assert cache_early_stopping(job) == int(np.argmin(LOSSES)) + 1


def test_no_cross_family_leakage_for_missing_metric():
    """A pre-round-5 history (validation_loss stored, validation_measures
    absent) asked for min-mse must return None — falling through to
    test_measures would select the early-stopping epoch ON THE TEST SET."""
    hist = {'epochs': 3}
    for e in (1, 2, 3):
        hist[e] = {'validation_loss': {'total': LOSSES[e - 1]},
                   'test_measures': {'mse': MSES[e - 1]}}
    assert early_stopping_epoch(hist, metric='mse') is None
    # and with validation_measures present, validation wins (argmin of the
    # reversed mse sequence lands on epoch 1, NOT the test-set argmin 3)
    for e in (1, 2, 3):
        hist[e]['validation_measures'] = {'mse': MSES[3 - e]}
    assert early_stopping_epoch(hist, metric='mse') == 1

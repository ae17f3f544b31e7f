"""Sigma state-machine parity against the reference's Parameter subclass
(module/vae_layers/layers.py:73-213), driven through identical rmse-update
sequences for the rmse / decay-to-rmse / max-step modes."""

import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from joint_vae_tpu.ops.sigma import (SigmaConfig, init_sigma_state,
                                     update_sigma_rmse, sigma_value)

torch = pytest.importorskip('torch')


@pytest.fixture(scope='module')
def ref_sigma():
    from test_evaluate_vs_reference import _stub_torchvision
    _stub_torchvision()
    sys.path.insert(0, '/root/reference')
    try:
        from module.vae_layers.layers import Sigma
    finally:
        sys.path.remove('/root/reference')
    return Sigma


RMSES = [0.9, 0.7, 0.55, 0.62, 0.5, 0.45, 0.47, 0.4]


@pytest.mark.parametrize('kw', [
    dict(is_rmse=True),
    dict(value=1.0, decay=0.1),
    dict(value=1.0, decay=0.1, reach=2.0),
    dict(value=2.0, decay=0.5, max_step=0.05),
    dict(value=0.3, decay=0.9, reach=0.5, max_step=0.2),
])
def test_update_sequence_parity(ref_sigma, kw):
    ref = ref_sigma(**kw)
    cfg = SigmaConfig(**kw)
    st = init_sigma_state(cfg)
    for r in RMSES:
        ref.update(rmse=r)
        st = update_sigma_rmse(cfg, st, np.float32(r))
        np.testing.assert_allclose(float(sigma_value(cfg, st)), ref.value,
                                   rtol=1e-5, atol=1e-6)


def test_constant_and_learned_value(ref_sigma):
    ref = ref_sigma(value=0.37)
    cfg = SigmaConfig(value=0.37)
    st = init_sigma_state(cfg)
    ref.update(rmse=0.5)                      # no decay: stays constant
    st = update_sigma_rmse(cfg, st, np.float32(0.5))
    np.testing.assert_allclose(float(sigma_value(cfg, st)), ref.value,
                               rtol=1e-6)

    ref_l = ref_sigma(value=0.25, learned=True)
    cfg_l = SigmaConfig(value=0.25, learned=True)
    st_l = init_sigma_state(cfg_l)
    np.testing.assert_allclose(float(sigma_value(cfg_l, st_l)), ref_l.value,
                               rtol=1e-5)


def test_describe_matches_str(ref_sigma):
    """describe() mirrors the reference's __str__ (used in save-dir
    naming, train.py:258-265) for the non-stateful modes."""
    for kw in (dict(value=0.37), dict(is_rmse=True),
               dict(value=1.0, decay=0.1),
               dict(value=2.0, decay=0.5, max_step=0.05),
               dict(value=0.3, decay=0.9, reach=0.5, max_step=0.2)):
        assert SigmaConfig(**kw).describe() == str(ref_sigma(**kw)), kw

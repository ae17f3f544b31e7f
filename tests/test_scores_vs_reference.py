"""OOD/misclass score-measure parity against the reference's
batch_dist_measures and predict_after_evaluate (cvae.py:919-1085),
executed as oracles on shared synthetic loss dictionaries."""

import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax.numpy as jnp

from joint_vae_tpu.models.cvnet import CVNetConfig
from joint_vae_tpu.ops.priors import build_prior_config
from joint_vae_tpu.ops.scores import (batch_dist_measures,
                                      predict_after_evaluate)

torch = pytest.importorskip('torch')

C, N, L1 = 10, 32, 4
RNG = np.random.default_rng(17)


def _stub_torchvision():
    if 'torchvision' in sys.modules:
        return
    class _Dummy:                          # noqa: E306
        def __init__(self, *a, **k):
            pass

    def _ga(name):
        if name.startswith('__'):
            raise AttributeError(name)
        return _Dummy
    tv = types.ModuleType('torchvision')
    for sub in ('models', 'transforms', 'datasets', 'utils'):
        m = types.ModuleType('torchvision.' + sub)
        m.__getattr__ = _ga
        setattr(tv, sub, m)
        sys.modules['torchvision.' + sub] = m
    tv.utils.save_image = lambda *a, **k: None
    tv.__path__ = []
    sys.modules['torchvision'] = tv


@pytest.fixture(scope='module')
def ref_net():
    _stub_torchvision()
    sys.path.insert(0, '/root/reference')
    try:
        from cvae import ClassificationVariationalNetwork as RefNet
    finally:
        sys.path.remove('/root/reference')
    return RefNet((1, 8, 8), C, type='cvae', features=None, encoder=[8],
                  latent_dim=4, decoder=[8], classifier=[4], gamma=100.0,
                  prior={'distribution': 'gaussian', 'num_priors': C,
                         'init_mean': 1.0, 'learned_means': True})


def _cfg():
    return CVNetConfig(input_shape=(1, 8, 8), num_labels=C, type='cvae',
                       encoder=(8,), latent_dim=4, decoder=(8,),
                       classifier=(4,), gamma=100.0,
                       prior=build_prior_config(4, 'gaussian', num_priors=C,
                                                init_mean=1.0,
                                                learned_means=True))


def _losses():
    """Per-class (C, N) loss dict + (N, C) logits shared by both sides."""
    t = {'total': RNG.normal(40, 5, (C, N)).astype(np.float32),
         'iws': RNG.normal(-40, 5, (C, N)).astype(np.float32),
         'kl': np.abs(RNG.normal(10, 3, (C, N))).astype(np.float32),
         'zdist': np.abs(RNG.normal(8, 3, (C, N))).astype(np.float32),
         'cross_x': np.abs(RNG.normal(20, 3, (N,))).astype(np.float32),
         'wmse': np.abs(RNG.normal(0.5, 0.1, (N,))).astype(np.float32),
         'y_est_already': RNG.integers(0, C, N).astype(np.int64)}
    logits = RNG.normal(0, 2, (N, C)).astype(np.float32)
    return t, logits


OOD_METHODS = ['elbo', 'iws', 'sum', 'max', 'softiws', 'softiws-2',
               'softkl', 'softkl-10', 'softzdist-5', 'zdist', 'kl',
               'logits', 'baseline', 'baseline-2', 'mag', 'std', 'mean',
               'nstd', 'hyz', 'IYx', 'mse', 'wmse',
               'elbo-2s', 'iws-a-4-1']


def test_batch_dist_measures_parity(ref_net):
    losses, logits = _losses()
    tl = {k: torch.tensor(v) for k, v in losses.items()}
    want = ref_net.batch_dist_measures(torch.tensor(logits), tl,
                                       OOD_METHODS)
    got = batch_dist_measures(_cfg(), jnp.asarray(logits),
                              {k: jnp.asarray(v) for k, v in losses.items()},
                              OOD_METHODS)
    assert set(got) == set(want)
    for m in OOD_METHODS:
        np.testing.assert_allclose(np.asarray(got[m]),
                                   want[m].numpy(), rtol=2e-4, atol=2e-4,
                                   err_msg=m)


PREDICT_METHODS = ['mean', 'loss', 'esty', 'closest', 'iws', 'already']


def test_predict_after_evaluate_parity(ref_net):
    losses, _ = _losses()
    # logits with the leading sample axis like evaluate's raw output
    logits = RNG.normal(0, 2, (L1, N, C)).astype(np.float32)
    tl = {k: torch.tensor(v) for k, v in losses.items()}
    cfg = _cfg()
    for m in PREDICT_METHODS:
        want = ref_net.predict_after_evaluate(torch.tensor(logits), tl,
                                              method=m)
        got = predict_after_evaluate(cfg, jnp.asarray(logits),
                                     {k: jnp.asarray(v)
                                      for k, v in losses.items()}, method=m)
        np.testing.assert_array_equal(np.asarray(got), want.numpy(),
                                      err_msg=m)

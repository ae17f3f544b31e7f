"""End-to-end evaluate() parity against the reference's actual
ClassificationVariationalNetwork (cvae.py:523-917), executed as an oracle
with transferred weights.

Determinism: both sides are built with beta=0 and latent_sampling=1, the
condition under which sampling collapses to the mean (ref cvae.py:276 —
`is_sampled=False` makes every sample equal µ, Sampling.forward
layers.py:230-244), so reconstructions, per-class losses, and logits are
bit-comparable up to float reduction order.  The iws estimate still
consumes the *random* ε vector on both sides and is excluded (its prior
log-density / log-q parts are oracle-tested in
tests/test_priors_vs_reference.py and tests/test_losses_vs_reference.py).
"""

import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from joint_vae_tpu.models.cvnet import CVNetConfig
from joint_vae_tpu.models.evaluate import evaluate
from joint_vae_tpu.ops.priors import build_prior_config
from joint_vae_tpu.ops.sigma import SigmaConfig
from joint_vae_tpu.save_load.jobs import new_job
from joint_vae_tpu.train.optimizers import OptimizerConfig

torch = pytest.importorskip('torch')

IN_SHAPE = (1, 8, 8)
C, K = 4, 6
SKIP_KEYS = {'iws'}          # consumes the (random) ε stream


def _stub_torchvision():
    if 'torchvision' in sys.modules:
        return
    class _Dummy:                                    # noqa: E306
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
def ref_cvnet():
    _stub_torchvision()
    sys.path.insert(0, '/root/reference')
    try:
        from cvae import ClassificationVariationalNetwork as RefNet
    finally:
        sys.path.remove('/root/reference')
    return RefNet


def _dense(sd, name):
    return {'kernel': jnp.asarray(sd[name + '.weight'].numpy().T),
            'bias': jnp.asarray(sd[name + '.bias'].numpy())}


def _transfer(sd, cfg):
    """Reference state_dict -> our params tree (featureless MLP models)."""
    p = {'encoder': {'dense_projs': {}, 'dense_mean': _dense(sd, 'encoder.dense_mean'),
                     'dense_log_var': _dense(sd, 'encoder.dense_log_var')},
         'prior': {'mean': jnp.asarray(sd['encoder.prior.mean'].numpy()),
                   'var_param': jnp.asarray(
                       sd['encoder.prior._var_parameter'].numpy())}}
    for i in range(len(cfg.encoder)):
        p['encoder']['dense_projs']['dense_{}'.format(i)] = _dense(
            sd, 'encoder.dense_projs.{}'.format(i))
    if cfg.x_is_generated:
        p['decoder'] = {}
        for i in range(len(cfg.decoder)):
            # torch Sequential interleaves activations at odd indices
            p['decoder']['dense_{}'.format(i)] = _dense(
                sd, 'decoder.{}'.format(2 * i))
        if not cfg.upsampler:
            p['imager'] = {'dense': _dense(sd, 'imager.0')}
    if cfg.classifier:
        p['classifier'] = {}
        dims = [d for d in cfg.classifier if isinstance(d, int)]
        for i in range(len(dims)):
            p['classifier']['dense_{}'.format(i)] = _dense(
                sd, 'classifier.{}'.format(2 * i))
        p['classifier']['head'] = _dense(
            sd, 'classifier.{}'.format(2 * len(dims)))
    return p


def _build_pair(ref_cvnet, type_, prior_kw, gamma, y_is_coded=False):
    ref = ref_cvnet(IN_SHAPE, C, type=type_, features=None,
                    y_is_coded=y_is_coded,
                    encoder=[16], latent_dim=K, decoder=[16],
                    classifier=[8], latent_sampling=1,
                    test_latent_sampling=3, beta=0.0, gamma=gamma,
                    sigma={'value': 0.5}, output_activation='sigmoid',
                    prior=dict(prior_kw))
    ref.eval()
    for mod in ref.modules():
        if type(mod).__name__ == 'Sampling':
            assert not mod.is_sampled      # beta=0, L=1 (ref cvae.py:276)
    cfg = CVNetConfig(
        input_shape=IN_SHAPE, num_labels=C, type=type_,
        y_is_coded=y_is_coded,
        encoder=(16,), latent_dim=K, decoder=(16,), classifier=(8,),
        latent_sampling=1, test_latent_sampling=3, beta=0.0, gamma=gamma,
        sigma=SigmaConfig(value=0.5), output_activation='sigmoid',
        prior=build_prior_config(K, prior_kw.get('distribution', 'gaussian'),
                                 **{k: v for k, v in prior_kw.items()
                                    if k != 'distribution'}))
    job = new_job(cfg, OptimizerConfig(), key=jax.random.PRNGKey(0))
    params = dict(job.state.params)
    params.update(_transfer(ref.state_dict(), cfg))
    job.state = job.state.replace(params=params)
    return ref, job


def _compare(ref, job, y=None, rtol=2e-4, atol=2e-4):
    rng = np.random.default_rng(42)
    x = rng.uniform(0, 1, (5,) + IN_SHAPE).astype(np.float32)
    ty = torch.tensor(y) if y is not None else None
    with torch.no_grad():
        x_r, logits, losses, _ = ref.evaluate(
            torch.tensor(x), y=ty)
    out = evaluate(job.model, job.state.variables, jnp.asarray(x),
                   jnp.asarray(y) if y is not None else None,
                   rng=jax.random.PRNGKey(1),
                   sigma_state=job.state.sigma_state, train=False)
    compared = []
    for k, v in losses.items():
        if k in SKIP_KEYS or k not in out.losses:
            continue
        got = np.asarray(out.losses[k])
        want = v.numpy()
        if got.shape != want.shape:
            continue
        np.testing.assert_allclose(got, want, rtol=rtol, atol=atol,
                                   err_msg='loss {}'.format(k))
        compared.append(k)
    assert {'kl', 'zdist'} <= set(compared), compared
    if ref.x_is_generated:
        np.testing.assert_allclose(np.asarray(out.x_reco), x_r.numpy(),
                                   rtol=rtol, atol=atol)
    if ref.y_is_decoded:
        # without a decoded y both sides keep an untrained vestigial head
        # (ours a bare Dense, the reference the full classifier MLP) that
        # no loss or method consumes — logits only comparable when decoded
        np.testing.assert_allclose(np.asarray(out.logits), logits.numpy(),
                                   rtol=rtol, atol=atol)
    return compared


def test_cvae_label_free(ref_cvnet):
    """Per-class evaluation: our prior-broadcast path vs the reference's
    C x N input expansion (cvae.py:589-599)."""
    ref, job = _build_pair(
        ref_cvnet, 'cvae',
        {'distribution': 'gaussian', 'num_priors': C, 'init_mean': 1.0,
         'learned_means': True}, gamma=100.0)
    compared = _compare(ref, job)
    assert 'cross_x' in compared and 'cross_y' in compared
    assert 'total' in compared and 'wmse' in compared


def test_cvae_with_labels(ref_cvnet):
    ref, job = _build_pair(
        ref_cvnet, 'cvae',
        {'distribution': 'gaussian', 'num_priors': C, 'init_mean': 1.0,
         'learned_means': True}, gamma=100.0)
    y = np.array([0, 1, 2, 3, 1], np.int64)
    _compare(ref, job, y=y)


def test_cvae_tilted_prior(ref_cvnet):
    ref, job = _build_pair(
        ref_cvnet, 'cvae',
        {'distribution': 'tilted', 'num_priors': C, 'tau': 25.0},
        gamma=100.0)
    _compare(ref, job)


def test_vae(ref_cvnet):
    ref, job = _build_pair(
        ref_cvnet, 'vae', {'distribution': 'gaussian', 'num_priors': 1},
        gamma=0.0)
    y = None
    compared = _compare(ref, job, y=y)
    assert 'cross_x' in compared


def test_jvae_coded(ref_cvnet):
    """y concatenated one-hot into the encoder input (layers.py:350-403).

    Labeled evaluation only: the reference's label-free coded path crashes
    for featureless models (forward() recomputes batch_shape from the raw
    x and discards the C-expanded features, cvae.py:437-451) — coded
    label-free parity is covered by the conv-features test below."""
    ref, job = _build_pair(
        ref_cvnet, 'jvae',
        {'distribution': 'gaussian', 'num_priors': 1}, gamma=1.0,
        y_is_coded=True)
    y = np.array([0, 1, 2, 3, 1], np.int64)
    _compare(ref, job, y=y)


def test_xvae_coded(ref_cvnet):
    ref, job = _build_pair(
        ref_cvnet, 'xvae',
        {'distribution': 'gaussian', 'num_priors': C, 'init_mean': 1.0,
         'learned_means': True}, gamma=0.0, y_is_coded=True)
    y = np.array([0, 1, 2, 3, 1], np.int64)
    _compare(ref, job, y=y)


def _conv_kernel(w):
    return jnp.asarray(w.numpy().transpose(2, 3, 1, 0))    # OIHW -> HWIO


def _deconv_kernel(w):
    # the framework stores deconv kernels in correlation orientation
    # (lax.conv_general_dilated with lhs_dilation); torch ConvTranspose2d
    # weights are the 180-degree flip of that (models/conv.py parity)
    return jnp.asarray(w.numpy()[:, :, ::-1, ::-1].transpose(2, 3, 0, 1).copy())


def test_cvae_conv_features_and_upsampler(ref_cvnet):
    """Conv features + deconv upsampler: oracles the ConvStack lowerings
    (incl. the packed/subpixel/matmul decoder paths, models/conv.py) inside
    the full model against torch's Conv2d/ConvTranspose2d, label-free and
    labeled."""
    ref = ref_cvnet(IN_SHAPE, C, type='cvae', features='8x3+1:2',
                    upsampler='4x8+0-!1x3+1',
                    encoder=[16], latent_dim=K, decoder=[16],
                    classifier=[8], latent_sampling=1,
                    test_latent_sampling=3, beta=0.0, gamma=100.0,
                    sigma={'value': 0.5}, output_activation='sigmoid',
                    prior={'distribution': 'gaussian', 'num_priors': C,
                           'init_mean': 1.0, 'learned_means': True})
    ref.eval()
    cfg = CVNetConfig(
        input_shape=IN_SHAPE, num_labels=C, type='cvae',
        features='8x3+1:2', upsampler='4x8+0-!1x3+1',
        encoder=(16,), latent_dim=K, decoder=(16,), classifier=(8,),
        latent_sampling=1, test_latent_sampling=3, beta=0.0, gamma=100.0,
        sigma=SigmaConfig(value=0.5), output_activation='sigmoid',
        prior=build_prior_config(K, 'gaussian', num_priors=C,
                                 init_mean=1.0, learned_means=True))
    job = new_job(cfg, OptimizerConfig(), key=jax.random.PRNGKey(0))
    sd = ref.state_dict()
    params = dict(job.state.params)
    params.update(_transfer(sd, cfg))
    params['features_stack'] = {
        'conv_0': {'kernel': _conv_kernel(sd['features.0.weight']),
                   'bias': jnp.asarray(sd['features.0.bias'].numpy())}}
    params['imager'] = {
        'deconv_0': {'kernel': _deconv_kernel(sd['imager.0.weight']),
                     'bias': jnp.asarray(sd['imager.0.bias'].numpy())},
        'conv_1': {'kernel': _conv_kernel(sd['imager.2.weight']),
                   'bias': jnp.asarray(sd['imager.2.bias'].numpy())}}
    job.state = job.state.replace(params=params)
    compared = _compare(ref, job, rtol=5e-4, atol=5e-4)
    assert 'cross_x' in compared
    y = np.array([0, 1, 2, 3, 1], np.int64)
    _compare(ref, job, y=y, rtol=5e-4, atol=5e-4)


def test_vib(ref_cvnet):
    ref, job = _build_pair(
        ref_cvnet, 'vib', {'distribution': 'gaussian', 'num_priors': 1},
        gamma=0.0)
    y = np.array([0, 1, 2, 3, 1], np.int64)
    _compare(ref, job, y=y)


def test_iws_with_injected_epsilon(ref_cvnet, monkeypatch):
    """The IWAE estimate with actual sampling: identical ε injected into
    both sides (the reference via torch.randn, ours via reparameterize)
    makes every loss incl. iws and the stabilized log-mean-exp
    (cvae.py:679-870) bit-comparable."""
    import torch as _torch
    ref = ref_cvnet(IN_SHAPE, C, type='cvae', features=None,
                    encoder=[16], latent_dim=K, decoder=[16],
                    classifier=[8], latent_sampling=2,
                    test_latent_sampling=3, beta=1e-3, gamma=100.0,
                    sigma={'value': 0.5}, output_activation='sigmoid',
                    prior={'distribution': 'gaussian', 'num_priors': C,
                           'init_mean': 1.0, 'learned_means': True})
    ref.eval()
    cfg = CVNetConfig(
        input_shape=IN_SHAPE, num_labels=C, type='cvae',
        encoder=(16,), latent_dim=K, decoder=(16,), classifier=(8,),
        latent_sampling=2, test_latent_sampling=3, beta=1e-3, gamma=100.0,
        sigma=SigmaConfig(value=0.5), output_activation='sigmoid',
        prior=build_prior_config(K, 'gaussian', num_priors=C,
                                 init_mean=1.0, learned_means=True))
    job = new_job(cfg, OptimizerConfig(), key=jax.random.PRNGKey(0))
    params = dict(job.state.params)
    params.update(_transfer(ref.state_dict(), cfg))
    job.state = job.state.replace(params=params)

    N = 5
    eps = np.random.default_rng(7).normal(
        0, 1, (4, N, K)).astype(np.float32)            # (l+1, N, K)
    eps[0] = 0.0

    real_randn = _torch.randn

    def fake_randn(*size, **kw):
        if size and isinstance(size[0], tuple):
            size = size[0]
        if tuple(size) == eps.shape:
            return _torch.tensor(eps)
        return real_randn(*size, **kw)
    monkeypatch.setattr(_torch, 'randn', fake_randn)

    import joint_vae_tpu.models.evaluate as ev

    def fake_reparameterize(key, mu, log_var, L, dist, sampled):
        e = jnp.asarray(eps)
        z = mu[None] + jnp.exp(0.5 * log_var)[None] * e * float(sampled)
        return z, e[1:]
    monkeypatch.setattr(ev, 'reparameterize', fake_reparameterize)

    x = np.random.default_rng(42).uniform(
        0, 1, (N,) + IN_SHAPE).astype(np.float32)
    with torch.no_grad():
        _, logits, losses, _ = ref.evaluate(torch.tensor(x))
    out = ev.evaluate(job.model, job.state.variables, jnp.asarray(x), None,
                      rng=jax.random.PRNGKey(1),
                      sigma_state=job.state.sigma_state, train=False)
    for k, v in losses.items():
        got = np.asarray(out.losses[k])
        want = v.numpy()
        assert got.shape == want.shape, k
        np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4,
                                   err_msg='loss {}'.format(k))
    assert 'iws' in losses

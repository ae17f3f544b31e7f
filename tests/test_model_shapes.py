"""Shape-grid tests across the five model types (ref tests/test_dims.py).

Checks forward/eval output shapes, the (C, N) vs (N,) loss-shape dispatch,
and that the whole evaluation engine runs under jit.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from joint_vae_tpu.models.cvnet import CVNet, CVNetConfig
from joint_vae_tpu.models.evaluate import evaluate
from joint_vae_tpu.ops.priors import PriorConfig
from joint_vae_tpu.ops.sigma import SigmaConfig, init_sigma_state

INPUT_SHAPE = (1, 8, 8)
C = 4
N = 5
K = 8
L_TRAIN, L_TEST = 2, 3


def make_model(type_: str, **kw) -> CVNet:
    cfg = CVNetConfig(
        input_shape=INPUT_SHAPE, num_labels=C, type=type_,
        encoder=(16,), decoder=(16,), classifier=(8,),
        latent_dim=K, latent_sampling=L_TRAIN, test_latent_sampling=L_TEST,
        gamma=100.0 if type_ in ('cvae', 'vae') else 0.0,
        sigma=SigmaConfig(value=0.5),
        **kw)
    return CVNet(cfg)


def init_model(model, y_coded=False):
    x = jnp.zeros((N, *INPUT_SHAPE))
    y = jnp.zeros((N,), jnp.int32)
    return model.init({'params': jax.random.PRNGKey(0),
                       'sampling': jax.random.PRNGKey(1)},
                      x, y if model.cfg.y_is_coded else None)


RNG = np.random.default_rng(0)
X = jnp.array(RNG.uniform(size=(N, *INPUT_SHAPE)).astype(np.float32))
Y = jnp.array(RNG.integers(0, C, size=(N,)))


@pytest.mark.parametrize('type_', ['jvae', 'cvae', 'xvae', 'vae', 'vib'])
def test_forward_shapes(type_):
    model = make_model(type_, y_is_coded=type_ in ('jvae', 'xvae'))
    variables = init_model(model)
    x_reco, logits, mu, log_var, z = model.apply(
        variables, X, Y if model.cfg.y_is_coded else None, train=True,
        rngs={'sampling': jax.random.PRNGKey(2)})
    assert mu.shape == (N, K)
    assert z.shape == (L_TRAIN + 1, N, K)
    assert logits.shape == (L_TRAIN + 1, N, C)
    if model.cfg.x_is_generated:
        assert x_reco.shape == (L_TRAIN + 1, N, *INPUT_SHAPE)
    else:
        assert x_reco.shape == (N, *INPUT_SHAPE)


@pytest.mark.parametrize('type_', ['jvae', 'cvae', 'xvae', 'vae', 'vib'])
def test_evaluate_with_labels_train(type_):
    model = make_model(type_, y_is_coded=type_ in ('jvae', 'xvae'))
    variables = init_model(model)
    st = init_sigma_state(model.cfg.sigma_cfg)
    out = evaluate(model, variables, X, Y, rng=jax.random.PRNGKey(3),
                   sigma_state=st, train=True, with_beta=True)
    # with labels every loss is per-item (N,)
    for k, v in out.losses.items():
        assert v.shape == (N,), (type_, k, v.shape)
    assert out.logits.shape == (N, C)
    for k, v in out.measures.items():
        assert v.shape == (), (type_, k)


@pytest.mark.parametrize('type_,per_class',
                         [('jvae', True), ('cvae', True), ('xvae', True),
                          ('vae', False), ('vib', False)])
def test_evaluate_label_free(type_, per_class):
    model = make_model(type_, y_is_coded=type_ in ('jvae', 'xvae'))
    variables = init_model(model)
    st = init_sigma_state(model.cfg.sigma_cfg)
    out = evaluate(model, variables, X, None, rng=jax.random.PRNGKey(4),
                   sigma_state=st, train=False)
    total = out.losses['total']
    if per_class:
        assert total.shape == (C, N), (type_, total.shape)
    else:
        assert total.shape[-1] == N
    if 'iws' in model.cfg.loss_components and model.cfg.x_is_generated:
        assert 'iws' in out.losses
        if per_class:
            assert out.losses['iws'].shape == (C, N)
    # kl shape: conditional priors give (C, N), unconditional (N,)
    if model.cfg.prior.conditional and per_class:
        assert out.losses['kl'].shape == (C, N)


def test_cvae_per_class_encodes_once():
    """cvae (labels not coded): encoder runs on (N, ...), class axis only in
    the prior — mu must be (N, K) while kl is (C, N)."""
    model = make_model('cvae')
    variables = init_model(model)
    st = init_sigma_state(model.cfg.sigma_cfg)
    out = evaluate(model, variables, X, None, rng=jax.random.PRNGKey(5),
                   sigma_state=st, train=False)
    assert out.mu.shape == (N, K)
    assert out.losses['kl'].shape == (C, N)
    assert out.losses['cross_x'].shape == (N,)
    assert out.losses['cross_y'].shape == (C, N)


def test_xvae_per_class_expands_input():
    model = make_model('xvae', y_is_coded=True)
    variables = init_model(model)
    st = init_sigma_state(model.cfg.sigma_cfg)
    out = evaluate(model, variables, X, None, rng=jax.random.PRNGKey(6),
                   sigma_state=st, train=False)
    assert out.mu.shape == (C, N, K)
    assert out.losses['kl'].shape == (C, N)
    assert out.losses['cross_x'].shape == (C, N)


def test_evaluate_under_jit():
    model = make_model('cvae')
    variables = init_model(model)
    st = init_sigma_state(model.cfg.sigma_cfg)

    @functools.partial(jax.jit, static_argnames=('train',))
    def f(variables, x, y, key, train=True):
        out = evaluate(model, variables, x, y, rng=key, sigma_state=st,
                       train=train, with_beta=True)
        return out.losses['total'], out.measures['mse']

    t1, m1 = f(variables, X, Y, jax.random.PRNGKey(7))
    t2, m2 = f(variables, X, Y, jax.random.PRNGKey(7))
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2))
    assert np.isfinite(np.asarray(t1)).all()
    assert float(m1) > 0


def test_iws_modes_differ_but_correlate():
    model_ref = make_model('cvae')
    cfg_lme = CVNetConfig(**{**{f.name: getattr(model_ref.cfg, f.name)
                                for f in model_ref.cfg.__dataclass_fields__.values()},
                             'iws_mode': 'lme'})
    model_lme = CVNet(cfg_lme)
    variables = init_model(model_ref)
    st = init_sigma_state(model_ref.cfg.sigma_cfg)
    o_ref = evaluate(model_ref, variables, X, None, rng=jax.random.PRNGKey(8),
                     sigma_state=st, train=False)
    o_lme = evaluate(model_lme, variables, X, None, rng=jax.random.PRNGKey(8),
                     sigma_state=st, train=False)
    a, b = np.asarray(o_ref.losses['iws']), np.asarray(o_lme.losses['iws'])
    assert a.shape == b.shape == (C, N)
    # reference estimator = mean(exp(d)) + max >= log(mean(exp(d))) + max
    assert (a >= b - 1e-5).all()


def test_categorical_output_distribution():
    model = make_model('vae', output_distribution='categorical')
    variables = init_model(model)
    st = init_sigma_state(model.cfg.sigma_cfg)
    x_reco, logits, mu, lv, z = model.apply(
        variables, X, None, train=True,
        rngs={'sampling': jax.random.PRNGKey(9)})
    assert x_reco.shape == (L_TRAIN + 1, N, 256, *INPUT_SHAPE)
    out = evaluate(model, variables, X, Y, rng=jax.random.PRNGKey(10),
                   sigma_state=st, train=True)
    assert out.losses['cross_x'].shape == (N,)
    assert np.isfinite(np.asarray(out.losses['total'])).all()


def test_forced_variance_and_softmax_classifier():
    cfg = CVNetConfig(
        input_shape=INPUT_SHAPE, num_labels=C, type='cvae',
        encoder=(16,), decoder=(16,), classifier=('softmax',),
        latent_dim=K, latent_sampling=2, gamma=1.0,
        encoder_forced_variance=1.0,
        prior=PriorConfig(dim=K, distribution='tilted', tau=10.0,
                          num_priors=C),
        sigma=SigmaConfig(value=0.7071))
    model = CVNet(cfg)
    variables = init_model(model)
    st = init_sigma_state(cfg.sigma_cfg)
    out = evaluate(model, variables, X, Y, rng=jax.random.PRNGKey(11),
                   sigma_state=st, train=True)
    np.testing.assert_allclose(np.asarray(out.log_var), 0.0, atol=1e-6)
    assert out.logits.shape == (N, C)
    # no classifier MLP params should exist
    assert 'classifier' not in variables['params']

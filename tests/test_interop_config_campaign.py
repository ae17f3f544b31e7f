"""Interop campaign over the reference's own named configs: every live
architecture in /root/reference/config.ini round-trips through the
exporter — our job loads under the reference's own CVNet.load and
reproduces our evaluate losses, and re-imports bitwise.

Determinism overrides per the standing oracle recipe (beta=0,
latent_sampling=1 — ref cvae.py:276 collapses sampling to the mean); the
ARCHITECTURE (features/upsampler/encoder/decoder/classifier/prior/sigma)
is the section's own.  Sections whose reference ctor is bit-rotted
upstream (list upsamplers / unnamed 'conv' features TypeError in its own
build_de_conv_layers) are excluded: fashion-vgg16, mnist-5A, autoencoder,
cifar-ola, dai-iclr20; imagenet names a dataset (imagenet21k) absent from
the reference's own sets.ini too; vgg-baseline is degenerate upstream (28px mnist through vgg11's
five pools leaves a 0-size encoder input — torch silently builds
zero-element Linears, i.e. a constant encoder).
"""

import dataclasses
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import torch

import jax
import jax.numpy as jnp

from joint_vae_tpu.models.evaluate import evaluate
from joint_vae_tpu.save_load.checkpoint import flatten_pytree
from joint_vae_tpu.save_load.export_reference import export_to_reference_job
from joint_vae_tpu.save_load.import_reference import import_reference_job
from joint_vae_tpu.save_load.jobs import new_job, save_job, load_job
from joint_vae_tpu.utils.parameters import (get_args, model_config_from_args,
                                            optimizer_config_from_args)

from test_export_reference import _stub_torchvision  # noqa: E402

REF_INI = '/root/reference/config.ini'
SKIP_KEYS = {'iws', 'total', 'dzdist'}

# distinct live architecture classes (cifar10-vgg = vgg19 repeats the
# svhn/vgg16 class at higher cost)
SECTIONS = ['DEFAULT', 'mnist-dense', 'mnist-vgg', 'tilted', 'cifar10',
            'svhn', 'fashion']


@pytest.fixture(scope='module')
def ref_net_cls():
    _stub_torchvision()
    import sys
    sys.path.insert(0, '/root/reference')
    try:
        from cvae import ClassificationVariationalNetwork as RefNet
    finally:
        sys.path.remove('/root/reference')
    return RefNet


@pytest.mark.parametrize('section', SECTIONS)
def test_config_arch_roundtrip(ref_net_cls, tmp_path, section):
    args = get_args(['--config-file', REF_INI, '--config', section])
    cfg = model_config_from_args(args)
    cfg = dataclasses.replace(cfg, beta=0.0, latent_sampling=1,
                              test_latent_sampling=3)
    job = new_job(cfg, optimizer_config_from_args(args),
                  key=jax.random.PRNGKey(1), job_number=21)
    job.train_history = {'epochs': 1}
    src = str(tmp_path / 'src')
    save_job(job, src)

    dst = str(tmp_path / 'ref')
    export_to_reference_job(src, dst)
    net = ref_net_cls.load(dst, load_state=True)
    net.eval()

    x = np.random.default_rng(3).uniform(
        0, 1, (4,) + tuple(cfg.input_shape)).astype(np.float32)
    y = (None if cfg.type == 'vae'
         else np.arange(4, dtype=np.int64) % cfg.num_labels)
    with torch.no_grad():
        _, _, ref_losses, _ = net.evaluate(
            torch.tensor(x), y=torch.tensor(y) if y is not None else None)
    out = evaluate(job.model, job.state.variables, jnp.asarray(x),
                   jnp.asarray(y) if y is not None else None,
                   rng=jax.random.PRNGKey(2),
                   sigma_state=job.state.sigma_state, train=False)
    compared = []
    for k, v in ref_losses.items():
        if k in SKIP_KEYS or k not in out.losses:
            continue
        got, want = np.asarray(out.losses[k]), v.numpy()
        if got.shape != want.shape:
            continue
        np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4,
                                   err_msg='{} loss {}'.format(section, k))
        compared.append(k)
    assert {'kl', 'zdist'} <= set(compared), (section, compared)

    back = str(tmp_path / 'back')
    import_reference_job(dst, back)
    job2 = load_job(back)
    a, b = (flatten_pytree(job.state.params),
            flatten_pytree(job2.state.params))
    assert set(a) == set(b), section
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg='{} {}'.format(section, k))

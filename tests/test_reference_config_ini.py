"""The reference's own config.ini trains here verbatim: its named sections
resolve through our --config-file/--config loader to the same model and
optimizer configurations (ref config.ini:1-366, utils/parameters.py:179-219).
"""

import pytest

pytestmark = pytest.mark.slow

from joint_vae_tpu.utils.parameters import (get_args, model_config_from_args,
                                            optimizer_config_from_args)

REF_INI = '/root/reference/config.ini'


def _resolve(section):
    args = get_args(['--config-file', REF_INI, '--config', section])
    return args, model_config_from_args(args), optimizer_config_from_args(args)


def test_default_section():
    args, cfg, opt = _resolve('DEFAULT')
    assert args.dataset == 'mnist' and cfg.type == 'cvae'
    assert cfg.features is None                       # 'features = none'
    assert cfg.latent_dim == 256 and cfg.latent_sampling == 1
    assert cfg.test_latent_sampling == 128
    assert cfg.encoder == (512, 256) and cfg.decoder == (256, 512)
    assert cfg.gamma == 1000 and cfg.batch_norm == 'both'
    assert cfg.sigma.value == pytest.approx(0.1) and not cfg.sigma.learned
    assert cfg.prior.distribution == 'gaussian'
    assert cfg.prior.num_priors == 10 and cfg.prior.learned_means
    assert opt.optim_type == 'adam' and opt.lr == pytest.approx(1e-3)
    assert opt.weight_decay == pytest.approx(3e-5)
    assert opt.grad_clipping == pytest.approx(100)
    assert args.epochs == 200 and args.batch_size == 64
    assert args.validation == 8192 and args.test_sample_size == 1024


def test_cifar10_section():
    args, cfg, opt = _resolve('cifar10')
    assert args.dataset == 'cifar10'
    assert cfg.features == 'conv32' and cfg.upsampler == 'deconv32'
    assert cfg.encoder == () and cfg.decoder == ()
    assert cfg.sigma.learned and cfg.sigma.value == 1.0   # 'sigma = learned'
    assert cfg.gamma == 0 and cfg.output_activation == 'linear'
    assert sorted(args.data_augmentation) == ['crop', 'flip']
    assert args.epochs == 600 and args.validation == 1024


def test_tilted_section():
    args, cfg, opt = _resolve('tilted')
    assert cfg.type == 'vae' and args.dataset == 'cifar10'
    assert cfg.prior.distribution == 'tilted'
    assert cfg.prior.tau == pytest.approx(25.0)
    assert cfg.prior.num_priors == 1 and not cfg.prior.learned_means
    assert cfg.latent_dim == 100
    assert cfg.sigma.value == pytest.approx(0.7071)
    assert cfg.test_latent_sampling == 1
    assert opt.lr == pytest.approx(1e-4)
    assert args.epochs == 250 and args.validation == 0


def test_wim_default_section():
    """The WIM CLI reads [wim-default] through the same loader
    (ref ft/__main__.py config handling)."""
    from joint_vae_tpu.utils.parameters import load_config_section
    d = load_config_section(REF_INI, 'wim-default')
    assert d['train_size'] == 100000 and d['moving_size'] == 512
    assert d['alpha'] == pytest.approx(0.1) and d['mix'] == pytest.approx(0.5)
    assert d['tau'] == 25


def test_learned_sigma_with_init():
    """'learned--0.2' grammar: learned log-sigma from a given start
    (ref train.py:141-148)."""
    args = get_args(['--sigma', 'learned--0.2', '--dataset', 'mnist'])
    cfg = model_config_from_args(args)
    assert cfg.sigma.learned and cfg.sigma.value == pytest.approx(0.2)

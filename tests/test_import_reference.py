"""Reference-job importer oracle: build reference CVNets in-process, save
them with the REFERENCE'S OWN save() (ref cvae.py:2650-2675), import the
job dirs, and assert the native job reproduces the reference's evaluate
losses to 5e-4 and is consumable by fetch_models / the test CLI.
"""

import os
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import torch

import jax
import jax.numpy as jnp

from joint_vae_tpu.models.evaluate import evaluate
from joint_vae_tpu.save_load.import_reference import (
    import_reference_job, ImportError_)
from joint_vae_tpu.save_load.jobs import load_job

IN_SHAPE = (1, 8, 8)
C, K = 4, 6
SKIP_KEYS = {'iws', 'total', 'dzdist'}     # iws needs injected eps; total has
                                           # stochastic parts at L>0


def _stub_torchvision():
    if 'torchvision' in sys.modules:
        return

    class _Dummy:
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
def ref():
    _stub_torchvision()
    sys.path.insert(0, '/root/reference')
    try:
        import cvae as ref_cvae
        from utils.save_load.recorders import LossRecorder as RefRecorder
    finally:
        sys.path.remove('/root/reference')
    return types.SimpleNamespace(Net=ref_cvae.ClassificationVariationalNetwork,
                                 Recorder=RefRecorder)


def _save_reference_job(net, dir_name, epochs=2, with_recorder=True,
                        ref_mod=None):
    """Mark as trained, attach results, save with the reference's save()."""
    net.eval()
    net.trained = epochs
    net.train_history['epochs'] = epochs
    net.testing = {epochs: {'iws': {'n': 64, 'epochs': epochs,
                                    'sampling': 3, 'accuracy': 0.75}}}
    net.ood_results = {epochs: {'fashion': {'iws': {
        'n': 64, 'auc': 0.9, 'tpr': [0.95], 'fpr': [0.2],
        'thresholds': [0.0], 'epochs': epochs}}}}
    net.save(dir_name)
    if with_recorder:
        rec = ref_mod.Recorder(10)
        g = torch.Generator().manual_seed(3)
        for n in (10, 10, 7):
            rec.append_batch(kl=torch.randn(C, n, generator=g),
                             y_true=torch.randint(0, C, (n,), generator=g))
        rec_dir = os.path.join(dir_name, 'samples', str(epochs))
        os.makedirs(rec_dir, exist_ok=True)
        rec.save(os.path.join(rec_dir, 'record-mnist.pth'))
    return dir_name


def _compare_losses(net, job, y=None, rtol=5e-4, atol=5e-4):
    x = np.random.default_rng(42).uniform(
        0, 1, (5,) + IN_SHAPE).astype(np.float32)
    with torch.no_grad():
        x_r, logits, losses, _ = net.evaluate(
            torch.tensor(x), y=torch.tensor(y) if y is not None else None)
    out = evaluate(job.model, job.state.variables, jnp.asarray(x),
                   jnp.asarray(y) if y is not None else None,
                   rng=jax.random.PRNGKey(1),
                   sigma_state=job.state.sigma_state, train=False)
    compared = []
    for k, v in losses.items():
        if k in SKIP_KEYS or k not in out.losses:
            continue
        got, want = np.asarray(out.losses[k]), v.numpy()
        if got.shape != want.shape:
            continue
        np.testing.assert_allclose(got, want, rtol=rtol, atol=atol,
                                   err_msg='loss {}'.format(k))
        compared.append(k)
    assert {'kl', 'zdist'} <= set(compared), compared
    return compared


def _conv_net(ref, **kw):
    args = dict(type='cvae', features='8x3+1:2-16x3+1',
                upsampler='4x8+0-!1x3+1', batch_norm='both',
                encoder=[16, 16], latent_dim=K, decoder=[16],
                classifier=[8], latent_sampling=1, test_latent_sampling=3,
                beta=0.0, gamma=10., output_activation='sigmoid',
                sigma={'learned': True, 'value': 0.5},
                prior={'distribution': 'tilted', 'num_priors': C, 'tau': 5.,
                       'init_mean': 1.0, 'learned_means': True})
    args.update(kw)
    net = ref.Net(IN_SHAPE, C, **args)
    # randomize batch-norm stats so the import is actually exercised
    g = torch.Generator().manual_seed(11)
    for m in net.modules():
        if type(m).__name__ == 'BatchNorm2d':
            m.running_mean.copy_(torch.randn(m.running_mean.shape,
                                             generator=g) * 0.1)
            m.running_var.copy_(1 + 0.3 * torch.rand(m.running_var.shape,
                                                     generator=g))
    return net


@pytest.fixture(scope='module')
def imported_conv(ref, tmp_path_factory):
    """The flagship import case: conv+bn features/imager, learned sigma,
    conditional tilted prior — saved by the reference, imported by us."""
    root = tmp_path_factory.mktemp('refjobs')
    net = _conv_net(ref)
    src = _save_reference_job(net, str(root / 'src' / '7'), ref_mod=ref)
    dst = str(root / 'jobs' / '7')
    import_reference_job(src, dst)
    return types.SimpleNamespace(net=net, src=src, dst=dst,
                                 jobs_root=str(root / 'jobs'))


def test_import_evaluate_parity_conv(imported_conv):
    job = load_job(imported_conv.dst)
    compared = _compare_losses(imported_conv.net, job)
    assert 'cross_x' in compared and 'cross_y' in compared


def test_import_metadata_and_results(imported_conv):
    job = load_job(imported_conv.dst, ghost=True)
    assert job.job_number == 7
    assert job.trained == 2
    assert job.testing[2]['iws']['accuracy'] == 0.75
    assert job.ood_results[2]['fashion']['iws']['auc'] == 0.9
    assert job.training_parameters['from_reference'] == imported_conv.src
    # sigma state carries the reference's learned log-sigma
    assert np.isclose(float(job.model_cfg.sigma_cfg.value), 0.5)


def test_import_recorders(imported_conv, ref):
    from joint_vae_tpu.save_load.recorders import LossRecorder, find_record
    # zero-padded epoch dir: the layout engines/dictify/ft resolve
    rec_dir = os.path.join(imported_conv.dst, 'samples', '{:04d}'.format(2))
    path = find_record(rec_dir, 'mnist')
    assert path is not None and path.endswith('.jvr')
    ours = LossRecorder.load(path)
    theirs = ref.Recorder.load(
        os.path.join(imported_conv.src, 'samples', '2', 'record-mnist.pth'))
    assert ours.recorded_samples == 27
    np.testing.assert_array_equal(ours.get('kl'), theirs['kl'].numpy())
    np.testing.assert_array_equal(ours.get('y_true'),
                                  theirs['y_true'].numpy())


def test_imported_job_feeds_fetch_and_test_cli(imported_conv, capsys):
    from joint_vae_tpu.save_load.fetch import fetch_models
    models = fetch_models(imported_conv.jobs_root, flash=False)
    assert len(models) == 1 and models[0]['job'] == 7

    from joint_vae_tpu.cli.test import main
    assert main(['--job-dir', imported_conv.jobs_root]) == 0
    out = capsys.readouterr().out
    assert 'fashion' in out and '0.9' in out


def test_import_mlp_gaussian(ref, tmp_path):
    """Featureless MLP path: dense imager, plain gaussian conditional
    prior, constant sigma, labeled + label-free evaluate parity."""
    net = ref.Net(IN_SHAPE, C, type='cvae', features=None,
                  encoder=[16], latent_dim=K, decoder=[16],
                  classifier=[8], latent_sampling=1, test_latent_sampling=3,
                  beta=0.0, gamma=100., sigma={'value': 0.5},
                  output_activation='sigmoid',
                  prior={'distribution': 'gaussian', 'num_priors': C,
                         'init_mean': 1.0, 'learned_means': True})
    src = _save_reference_job(net, str(tmp_path / 'src' / '3'),
                              with_recorder=False, ref_mod=ref)
    dst = str(tmp_path / 'jobs' / '3')
    import_reference_job(src, dst)
    job = load_job(dst)
    compared = _compare_losses(net, job)
    assert 'cross_x' in compared


def test_import_uniform_prior(ref, tmp_path):
    """Conditional uniform-with-gaussian-tail prior (the non-conditional
    spelling trips a broadcast bug in the reference's own evaluate)."""
    net = ref.Net(IN_SHAPE, C, type='cvae', features=None,
                  encoder=[16], latent_dim=K, decoder=[16],
                  classifier=[8], latent_sampling=1, test_latent_sampling=3,
                  beta=0.0, gamma=0., sigma={'value': 0.5},
                  output_activation='sigmoid',
                  prior={'distribution': 'uniform', 'num_priors': C,
                         'init_mean': 1.0, 'learned_means': True})
    src = _save_reference_job(net, str(tmp_path / 'src' / '4'),
                              with_recorder=False, ref_mod=ref)
    dst = str(tmp_path / 'jobs' / '4')
    import_reference_job(src, dst)
    job = load_job(dst)
    _compare_losses(net, job)


def test_import_rejects_malformed_resnet_trunk(tmp_path):
    """resnet trunks import (tests/test_import_resnet.py), but a trunk with
    a missing stem or a block-count mismatch still fails loudly rather than
    leaving fresh-init leaves behind."""
    from joint_vae_tpu.save_load.import_reference import map_reference_state
    # block keys present but no stem conv/bn
    sd = {'features.4.0.conv1.weight': np.zeros((8, 8, 3, 3), np.float32)}
    with pytest.raises(ImportError_, match='stem'):
        map_reference_state(sd, {'features_stack': {}}, None)
    # stem ok, but 1 torch block vs 0 native blocks
    sd.update({'features.0.weight': np.zeros((8, 3, 7, 7), np.float32),
               'features.1.weight': np.zeros(8, np.float32),
               'features.1.bias': np.zeros(8, np.float32),
               'features.1.running_mean': np.zeros(8, np.float32),
               'features.1.running_var': np.ones(8, np.float32)})
    with pytest.raises(ImportError_, match='torch blocks vs 0 native'):
        map_reference_state(sd, {'features_stack': {}}, None)


def test_import_cli_scan(ref, tmp_path, capsys):
    """--scan walks a reference jobs tree, keeps the relative layout."""
    net = _conv_net(ref)
    nested = tmp_path / 'refroot' / 'mnist' / 'archX' / 'opt' / '12'
    _save_reference_job(net, str(nested), with_recorder=False, ref_mod=ref)
    from joint_vae_tpu.cli.import_ref import main
    jobs = str(tmp_path / 'jobs')
    assert main(['--scan', str(tmp_path / 'refroot'), '--job-dir', jobs,
                 '--platform', 'cpu']) == 0
    out = capsys.readouterr().out
    assert '1 imported, 0 failed' in out
    dst = os.path.join(jobs, 'mnist', 'archX', 'opt', '12')
    job = load_job(dst, ghost=True)
    assert job.job_number == 12


def _find_adam_states(opt_state):
    import optax
    found = []

    def walk(s):
        if isinstance(s, optax.ScaleByAdamState):
            found.append(s)
        elif hasattr(s, 'inner_state'):
            walk(s.inner_state)
        elif isinstance(s, tuple):
            for c in s:
                walk(c)
    walk(opt_state)
    return found


def test_import_optimizer_state(ref, tmp_path):
    """optimizer.pth import: torch Adam moments land in optimizer.npz and
    a resumed step continues the reference's trajectory (ref cvae.py:
    2671-2673 save / 2843-2847 load)."""
    import optax
    from joint_vae_tpu.train.optimizers import build_optimizer

    torch.manual_seed(7)
    net = ref.Net(IN_SHAPE, C, type='cvae', features=None,
                  encoder=[16], latent_dim=K, decoder=[16],
                  classifier=[8], latent_sampling=1, test_latent_sampling=3,
                  beta=0.0, gamma=10., sigma={'value': 0.5},
                  output_activation='sigmoid',
                  prior={'distribution': 'gaussian', 'num_priors': C,
                         'init_mean': 1.0, 'learned_means': True},
                  optimizer={'optim_type': 'adam', 'lr': 1e-3})
    rng = np.random.default_rng(3)
    net.train()
    for _ in range(3):
        x = torch.tensor(rng.uniform(0, 1, (6,) + IN_SHAPE)
                         .astype(np.float32))
        y = torch.tensor(rng.integers(0, C, 6))
        _, _, losses, _ = net.evaluate(x, y, with_beta=True)
        net.optimizer.zero_grad()
        losses['total'].mean().backward()
        net.optimizer.step()
    net.eval()
    src = _save_reference_job(net, str(tmp_path / 'src' / '5'),
                              with_recorder=False, ref_mod=ref)
    dst = str(tmp_path / 'jobs' / '5')
    import_reference_job(src, dst)
    assert os.path.exists(os.path.join(dst, 'optimizer.npz'))
    job = load_job(dst)

    adam, = _find_adam_states(job.state.opt_state)
    assert int(adam.count) == 3

    # moments match the torch state under the hand-derived index mapping
    # (independent of the importer's own name walk)
    names = [n for n, _ in net.named_parameters()]
    tstate = net.optimizer.state_dict()['state']
    i_mean = names.index('encoder.dense_mean.weight')
    np.testing.assert_allclose(
        np.asarray(adam.mu['encoder']['dense_mean']['kernel']),
        tstate[i_mean]['exp_avg'].numpy().T, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(adam.nu['encoder']['dense_mean']['kernel']),
        tstate[i_mean]['exp_avg_sq'].numpy().T, rtol=1e-6, atol=1e-8)
    i_prior = names.index('encoder.prior.mean')
    np.testing.assert_allclose(np.asarray(adam.mu['prior']['mean']),
                               tstate[i_prior]['exp_avg'].numpy(),
                               rtol=1e-6, atol=1e-8)

    # one more identical step on both sides continues the same trajectory
    x = rng.uniform(0, 1, (6,) + IN_SHAPE).astype(np.float32)
    y = rng.integers(0, C, 6)
    net.train()
    _, _, losses, _ = net.evaluate(torch.tensor(x), torch.tensor(y),
                                   with_beta=True)
    net.optimizer.zero_grad()
    losses['total'].mean().backward()
    net.optimizer.step()

    state = job.state
    tx = build_optimizer(job.opt_cfg)

    def loss_fn(p):
        out = evaluate(job.model, {'params': p}, jnp.asarray(x),
                       jnp.asarray(y), rng=jax.random.PRNGKey(5),
                       sigma_state=state.sigma_state, train=True,
                       with_beta=True)
        return out.losses['total'].mean()

    g = jax.grad(loss_fn)(state.params)
    updates, _ = tx.update(g, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    np.testing.assert_allclose(
        np.asarray(new_params['encoder']['dense_mean']['kernel']),
        net.encoder.dense_mean.weight.detach().numpy().T,
        rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_params['prior']['mean']),
        net.encoder.prior.mean.detach().numpy(), rtol=1e-4, atol=1e-5)


def test_import_optimizer_state_conv(ref, tmp_path):
    """Conv+BN moment mapping: kernels transpose OIHW->HWIO like the
    weights; BatchNorm scale/bias moments route through the BN branch."""
    torch.manual_seed(9)
    net = _conv_net(ref, optimizer={'optim_type': 'adam', 'lr': 1e-3})
    rng = np.random.default_rng(5)
    net.train()
    for _ in range(2):
        x = torch.tensor(rng.uniform(0, 1, (6,) + IN_SHAPE)
                         .astype(np.float32))
        y = torch.tensor(rng.integers(0, C, 6))
        _, _, losses, _ = net.evaluate(x, y, with_beta=True)
        net.optimizer.zero_grad()
        losses['total'].mean().backward()
        net.optimizer.step()
    net.eval()
    src = _save_reference_job(net, str(tmp_path / 'src' / '6'),
                              with_recorder=False, ref_mod=ref)
    dst = str(tmp_path / 'jobs' / '6')
    import_reference_job(src, dst)
    job = load_job(dst)
    adam, = _find_adam_states(job.state.opt_state)
    assert int(adam.count) == 2

    names = [n for n, _ in net.named_parameters()]
    tstate = net.optimizer.state_dict()['state']
    i_conv = names.index('features.0.weight')        # first features conv
    np.testing.assert_allclose(
        np.asarray(adam.mu['features_stack']['conv_0']['kernel']),
        tstate[i_conv]['exp_avg'].numpy().transpose(2, 3, 1, 0),
        rtol=1e-6, atol=1e-8)
    i_bn = names.index('features.1.weight')          # its BatchNorm scale
    np.testing.assert_allclose(
        np.asarray(adam.mu['features_stack']['bn_0']['scale']),
        tstate[i_bn]['exp_avg'].numpy(), rtol=1e-6, atol=1e-8)
    # learned sigma is a bare parameter at the net root
    i_sig = names.index('sigma')
    np.testing.assert_allclose(
        np.asarray(adam.mu['sigma_param']),
        tstate[i_sig]['exp_avg'].numpy(), rtol=1e-6, atol=1e-8)


def test_import_optimizer_state_sgd_momentum(ref, tmp_path):
    """SGD momentum buffers transplant into the optax TraceState."""
    import optax
    torch.manual_seed(3)
    net = ref.Net(IN_SHAPE, C, type='cvae', features=None,
                  encoder=[16], latent_dim=K, decoder=[16],
                  classifier=[8], latent_sampling=1, test_latent_sampling=3,
                  beta=0.0, gamma=10., sigma={'value': 0.5},
                  output_activation='sigmoid',
                  prior={'distribution': 'gaussian', 'num_priors': C,
                         'init_mean': 1.0, 'learned_means': True},
                  optimizer={'optim_type': 'sgd', 'lr': 1e-2,
                             'momentum': 0.9})
    rng = np.random.default_rng(8)
    net.train()
    for _ in range(2):
        x = torch.tensor(rng.uniform(0, 1, (6,) + IN_SHAPE)
                         .astype(np.float32))
        y = torch.tensor(rng.integers(0, C, 6))
        _, _, losses, _ = net.evaluate(x, y, with_beta=True)
        net.optimizer.zero_grad()
        losses['total'].mean().backward()
        net.optimizer.step()
    net.eval()
    src = _save_reference_job(net, str(tmp_path / 'src' / '8'),
                              with_recorder=False, ref_mod=ref)
    dst = str(tmp_path / 'jobs' / '8')
    import_reference_job(src, dst)
    assert os.path.exists(os.path.join(dst, 'optimizer.npz'))
    job = load_job(dst)

    traces = []

    def walk(s):
        if isinstance(s, optax.TraceState):
            traces.append(s)
        elif hasattr(s, 'inner_state'):
            walk(s.inner_state)
        elif isinstance(s, tuple):
            for c in s:
                walk(c)
    walk(job.state.opt_state)
    trace, = traces

    names = [n for n, _ in net.named_parameters()]
    tstate = net.optimizer.state_dict()['state']
    i_mean = names.index('encoder.dense_mean.weight')
    np.testing.assert_allclose(
        np.asarray(trace.trace['encoder']['dense_mean']['kernel']),
        tstate[i_mean]['momentum_buffer'].numpy().T, rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize('type_,kw,y', [
    ('vae', dict(gamma=0.,
                 prior={'distribution': 'gaussian', 'num_priors': 1}), None),
    ('jvae', dict(gamma=1., y_is_coded=True,
                  prior={'distribution': 'gaussian', 'num_priors': 1}),
     [0, 1, 2, 3, 1]),
    ('xvae', dict(gamma=0., y_is_coded=True,
                  prior={'distribution': 'gaussian', 'num_priors': C,
                         'init_mean': 1.0, 'learned_means': True}),
     [0, 1, 2, 3, 1]),
    ('vib', dict(gamma=1000.,
                 prior={'distribution': 'gaussian', 'num_priors': 1}), None),
])
def test_import_all_types(ref, tmp_path, type_, kw, y):
    """The importer round-trips every model type's saved ctor kwargs
    (params.json written by the reference's save(), ref cvae.py:2650-2675)
    through CVNetConfig.from_dict — cvae is covered by the fixtures above.
    jvae/xvae compare labeled (the reference's label-free coded path
    crashes on featureless models, see test_evaluate_vs_reference)."""
    torch.manual_seed(13)
    net = ref.Net(IN_SHAPE, C, type=type_, features=None, encoder=[16],
                  latent_dim=K, decoder=[16], classifier=[8],
                  latent_sampling=1, test_latent_sampling=3, beta=0.0,
                  sigma={'value': 0.5}, output_activation='sigmoid', **kw)
    src = _save_reference_job(net, str(tmp_path / 'src' / '2'),
                              with_recorder=False)
    dst = str(tmp_path / 'jobs' / '2')
    import_reference_job(src, dst)
    job = load_job(dst)
    assert job.model_cfg.type == type_
    _compare_losses(net, job, y=np.asarray(y, np.int64)
                    if y is not None else None)


@pytest.fixture(scope='module')
def ref_wim(ref):
    sys.path.insert(0, '/root/reference')
    try:
        from ft.wim import WIMJob as RefWIM
    finally:
        sys.path.remove('/root/reference')
    return RefWIM


def test_import_wim_job(ref, ref_wim, tmp_path):
    """A reference WIM job (wim.json + _alternate_prior.* in state.pth,
    ref ft/wim.py:18, ft/job.py:154-159) imports as a native WIM job:
    load_wim_job reloads the exact alternate-prior arrays (wim_prior.npz),
    and the '@'-twin losses reproduce the reference's."""
    torch.manual_seed(19)
    net = ref_wim(IN_SHAPE, C, type='cvae', features=None,
                  encoder=[16], latent_dim=K, decoder=[16],
                  classifier=[8], latent_sampling=1, test_latent_sampling=3,
                  beta=0.0, gamma=100., sigma={'value': 0.5},
                  output_activation='sigmoid',
                  prior={'distribution': 'gaussian', 'num_priors': C,
                         'init_mean': 1.0, 'learned_means': True})
    net.eval()
    net.set_alternate_prior(dim=K, distribution='gaussian', num_priors=1,
                            init_mean=3.0, seed=123)
    src = str(tmp_path / 'src' / '11')
    net.trained = 2
    net.train_history['epochs'] = 2
    net.save(src, except_state=False)
    assert os.path.exists(os.path.join(src, 'wim.json'))

    dst = str(tmp_path / 'jobs' / '11')
    import_reference_job(src, dst)
    assert os.path.exists(os.path.join(dst, 'wim_prior.npz'))

    from joint_vae_tpu.ft.job import load_wim_job
    wim = load_wim_job(dst)
    assert wim.alternate_prior_cfg is not None
    assert wim.alternate_prior_cfg.distribution == 'gaussian'
    alt = net._alternate_prior
    np.testing.assert_array_equal(
        np.asarray(wim.alternate_prior_params['mean']),
        alt.mean.detach().numpy())
    np.testing.assert_array_equal(
        np.asarray(wim.alternate_prior_params['var_param']),
        alt._var_parameter.detach().numpy())

    # '@'-twin parity on the imported weights + imported alternate prior
    import jax.numpy as jnp
    x = np.random.default_rng(4).uniform(
        0, 1, (5,) + IN_SHAPE).astype(np.float32)
    with torch.no_grad():
        with net.no_estimated_labels(), net.evaluate_on_both_priors():
            _, _, ref_losses, _ = net.evaluate(torch.tensor(x))
    st = wim.job.state
    _, _, ours, _ = wim.evaluate_on_both_priors(
        st.variables, jnp.asarray(x), rng=jax.random.PRNGKey(1),
        sigma_state=st.sigma_state)
    for k in ('kl@', 'zdist@'):
        np.testing.assert_allclose(np.asarray(ours[k]),
                                   ref_losses[k].numpy(),
                                   rtol=5e-4, atol=5e-4, err_msg=k)


def test_native_wim_prior_persistence(tmp_path):
    """save_wim_prior/load_wim_job round-trip the frozen alternate prior so
    a reloaded native WIM job scores '@' methods with the prior it was
    tuned against."""
    import jax.numpy as jnp
    from joint_vae_tpu.models.cvnet import CVNetConfig
    from joint_vae_tpu.ops.priors import build_prior_config
    from joint_vae_tpu.ops.sigma import SigmaConfig
    from joint_vae_tpu.save_load.jobs import new_job, save_job
    from joint_vae_tpu.train.optimizers import OptimizerConfig
    from joint_vae_tpu.ft.wim import WIMJob
    from joint_vae_tpu.ft.job import load_wim_job, save_wim_prior

    cfg = CVNetConfig(
        input_shape=IN_SHAPE, num_labels=C, type='cvae',
        encoder=(16,), latent_dim=K, decoder=(16,), classifier=(8,),
        latent_sampling=1, test_latent_sampling=3, beta=0.0, gamma=100.,
        sigma=SigmaConfig(value=0.5), output_activation='sigmoid',
        prior=build_prior_config(K, 'gaussian', num_priors=C,
                                 init_mean=1.0, learned_means=True))
    job = new_job(cfg, OptimizerConfig(), key=jax.random.PRNGKey(2))
    wim = WIMJob(job=job)
    wim.set_alternate_prior(key=jax.random.PRNGKey(77),
                            distribution='gaussian', num_priors=1,
                            init_mean=3.0, seed=77)
    job.training_parameters['wim'] = dict(wim.ft_params)
    job.ood_results = {2: {'fashion': {'kl': {'auc': 0.9}}}}
    d = str(tmp_path / 'wimjob')
    save_job(job, d)
    save_wim_prior(wim, d)

    wim2 = load_wim_job(d)
    # already-WIM reload keeps results (ref FTJob.load 'already a ft' path)
    assert wim2.job.ood_results
    for k in ('mean', 'var_param'):
        np.testing.assert_array_equal(
            np.asarray(wim2.alternate_prior_params[k]),
            np.asarray(wim.alternate_prior_params[k]), err_msg=k)

    # without the npz the seeded re-derivation reproduces the same arrays
    os.remove(os.path.join(d, 'wim_prior.npz'))
    wim3 = load_wim_job(d)
    np.testing.assert_allclose(
        np.asarray(wim3.alternate_prior_params['mean']),
        np.asarray(wim.alternate_prior_params['mean']), rtol=1e-6)


def test_import_poscod_job(ref, tmp_path):
    """A reference poscod job (poscod.json + ood_head.1.* in state.pth,
    ref ft/poscod.py:23,38-42) imports with its trained llr head, and
    load_poscod_job re-scores with the imported weights."""
    sys.path.insert(0, '/root/reference')
    try:
        from ft.poscod import PoscodJob as RefPoscod
    finally:
        sys.path.remove('/root/reference')
    torch.manual_seed(23)
    net = RefPoscod(IN_SHAPE, C, type='cvae', features=None,
                    encoder=[16], latent_dim=K, decoder=[16],
                    classifier=[8], latent_sampling=1,
                    test_latent_sampling=3, beta=0.0, gamma=100.,
                    sigma={'value': 0.5}, output_activation='sigmoid',
                    prior={'distribution': 'gaussian', 'num_priors': C,
                           'init_mean': 1.0, 'learned_means': True})
    net.eval()
    with torch.no_grad():
        net.ood_head[1].weight.copy_(torch.randn(1, K))
        net.ood_head[1].bias.copy_(torch.tensor([0.25]))
    net.ft_params = {'epochs': 5}
    net.trained = 2
    net.train_history['epochs'] = 2
    # the reference's own FTJob.save is bit-rotted for poscod (it enters
    # the WIM-only original_prior context) — save via the base CVNet.save,
    # which is what writes state.pth anyway, + the poscod.json sidecar
    ref.Net.save(net, str(tmp_path / 'src' / '13'))
    import utils.save_load as ref_sl
    ref_sl.save_json(net.ft_params, str(tmp_path / 'src' / '13'),
                     'poscod.json')

    dst = str(tmp_path / 'jobs' / '13')
    import_reference_job(str(tmp_path / 'src' / '13'), dst)
    assert os.path.exists(os.path.join(dst, 'poscod_head.npz'))

    from joint_vae_tpu.ft.poscod import load_poscod_job
    pc = load_poscod_job(dst)
    assert pc.head is not None
    np.testing.assert_array_equal(
        np.asarray(pc.head['w']),
        net.ood_head[1].weight.detach().numpy().reshape(-1))
    np.testing.assert_array_equal(np.asarray(pc.head['b']),
                                  np.float32(0.25))
    assert pc.job.training_parameters['poscod'] == {'epochs': 5}

    # llr re-scoring runs on the imported head (head math: mu @ w + b)
    from joint_vae_tpu.data.loaders import ArrayDataset
    x = np.random.default_rng(9).uniform(
        0, 1, (8,) + IN_SHAPE).astype(np.float32)
    ds = ArrayDataset(x, np.zeros(8, np.int64), name='probe')
    scores = pc.llr_scores(ds, batch_size=4)
    assert scores.shape == (8,) and np.all(np.isfinite(scores))

"""Native-job exporter oracle: build native jobs, export them, and load the
results with the REFERENCE'S OWN CVNet.load (ref cvae.py:2677-2857) —
asserting evaluate-loss parity, recorder readability, optimizer-moment
transplant, and a bitwise export->import round trip.
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

from joint_vae_tpu.models.cvnet import CVNetConfig
from joint_vae_tpu.models.evaluate import evaluate
from joint_vae_tpu.ops.priors import build_prior_config
from joint_vae_tpu.ops.sigma import SigmaConfig
from joint_vae_tpu.save_load.checkpoint import flatten_pytree
from joint_vae_tpu.save_load.export_reference import (
    export_to_reference_job, ExportError_)
from joint_vae_tpu.save_load.import_reference import import_reference_job
from joint_vae_tpu.save_load.jobs import new_job, save_job, load_job
from joint_vae_tpu.save_load.recorders import LossRecorder
from joint_vae_tpu.train.optimizers import OptimizerConfig

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


def _conv_cfg(**kw):
    args = dict(input_shape=IN_SHAPE, num_labels=C, type='cvae',
                features='8x3+1:2-16x3+1', upsampler='4x8+0-!1x3+1',
                batch_norm='both', encoder=(16, 16), latent_dim=K,
                decoder=(16,), classifier=(8,), latent_sampling=1,
                test_latent_sampling=3, beta=0.0, gamma=10.,
                output_activation='sigmoid',
                sigma=SigmaConfig(learned=True, value=0.5),
                prior=build_prior_config(K, 'tilted', num_priors=C, tau=5.,
                                         init_mean=1.0, learned_means=True))
    args.update(kw)
    return CVNetConfig(**args)


def _randomized_job(cfg, seed=0, job_number=9, opt_cfg=None):
    """A native job whose batch stats / sigma are perturbed away from init
    so the export is actually exercised."""
    job = new_job(cfg, opt_cfg or OptimizerConfig(),
                  key=jax.random.PRNGKey(seed), job_number=job_number)
    st = job.state
    if st.batch_stats is not None:
        rng = np.random.default_rng(11)
        bs = jax.tree_util.tree_map(
            lambda v: jnp.asarray(
                np.abs(rng.normal(0.5, 0.2, np.shape(v))).astype(np.float32)),
            st.batch_stats)
        st = st.replace(batch_stats=bs)
    job.state = st
    return job


def _mark_trained(job, epochs=2):
    job.train_history = {'epochs': epochs}
    job.testing = {epochs: {'iws': {'n': 64, 'epochs': epochs,
                                    'sampling': 3, 'accuracy': 0.75}}}
    job.ood_results = {epochs: {'fashion': {'iws': {
        'n': 64, 'auc': 0.9, 'tpr': [0.95], 'fpr': [0.2],
        'thresholds': [0.0], 'epochs': epochs}}}}


def _save_native_job(job, dir_name, with_recorder=True, epochs=2):
    _mark_trained(job, epochs)
    save_job(job, dir_name)
    if with_recorder:
        rec = LossRecorder(10)
        rng = np.random.default_rng(3)
        for n in (10, 10, 7):
            rec.append_batch(kl=rng.normal(size=(C, n)).astype(np.float32),
                             y_true=rng.integers(0, C, n))
        rec_dir = os.path.join(dir_name, 'samples', '{:04d}'.format(epochs))
        os.makedirs(rec_dir, exist_ok=True)
        rec.save(os.path.join(rec_dir, 'record-mnist.jvr'))
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


@pytest.fixture(scope='module')
def exported_conv(ref, tmp_path_factory):
    """The flagship export case: conv+bn features/imager, learned sigma,
    conditional tilted prior — saved natively, exported, reloaded by the
    reference's own load()."""
    root = tmp_path_factory.mktemp('natjobs')
    job = _randomized_job(_conv_cfg())
    src = _save_native_job(job, str(root / 'src' / '9'))
    dst = str(root / 'ref-jobs' / '9')
    export_to_reference_job(src, dst)
    net = ref.Net.load(dst, load_state=True)
    net.eval()
    return types.SimpleNamespace(job=job, net=net, src=src, dst=dst,
                                 root=str(root))


def test_export_evaluate_parity_conv(exported_conv):
    """The reference, loading our exported weights with its own load(),
    reproduces our evaluate losses."""
    compared = _compare_losses(exported_conv.net, exported_conv.job)
    assert 'cross_x' in compared and 'cross_y' in compared


def test_export_metadata(exported_conv):
    net = exported_conv.net
    assert net.job_number == 9
    assert net.trained == 2
    assert net.testing[2]['iws']['accuracy'] == 0.75
    assert net.ood_results[2]['fashion']['iws']['auc'] == 0.9


def test_export_import_roundtrip_bitwise(exported_conv, tmp_path):
    """import(export(job)) returns the original params exactly (the
    per-kind transposes are value-preserving)."""
    back = str(tmp_path / 'back' / '9')
    import_reference_job(exported_conv.dst, back)
    job2 = load_job(back)
    a = flatten_pytree(exported_conv.job.state.params)
    b = flatten_pytree(job2.state.params)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg=k)
    for k, v in flatten_pytree(exported_conv.job.state.batch_stats).items():
        np.testing.assert_array_equal(
            np.asarray(v),
            np.asarray(flatten_pytree(job2.state.batch_stats)[k]),
            err_msg=k)
    np.testing.assert_array_equal(
        np.asarray(exported_conv.job.state.sigma_state.data),
        np.asarray(job2.state.sigma_state.data))


def test_export_recorders(exported_conv, ref):
    """Exported record-*.pth files load with the reference's LossRecorder
    (recorders.py:140-175), in both the numbered and the 'last' dir."""
    ours = LossRecorder.load(os.path.join(
        exported_conv.src, 'samples', '0002', 'record-mnist.jvr'))
    for sub in ('2', 'last'):
        theirs = ref.Recorder.load(os.path.join(
            exported_conv.dst, 'samples', sub, 'record-mnist.pth'))
        assert len(theirs) == 3
        np.testing.assert_array_equal(theirs['kl'].numpy(), ours.get('kl'))
        np.testing.assert_array_equal(theirs['y_true'].numpy(),
                                      ours.get('y_true'))


def _fill_adam(state, seed=21):
    """Give the fresh optax adam state nonzero moments + count."""
    import optax
    rng = np.random.default_rng(seed)

    def walk(s):
        if isinstance(s, optax.ScaleByAdamState):
            fill = lambda t: jax.tree_util.tree_map(
                lambda v: jnp.asarray(
                    rng.normal(0, 0.01, np.shape(v)).astype(np.float32)), t)
            return s._replace(count=jnp.asarray(3, jnp.int32),
                              mu=fill(s.mu), nu=fill(s.nu))
        if hasattr(s, 'inner_state'):
            return s._replace(inner_state=walk(s.inner_state))
        if isinstance(s, tuple):
            children = tuple(walk(c) for c in s)
            return type(s)(*children) if hasattr(s, '_fields') else children
        return s
    return state.replace(opt_state=walk(state.opt_state))


def test_export_optimizer_moments_roundtrip(ref, tmp_path):
    """Adam moments survive export: the reference's optimizer loads them
    (ref cvae.py:2843-2847) and an import brings them back bitwise."""
    job = _randomized_job(_conv_cfg(), seed=2, job_number=5,
                          opt_cfg=OptimizerConfig(optim_type='adam', lr=1e-3))
    job.state = _fill_adam(job.state)
    src = _save_native_job(job, str(tmp_path / 'src' / '5'),
                           with_recorder=False)
    dst = str(tmp_path / 'ref-jobs' / '5')
    export_to_reference_job(src, dst)
    assert os.path.exists(os.path.join(dst, 'optimizer.pth'))

    net = ref.Net.load(dst, load_state=True)    # loads optimizer too
    tstate = net.optimizer.state_dict()['state']
    names = [n for n, _ in net.named_parameters()]
    flat_mu = None
    import optax

    def find(s):
        nonlocal flat_mu
        if isinstance(s, optax.ScaleByAdamState):
            flat_mu = flatten_pytree(s.mu)
        elif hasattr(s, 'inner_state'):
            find(s.inner_state)
        elif isinstance(s, tuple):
            for c in s:
                find(c)
    find(job.state.opt_state)

    i_mean = names.index('encoder.dense_mean.weight')
    np.testing.assert_allclose(
        tstate[i_mean]['exp_avg'].numpy().T,
        np.asarray(flat_mu['encoder/dense_mean/kernel']),
        rtol=1e-6, atol=1e-8)
    i_conv = names.index('features.0.weight')
    np.testing.assert_allclose(
        tstate[i_conv]['exp_avg'].numpy().transpose(2, 3, 1, 0),
        np.asarray(flat_mu['features_stack/conv_0/kernel']),
        rtol=1e-6, atol=1e-8)
    # learned sigma's moment rides the params/sigma_param correspondence
    i_sig = names.index('sigma')
    np.testing.assert_allclose(tstate[i_sig]['exp_avg'].numpy(),
                               np.asarray(flat_mu['sigma_param']),
                               rtol=1e-6, atol=1e-8)
    assert int(np.asarray(tstate[i_mean]['step']).item()) == 3

    back = str(tmp_path / 'back' / '5')
    import_reference_job(dst, back)
    job2 = load_job(back)
    flat_mu2 = None

    def find2(s):
        nonlocal flat_mu2
        if isinstance(s, optax.ScaleByAdamState):
            flat_mu2 = flatten_pytree(s.mu)
        elif hasattr(s, 'inner_state'):
            find2(s.inner_state)
        elif isinstance(s, tuple):
            for c in s:
                find2(c)
    find2(job2.state.opt_state)
    for k in flat_mu:
        np.testing.assert_array_equal(np.asarray(flat_mu[k]),
                                      np.asarray(flat_mu2[k]), err_msg=k)


@pytest.mark.parametrize('type_,kw,y', [
    ('vae', dict(gamma=0., classifier=(),
                 prior=build_prior_config(K, 'gaussian')), None),
    ('jvae', dict(gamma=1., y_is_coded=True,
                  prior=build_prior_config(K, 'gaussian')), [0, 1, 2, 3, 1]),
    ('xvae', dict(gamma=0., y_is_coded=True, classifier=(),
                  prior=build_prior_config(K, 'gaussian', num_priors=C,
                                           init_mean=1.0,
                                           learned_means=True)),
     [0, 1, 2, 3, 1]),
    ('vib', dict(gamma=1000., decoder=(), upsampler=None,
                 prior=build_prior_config(K, 'gaussian')), None),
])
def test_export_all_types(ref, tmp_path, type_, kw, y):
    """Every model type's exported ctor kwargs rebuild on the reference
    side (featureless MLPs; cvae is the conv fixture above) and reproduce
    our losses."""
    args = dict(input_shape=IN_SHAPE, num_labels=C, type=type_,
                features=None, upsampler=None, encoder=(16,), latent_dim=K,
                decoder=(16,), classifier=(8,), latent_sampling=1,
                test_latent_sampling=3, beta=0.0,
                sigma=SigmaConfig(value=0.5), output_activation='sigmoid')
    args.update(kw)
    job = _randomized_job(CVNetConfig(**args), seed=3, job_number=2)
    src = _save_native_job(job, str(tmp_path / 'src' / '2'),
                           with_recorder=False)
    dst = str(tmp_path / 'ref-jobs' / '2')
    export_to_reference_job(src, dst)
    net = ref.Net.load(dst, load_state=True)
    net.eval()
    assert net.type == type_
    _compare_losses(net, job, y=np.asarray(y, np.int64)
                    if y is not None else None)


def test_export_sample_recorders_and_init_nesting(ref, tmp_path):
    """sample-<set>.npz SampleRecorders export to the reference's
    samples-<set>.pth (tensors + aux split, ref recorders.py:372-399), WIM
    init/ snapshot dirs survive one nesting level (ref ft/job.py:302-313),
    and the import direction round-trips both."""
    from joint_vae_tpu.save_load.recorders import SampleRecorder

    job = _randomized_job(_conv_cfg(), seed=6, job_number=3)
    src = _save_native_job(job, str(tmp_path / 'src' / '3'),
                           with_recorder=False)
    edir = os.path.join(src, 'samples', '0002')
    srec = SampleRecorder()
    rng = np.random.default_rng(5)
    srec.append_batch(mu=rng.normal(size=(20, K)).astype(np.float32),
                      y=rng.integers(0, C, 20))
    srec.append_batch(centroids=rng.normal(size=(C, K)).astype(np.float32))
    srec.save(os.path.join(edir, 'sample-mnist.npz'))
    init_rec = LossRecorder(10)
    init_rec.append_batch(kl=rng.normal(size=(C, 10)).astype(np.float32))
    init_rec.save(os.path.join(edir, 'init', 'record-mnist.jvr'))

    dst = str(tmp_path / 'ref-jobs' / '3')
    export_to_reference_job(src, dst)

    theirs = ref.Recorder.load(
        os.path.join(dst, 'samples', '2', 'samples-mnist.pth'))
    np.testing.assert_array_equal(theirs._tensors['mu'].numpy(),
                                  srec.get('mu'))
    np.testing.assert_array_equal(theirs._tensors['y'].numpy(),
                                  srec.get('y'))
    np.testing.assert_array_equal(theirs._aux['centroids'].numpy(),
                                  srec.get('centroids'))
    init_back = ref.Recorder.load(
        os.path.join(dst, 'samples', '2', 'init', 'record-mnist.pth'))
    np.testing.assert_array_equal(init_back['kl'].numpy(),
                                  init_rec.get('kl'))

    back = str(tmp_path / 'back' / '3')
    import_reference_job(dst, back)
    r2 = SampleRecorder.load(
        os.path.join(back, 'samples', '0002', 'sample-mnist.npz'))
    for k in ('mu', 'y', 'centroids'):
        np.testing.assert_array_equal(r2.get(k), srec.get(k), err_msg=k)
    from joint_vae_tpu.save_load.recorders import find_record
    p = find_record(os.path.join(back, 'samples', '0002', 'init'), 'mnist')
    assert p is not None
    np.testing.assert_array_equal(LossRecorder.load(p).get('kl'),
                                  init_rec.get('kl'))


def test_export_sample_recorder_tie_break(ref, tmp_path):
    """The tensors/aux split is deterministic on a count tie: the larger
    leading dim wins (samples outnumber aux rows)."""
    from joint_vae_tpu.save_load.recorders import SampleRecorder
    from joint_vae_tpu.save_load.export_reference import (
        export_sample_recorder, reference_modules)
    rec = SampleRecorder()
    rng = np.random.default_rng(2)
    rec.append_batch(mu=rng.normal(size=(8, 3)).astype(np.float32),
                     y=rng.integers(0, 4, 8))
    rec.append_batch(centroids=rng.normal(size=(4, 3)).astype(np.float32),
                     alternate=rng.normal(size=(4, 3)).astype(np.float32))
    p = str(tmp_path / 'sample-x.npz')
    rec.save(p)
    dst = str(tmp_path / 'samples-x.pth')
    _, ref_recorders = reference_modules()
    assert export_sample_recorder(p, dst, ref_recorders)
    r = ref.Recorder.load(dst)
    assert set(r._tensors) == {'mu', 'y'}
    assert set(r._aux) == {'centroids', 'alternate'}


def test_export_wim_job(ref, tmp_path):
    """A native WIM job exports a reference-compatible wim.json (prior keys
    only — its load_post_hook feeds them to build_prior, ref ft/wim.py:
    208-213) and the reference's own WIMJob.load consumes the result."""
    import json
    sys.path.insert(0, '/root/reference')
    try:
        from ft.wim import WIMJob as RefWIM
    finally:
        sys.path.remove('/root/reference')

    job = _randomized_job(_conv_cfg(), seed=7, job_number=4)
    job.training_parameters['wim'] = {
        'dim': K, 'distribution': 'gaussian', 'num_priors': 1,
        'init_mean': 3.0, 'seed': 5,
        'sets': ['fashion'], 'mix': 0.5, 'padding_dataset': None}
    src = _save_native_job(job, str(tmp_path / 'src' / '4'),
                           with_recorder=False)
    dst = str(tmp_path / 'ref-jobs' / '4')
    export_to_reference_job(src, dst)

    wj = json.load(open(os.path.join(dst, 'wim.json')))
    # prior keys + the moving-set metadata the reference's load_post_hook
    # pops (ft/wim.py:208-213); padding_dataset is native-only and dropped
    assert wj == {'dim': K, 'distribution': 'gaussian', 'num_priors': 1,
                  'init_mean': 3.0, 'seed': 5, 'sets': ['fashion'],
                  'mix': 0.5}
    assert RefWIM.is_wim(dst)
    net = RefWIM.load(dst, load_state=True)
    assert net._alternate_prior is not None
    assert net._alternate_prior.num_priors == 1
    # _original_prior.* rode along, so the load took the intact (non-
    # MissingKeys) path and KEPT the job's ood results (ft/job.py:126-138)
    assert net.ood_results, 'ood_results wiped: MissingKeys fallback hit'
    # the state itself still round-trips under the WIM loader
    with net.no_estimated_labels():
        _compare_losses(net, job)


def test_export_rejects_densenet_features(tmp_path):
    """resnet trunks export (tests/test_import_resnet.py); densenet trunks
    keep the clear rejection (from-scratch layout, docs/PARITY.md)."""
    cfg = CVNetConfig(input_shape=(3, 32, 32), num_labels=C, type='cvae',
                      features='densenet-tiny', encoder=(16,), latent_dim=K,
                      decoder=(16,), classifier=(8,), latent_sampling=1,
                      beta=0.0, gamma=1.)
    job = new_job(cfg, OptimizerConfig(), key=None, job_number=1)
    save_job(job, str(tmp_path / 'src' / '1'), save_state=False)
    with pytest.raises(ExportError_, match='densenet'):
        export_to_reference_job(str(tmp_path / 'src' / '1'),
                                str(tmp_path / 'out' / '1'))


def test_export_cli_scan(ref, tmp_path, capsys):
    """--scan walks a native jobs tree, keeps the relative layout."""
    job = _randomized_job(_conv_cfg(), seed=4, job_number=12)
    nested = tmp_path / 'natroot' / 'mnist' / 'archX' / 'opt' / '12'
    _save_native_job(job, str(nested), with_recorder=False)
    from joint_vae_tpu.cli.export_ref import main
    out_root = str(tmp_path / 'ref-jobs')
    assert main(['--scan', str(tmp_path / 'natroot'), '--out', out_root,
                 '--platform', 'cpu']) == 0
    out = capsys.readouterr().out
    assert '1 exported, 0 failed' in out
    dst = os.path.join(out_root, 'mnist', 'archX', 'opt', '12')
    net = ref.Net.load(dst, load_state=True)
    assert net.job_number == 12


def test_export_poscod_job(ref, tmp_path):
    """A native poscod job exports poscod.json + the llr head inside
    state.pth (ood_head.1.*, ref ft/poscod.py:23,38-42) and loads under the
    reference's own PoscodJob.load with the trained head intact."""
    sys.path.insert(0, '/root/reference')
    try:
        from ft.poscod import PoscodJob as RefPoscod
    finally:
        sys.path.remove('/root/reference')
    import jax.numpy as jnp

    job = _randomized_job(_conv_cfg(), seed=9, job_number=6)
    job.training_parameters['poscod'] = {'epochs': 5}
    src = _save_native_job(job, str(tmp_path / 'src' / '6'),
                           with_recorder=False)
    rng = np.random.default_rng(3)
    w = rng.normal(size=(K,)).astype(np.float32)
    np.savez(os.path.join(src, 'poscod_head.npz'), w=w,
             b=np.float32(0.125))

    dst = str(tmp_path / 'ref-jobs' / '6')
    export_to_reference_job(src, dst)
    assert RefPoscod.is_poscod(dst)
    # the reference's own PoscodJob.load is bit-rotted (load_post_hook
    # calls the WIM-only set_alternate_prior) — validate the exported
    # state the way its ctor + load_state_dict consume it
    import json as _json
    params = _json.load(open(os.path.join(dst, 'params.json')))
    for k in ('version', 'job_number'):
        params.pop(k, None)
    tp = _json.load(open(os.path.join(dst, 'train_params.json')))
    net = RefPoscod(**params, sigma=tp['sigma'], beta=tp['beta'],
                    gamma=tp['gamma'], latent_sampling=tp['latent_sampling'])
    sd = torch.load(os.path.join(dst, 'state.pth'), weights_only=False)
    net.load_state_dict(sd, strict=True)
    np.testing.assert_allclose(
        net.ood_head[1].weight.detach().numpy().reshape(-1), w, rtol=1e-6)
    np.testing.assert_allclose(net.ood_head[1].bias.detach().numpy(),
                               [0.125], rtol=1e-6)

    # ...and the import direction brings the head back bitwise
    back = str(tmp_path / 'back' / '6')
    import_reference_job(dst, back)
    from joint_vae_tpu.ft.poscod import load_poscod_job
    pc = load_poscod_job(back)
    np.testing.assert_array_equal(np.asarray(pc.head['w']), w)
    np.testing.assert_array_equal(np.asarray(pc.head['b']),
                                  np.float32(0.125))

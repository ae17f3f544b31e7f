"""Torchvision-trunk reference jobs import (VERDICT r3 item 3).

A reference CVNet built with ``--features resnet18`` / ``resnet50`` /
``densenet121`` (torchvision trunk, ref module/vae_layers/conv.py:247-272;
BasicBlock, Bottleneck and DenseNet paths — the reference default resnet152
differs from 50 only in block counts) — using the faithful plain-torch
trunks of save_load/tv_resnet.py under the torchvision stub — is saved with
the REFERENCE'S OWN save() and imported.  Asserts:

- the trunk's feature outputs match bitwise-tight (5e-5) between torch and
  the flax ResNetFeatures after transplant (incl. BN running stats),
- full-model evaluate losses agree to 5e-4 (the standard importer oracle),
- 'features' freezing via the existing grad masks zeroes every trunk leaf
  (pretrained-freeze semantics, ref cvae.py:241-317).
"""

import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import torch

import jax
import jax.numpy as jnp

from joint_vae_tpu.models.evaluate import evaluate
from joint_vae_tpu.save_load.import_reference import import_reference_job
from joint_vae_tpu.save_load.jobs import load_job

C, K = 4, 6
SKIP_KEYS = {'iws', 'total', 'dzdist'}

# densenet trunks reduce spatially by 32x (stem /4 + 3 transition pools,
# ref conv.py:266-270), so they need a 32px input to keep a 1x1 map
IN_SHAPES = {'resnet18': (3, 16, 16), 'resnet50': (3, 16, 16),
             'densenet121': (3, 32, 32)}


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
    from joint_vae_tpu.save_load import tv_resnet
    tv_resnet.install()
    sys.path.insert(0, '/root/reference')
    try:
        import cvae as ref_cvae
    finally:
        sys.path.remove('/root/reference')
    # the reference's own densenet routing is bit-rotted (conv.py:138
    # routes only resnet*) — fix it in-process so a densenet-trunk job
    # can be produced/reloaded by the reference's own save()/load()
    tv_resnet.route_densenet(ref_cvae)
    return types.SimpleNamespace(Net=ref_cvae.ClassificationVariationalNetwork)


def _resnet_net(ref, arch='resnet18'):
    net = ref.Net(IN_SHAPES[arch], C, type='cvae', features=arch,
                  encoder=[16], latent_dim=K, decoder=[16], classifier=[8],
                  latent_sampling=1, test_latent_sampling=2,
                  beta=0.0, gamma=10., output_activation='sigmoid',
                  sigma=0.5,
                  prior={'distribution': 'gaussian', 'num_priors': C,
                         'init_mean': 1.0, 'learned_means': True})
    net.eval()
    # randomize BN running stats so the transplant is actually exercised
    # (fresh stats are all-zero mean / unit var on both sides)
    g = torch.Generator().manual_seed(11)
    for m in net.modules():
        if type(m).__name__ == 'BatchNorm2d':
            m.running_mean.copy_(torch.randn(m.running_mean.shape,
                                             generator=g) * 0.1)
            m.running_var.copy_(1 + 0.3 * torch.rand(m.running_var.shape,
                                                     generator=g))
    return net


# resnet18 = BasicBlock path; resnet50 = Bottleneck path (the reference's
# default trunk resnet152 differs from 50 only in block counts);
# densenet121 = the DenseNet trunk path (161/169/201 differ only in
# growth/block counts)
@pytest.fixture(scope='module',
                params=['resnet18', 'resnet50', 'densenet121'])
def imported(ref, tmp_path_factory, request):
    arch = request.param
    root = tmp_path_factory.mktemp('resnetjobs-' + arch)
    net = _resnet_net(ref, arch)
    net.trained = 1
    net.train_history['epochs'] = 1
    net.save(str(root / 'src' / '9'))
    dst = str(root / 'jobs' / '9')
    import_reference_job(str(root / 'src' / '9'), dst,
                         import_recorders=False)
    return types.SimpleNamespace(net=net, dst=dst, arch=arch)


def test_trunk_features_match(imported):
    from joint_vae_tpu.models.resnet import ResNetFeatures, DenseNetFeatures
    job = load_job(imported.dst)
    in_shape = IN_SHAPES[imported.arch]
    x = np.random.default_rng(0).uniform(
        0, 1, (4,) + in_shape).astype(np.float32)
    with torch.no_grad():
        want = imported.net.features(torch.tensor(x)).numpy()
    if imported.arch.startswith('densenet'):
        trunk = DenseNetFeatures(arch=imported.arch, input_hw=in_shape[1:])
    else:
        trunk = ResNetFeatures(arch=imported.arch)
    got = trunk.apply(
        {'params': job.state.params['features_stack'],
         'batch_stats': job.state.batch_stats['features_stack']},
        jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got).reshape(want.shape), want,
                               rtol=5e-5, atol=5e-5)


def test_evaluate_losses_match(imported):
    job = load_job(imported.dst)
    assert job.model_cfg.features == imported.arch
    x = np.random.default_rng(42).uniform(
        0, 1, (4,) + IN_SHAPES[imported.arch]).astype(np.float32)
    y = np.array([0, 1, 2, 3], np.int64)
    with torch.no_grad():
        _, _, losses, _ = imported.net.evaluate(torch.tensor(x),
                                                y=torch.tensor(y))
    out = evaluate(job.model, job.state.variables, jnp.asarray(x),
                   jnp.asarray(y), rng=jax.random.PRNGKey(1),
                   sigma_state=job.state.sigma_state, train=False)
    compared = []
    for k, v in losses.items():
        if k in SKIP_KEYS or k not in out.losses:
            continue
        got, want = np.asarray(out.losses[k]), v.numpy()
        if got.shape != want.shape:
            continue
        np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4,
                                   err_msg='loss {}'.format(k))
        compared.append(k)
    assert {'kl', 'zdist', 'cross_y'} <= set(compared), compared


def test_frozen_features_grad_mask(imported):
    """--freeze features on an imported pretrained trunk: every
    features_stack leaf is masked (ref pretrained freeze cvae.py:241-317)."""
    from joint_vae_tpu.train.state import grad_mask
    job = load_job(imported.dst)
    mask = grad_mask(job.model, job.state.params,
                     frozen_modules=('features',))
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    trunk = [(p, m) for p, m in flat
             if any('features_stack' in str(x) for x in p)]
    assert trunk and all(float(m) == 0.0 for _, m in trunk)
    other = [(p, m) for p, m in flat
             if not any('features_stack' in str(x) for x in p)]
    assert any(float(m) == 1.0 for _, m in other)


def test_export_roundtrip_resnet(imported, ref, tmp_path):
    """export(import(resnet job)): the reference's own load() gets back the
    trunk weights bitwise (the tagged-template correspondence covers the
    resnet mapping; num_batches_tracked counters are template-fresh)."""
    from joint_vae_tpu.save_load.export_reference import (
        export_to_reference_job)
    back = str(tmp_path / 'ref-back' / '9')
    export_to_reference_job(imported.dst, back, export_recorders=False)
    net2 = ref.Net.load(back, load_state=True)
    want = imported.net.state_dict()
    got = net2.state_dict()
    trunk = [k for k in want if k.startswith('features.')
             and not k.endswith('num_batches_tracked')]
    # resnet18: 20 convs + 20 BNs x 4; resnet50: 53 convs + 53 BNs x 4;
    # densenet121: conv0 + norm0 + 58 layers x (2 conv + 2 BN x 4)
    #              + 3 transitions x (conv + BN x 4) + norm5
    assert len(trunk) == {'resnet18': 100, 'resnet50': 265,
                          'densenet121': 604}[imported.arch]
    for k in trunk:
        np.testing.assert_array_equal(got[k].numpy(), want[k].numpy(),
                                      err_msg=k)


def test_reference_densenet_routing_bug_pinned(ref):
    """Pins the documented reference bug (docs/PARITY.md): WITHOUT the
    route_densenet patch, the reference's own build_de_conv_layers routes
    only resnet* names to ResOrDenseNetFeatures (ref conv.py:138-140), so
    `--features densenet121` silently falls through to the conv-DSL parser
    and builds a wrong tiny conv stack instead of a densenet."""
    import cvae as ref_cvae
    routed = ref_cvae.build_de_conv_layers
    assert getattr(routed, '_jvt_densenet_routed', False)
    stock = None
    # route_densenet wraps the original symbol in its closure
    for cell in (routed.__closure__ or ()):
        if callable(cell.cell_contents):
            stock = cell.cell_contents
    assert stock is not None and not hasattr(stock, '_jvt_densenet_routed')
    trunk = stock((3, 32, 32), 'densenet121')
    # the stock fallthrough yields a conv-DSL Sequential whose name has
    # been re-serialized by the parser — NOT a densenet trunk
    assert type(trunk).__name__ != 'ResOrDenseNetFeatures'
    assert 'denseblock' not in str(trunk)
    assert trunk.name == '32x5'          # the silently-parsed conv
    # the patched routing builds the real thing
    fixed = routed((3, 32, 32), 'densenet121')
    assert type(fixed).__name__ == 'ResOrDenseNetFeatures'
    assert fixed.output_shape == (1024, 1, 1)


def test_densenet_trunk_malformed_rejected():
    """A densenet trunk missing the torchvision stem/norm5 keys (a custom
    parameterization) still refuses with a clear error."""
    from joint_vae_tpu.save_load.import_reference import (
        ImportError_, _map_densenet_features, map_reference_state)
    sd = {'features.0.denseblock1.denselayer1.conv1.weight':
          np.zeros((4, 4, 1, 1), np.float32)}
    with pytest.raises(ImportError_, match='features_stack'):
        map_reference_state(sd, {}, {})
    with pytest.raises(ImportError_, match='stem/norm5'):
        _map_densenet_features(sd, {'features_stack': {}}, {}, {})

"""Conv-string DSL tests: parsing, shape inference, named archs, conv models.

Shape ground truths follow torch Conv2d/ConvTranspose2d arithmetic
(ref module/vae_layers/conv.py:187-213) on the reference's named stacks
(conv-models.ini).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from joint_vae_tpu.models.conv import (
    parse_conv_layer_name, conv_stack_plan, find_input_shape, ConvStack)


def test_parse_basic_conv():
    p = parse_conv_layer_name('32x5+2:1')
    assert p['ltype'] == 'conv' and p['out_channels'] == 32
    assert p['kernel_size'] == 5 and p['padding'] == 2 and p['stride'] == 1

    p = parse_conv_layer_name('64')  # bare channels, default kernel
    assert p['out_channels'] == 64 and p['ltype'] == 'conv'

    p = parse_conv_layer_name('Mx2')
    assert p['ltype'] == 'mpooling' and p['kernel_size'] == 2
    assert p['stride'] == 2 and p['padding'] == 0  # '*' -> 0 for pooling

    p = parse_conv_layer_name('U:2', where='output')
    assert p['ltype'] == 'upsampler' and p['stride'] == 2

    p = parse_conv_layer_name('64:2++1', where='output')
    assert p['ltype'] == 'deconv' and p['stride'] == 2 and p['output_padding'] == 1

    p = parse_conv_layer_name('!3x5+2', where='output')
    assert p['ltype'] == 'conv' and p['out_channels'] == 3
    assert p['kernel_size'] == 5 and p['padding'] == 2


def test_conv32_plan_shapes():
    # conv32 = [x5+2]32-32:2-64-64:2-200x7+0 on (3, 32, 32):
    # 32 -> 16 -> 16 -> 8 -> (8-7)+1 = 2 (torch conv arithmetic)
    name, plans, out = conv_stack_plan((3, 32, 32), 'conv32', where='input')
    assert out == (200, 2, 2)
    shapes = [p.out_shape for p in plans]
    assert shapes == [(32, 32, 32), (32, 16, 16), (64, 16, 16), (64, 8, 8),
                      (200, 2, 2)]


def test_deconv32_plan_shapes():
    # deconv32 on latent grid (64, 1, 1) -> (3, 32, 32)
    _, plans, out = conv_stack_plan((64, 1, 1), 'deconv32', where='output')
    assert out == (3, 32, 32)


def test_vgg11_plan():
    _, plans, out = conv_stack_plan((3, 32, 32), 'vgg11', where='input')
    assert out == (512, 1, 1)


def test_find_input_shape():
    assert find_input_shape('deconv32', (32, 32)) == (1, 1)


def test_categorical_output_channels():
    _, plans, out = conv_stack_plan((64, 1, 1), 'deconv32', where='output',
                                    output_distribution='categorical')
    assert out == (256, 3, 32, 32)
    assert plans[-1].out_channels == 256 * 3


def test_output_activation_replaces_last():
    _, plans, _ = conv_stack_plan((64, 1, 1), 'deconv32', where='output',
                                  output_activation='sigmoid')
    acts = [p.activation for p in plans if p.activation is not None]
    assert acts[-1] == 'sigmoid'
    assert all(a == 'relu' for a in acts[:-1])


def test_conv_stack_forward_shapes():
    name, plans, out = conv_stack_plan((3, 16, 16), '[x5+2]8-8:2-16x8+0',
                                       where='input')
    assert out == (16, 1, 1)
    stack = ConvStack(input_shape=(3, 16, 16), plans=plans, where='input')
    x = jnp.zeros((2, 4, 3, 16, 16))  # leading (L, N) axes ride through
    variables = stack.init(jax.random.PRNGKey(0), x)
    y = stack.apply(variables, x)
    assert y.shape == (2, 4, 16, 1, 1)


def test_deconv_stack_forward_matches_plan():
    _, plans, out = conv_stack_plan((8, 1, 1), '[x5+2]8x8+0-8:2++1-!1x5+2',
                                    where='output')
    stack = ConvStack(input_shape=(8, 1, 1), plans=plans, where='output')
    x = jnp.zeros((3, 8, 1, 1))
    variables = stack.init(jax.random.PRNGKey(0), x)
    y = stack.apply(variables, x)
    assert y.shape == (3,) + out


@pytest.mark.parametrize('arch,inp,expected', [
    ('conv32+', (3, 32, 32), (200, 2, 2)),
    ('conv32-', (3, 32, 32), (200, 2, 2)),
    ('vgg16', (3, 32, 32), (512, 1, 1)),
])
def test_named_arch_output_shapes(arch, inp, expected):
    _, _, out = conv_stack_plan(inp, arch, where='input')
    assert out == expected


def test_batch_norm_stack():
    _, plans, _ = conv_stack_plan((1, 8, 8), '[x3+1]4-4:2', where='input',
                                  batch_norm=True)
    stack = ConvStack(input_shape=(1, 8, 8), plans=plans)
    x = jnp.ones((2, 1, 8, 8))
    variables = stack.init(jax.random.PRNGKey(0), x, train=True)
    assert 'batch_stats' in variables
    y, updates = stack.apply(variables, x, train=True, mutable=['batch_stats'])
    assert y.shape == (2, 4, 4, 4)
    assert 'batch_stats' in updates


def test_packing_factor_decision():
    """The static packing decision (models/conv.py): decoder-only, pure
    (de)conv stacks with even intermediate dims; BN / pooling / input
    stacks / mismatched deconv strides refuse."""
    from joint_vae_tpu.models.conv import conv_stack_plan, ConvStack

    def stack(arch, where, shape=(3, 32, 32)):
        _, plans, _ = conv_stack_plan(shape, arch, where=where)
        return ConvStack(input_shape=shape, plans=plans, where=where)

    # deconv32 from (64,1,1): packs at the default f=2
    s = stack('deconv32', 'output', (64, 1, 1))
    assert s._packing_factor() == 2
    # input stacks never pack (measured loss, see BENCH.md)
    assert stack('conv32', 'input')._packing_factor() == 0
    # pooling layers are phase-coupled -> no packing
    assert stack('[x3+1]8-m:2-8', 'output',
                 (3, 8, 8))._packing_factor() == 0


def test_packed_unpacked_same_params_same_outputs(monkeypatch):
    """Checkpoint lowering-agnosticism: the same parameter tree produces
    (numerically) the same decoder outputs whether executed through the
    packed (JVT_PACK=2) or plain (JVT_PACK=0) lowering."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from joint_vae_tpu.models.conv import conv_stack_plan, ConvStack

    shape = (64, 1, 1)
    _, plans, out = conv_stack_plan(shape, 'deconv32', where='output')
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((2, *shape)).astype(np.float32))

    monkeypatch.setenv('JVT_PACK', '0')
    plain = ConvStack(input_shape=shape, plans=plans, where='output')
    vs = plain.init(jax.random.PRNGKey(0), x)
    y_plain = plain.apply(vs, x)

    monkeypatch.setenv('JVT_PACK', '2')
    packed = ConvStack(input_shape=shape, plans=plans, where='output')
    y_packed = packed.apply(vs, x)          # same variables, new lowering

    assert y_packed.shape == y_plain.shape == (2,) + out
    np.testing.assert_allclose(np.asarray(y_packed), np.asarray(y_plain),
                               rtol=2e-4, atol=2e-4)


def test_ivgg_embedded_conv_defaults():
    """The '[!x3+1-U:2]' defaults block applies to '!C' tokens: ivgg convs
    are 3x3/pad-1 (ref conv.py:66-77 ValueError path registers the bare-'!'
    spec under the conv type)."""
    from joint_vae_tpu.models.conv import conv_stack_plan
    _, plans, _ = conv_stack_plan((64, 2, 2), 'ivgg', where='output')
    convs = [p for p in plans if p.ltype == 'conv']
    ups = [p for p in plans if p.ltype == 'upsampler']
    assert convs and all(p.kernel_size == 3 and p.padding == 1
                         and p.stride == 1 for p in convs)
    assert ups and all(p.stride == 2 for p in ups)
    assert [p.out_channels for p in convs] == [128, 64, 32, 3]

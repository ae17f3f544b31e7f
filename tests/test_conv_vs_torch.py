"""Conv-plan shape arithmetic validated against torch's actual layers (the
reference's runtime): for a grid of DSL tokens, the planned output shapes
must equal what torch Conv2d/ConvTranspose2d/pooling produce."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from joint_vae_tpu.models.conv import (parse_conv_layer_name, conv_stack_plan,
                                       ConvStack)

torch = pytest.importorskip('torch')
import torch.nn as tnn  # noqa: E402


def _torch_layer(p, in_ch, where):
    lt = p['ltype']
    if lt == 'conv':
        return tnn.Conv2d(in_ch, p['out_channels'], p['kernel_size'],
                          stride=p['stride'], padding=p['padding']), \
            p['out_channels']
    if lt == 'deconv':
        return tnn.ConvTranspose2d(in_ch, p['out_channels'], p['kernel_size'],
                                   stride=p['stride'], padding=p['padding'],
                                   output_padding=p.get('output_padding', 0)), \
            p['out_channels']
    if lt == 'mpooling':
        return tnn.MaxPool2d(p['kernel_size'], stride=p['stride'],
                             padding=p['padding']), in_ch
    if lt == 'apooling':
        return tnn.AvgPool2d(p['kernel_size'], stride=p['stride'],
                             padding=p['padding']), in_ch
    if lt == 'upsampler':
        return tnn.UpsamplingNearest2d(scale_factor=p['stride']), in_ch
    raise ValueError(lt)


@pytest.mark.parametrize('arch,input_shape,where', [
    ('conv32', (3, 32, 32), 'input'),
    ('conv32+', (3, 32, 32), 'input'),
    ('vgg11', (3, 32, 32), 'input'),
    ('deconv32', (64, 1, 1), 'output'),
    ('deconv32+', (128, 1, 1), 'output'),
    ('[x5+2]8-Mx2-16:2-Ax3', (1, 28, 28), 'input'),
])
def test_planned_shapes_match_torch(arch, input_shape, where):
    from joint_vae_tpu.models.conv import FEATURES_ARCHS, UPSAMPLER_ARCHS
    name, plans, out_shape = conv_stack_plan(input_shape, arch, where=where)

    # replay the same tokens through torch layers
    s = FEATURES_ARCHS.get(arch, UPSAMPLER_ARCHS.get(arch, arch))
    default_params = {}
    if s.startswith('['):
        end = s.find(']')
        for tok in s[1:end].split('-'):
            q = parse_conv_layer_name(tok, where=where)
            default_params[q.pop('ltype')] = q
        s = s[end + 1:]
    x = torch.zeros(1, *input_shape)
    in_ch = input_shape[0]
    torch_shapes = []
    for tok in s.split('-'):
        q0 = parse_conv_layer_name(tok, where=where)
        q = parse_conv_layer_name(tok, **default_params.get(q0['ltype'], {}),
                                  where=where)
        layer, in_ch = _torch_layer(q, in_ch, where)
        x = layer(x)
        torch_shapes.append(tuple(x.shape[1:]))

    plan_shapes = [p.out_shape for p in plans]
    assert plan_shapes == torch_shapes, (arch, plan_shapes, torch_shapes)

    # and the jax stack produces the planned shape
    stack = ConvStack(input_shape=input_shape, plans=plans, where=where)
    xi = jnp.zeros((1, *input_shape))
    vs = stack.init(jax.random.PRNGKey(0), xi)
    y = stack.apply(vs, xi)
    expect = out_shape if where == 'input' else out_shape
    assert y.shape[1:] == tuple(expect)

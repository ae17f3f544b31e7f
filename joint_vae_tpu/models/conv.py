"""Conv/deconv stacks built from the reference's string DSL.

Grammar (ref module/vae_layers/conv.py:20-105 and conv-models.ini header):

- layers separated by ``-``; a leading ``[...]`` block sets per-type defaults
- conv token ``CxK+P:S``: C out-channels, K kernel, P padding, S stride
- ``M.../A...``: max/avg pooling; ``U:S`` nearest upsampling by S
- deconv tokens additionally take ``++P`` output padding; ``!Cx..`` embeds a
  plain conv inside a deconv (upsampler) stack
- padding ``*`` means 'same' (K//2) for conv, 0 for pooling
- named stacks (vgg11/13/16/19, conv32, deconv32, ivgg...) resolve to strings

TPU-first implementation notes:

- Compute is NHWC (TPU-native conv layout); the public API keeps the
  reference's (C, H, W) convention and transposes at the stack boundary.
- Deconvs are fractionally-strided convs via ``lax.conv_general_dilated`` with
  ``lhs_dilation`` so the output-shape arithmetic matches torch's
  ConvTranspose2d exactly: out = (in-1)*s - 2p + k + op.
- Shape inference is done statically at plan time (ref conv.py:187-213), so
  everything under jit has static shapes.
"""

import dataclasses
import re
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

# ---------------------------------------------------------------------------
# Named architectures (same strings as the reference registry,
# ref module/vae_layers/conv-models.ini:11-30)
# ---------------------------------------------------------------------------

FEATURES_ARCHS = {
    'vgg11': '[x3-Mx2]64-M-128-M-256-256-M-512-512-M-512-512-M-Ax1',
    'vgg11-a': '[x3-Ax2]64-A-128-A-256-256-A-512-512-A-512-512-A-Ax1',
    'vgg13': '[x3-Mx2]64-64-M-128-128-M-256-256-M-512-512-M-512-512-M-Ax1',
    'vgg16': ('[x3-Mx2]64-64-M-128-128-M-256-256-256-M-512-512-512-M-'
              '512-512-512-M-Ax1'),
    'vgg19': ('[x3-Mx2]64-64-M-128-128-M-256-256-256-256-M-512-512-512-512-M-'
              '512-512-512-512-M-Ax1'),
    'vgg19-a': ('[x3-Ax2]64-64-A-128-128-A-256-256-256-256-A-512-512-512-512-A-'
                '512-512-512-512-A-Ax1'),
    'conv32': '[x5+2]32-32:2-64-64:2-200x7+0',
    'conv32-': '[x3+1]32-32-32-32:2-64-64-64-64:2-200x7+0',
    'conv32+': '[x5+2]32-32:2-64-64:2-128-128:2-200x3+0',
}

UPSAMPLER_ARCHS = {
    'deconv32': '[x5+2]64x8+0-64-64:2++1-32-32:2++1-32-!3x5+2',
    'deconv32-': '[x3+1]64x8+0-64-64-64-64:2++1-32-32-32-32:2++1-32-!3x5+2',
    'deconv32+': '[x5+2]128x4+0-128-128:2++1-64-64:2++1-32-32:2++1-32-!3x5+2',
    'ivgg': '[!x3+1-U:2]U-!128-U-!64-U-!32-U-!3',
    'ivgg19': ('[!x3+1-U:2]U-!512-!512-!512-!512-U-!512-!512-!512-!512-U-'
               '!256-!256-!256-!256-U-!128-!128-U-!64-!64-!3'),
    'ivgg11': '[!x3+1-U:2]U-!512-!512-U-!512-!512-U-!256-!256-U-!128-U-!64-!3',
}


# One left-to-right field scan over a layer token: either a marked field
# ('++O' output padding, 'xK' kernel, '+P' padding, ':S' stride, '^C'
# channels, '!C' plain-conv-in-deconv) or a bare digit run (channels when it
# opens the token).  '*' or an empty value keeps the running default.
_FIELD_RX = re.compile(r'(\+\+|[x^+:!])([\d*]*)|(\d+)')
_FIELD_OF = {'x': 'kernel_size', '^': 'out_channels', '+': 'padding',
             ':': 'stride', '++': 'output_padding', '!': 'conv_in_deconv'}
_PREFIX_LTYPE = {'a': 'apooling', 'm': 'mpooling', 'u': 'upsampler'}


def parse_conv_layer_name(s: str, ltype: str = 'conv', out_channels: int = 32,
                          kernel_size: int = 5, padding='*', stride=None,
                          output_padding: int = 0, where: str = 'input') -> dict:
    """Parse one layer token of the conv-string DSL.

    The grammar is the behavioral spec shared with the reference
    (module/vae_layers/conv.py:20-86); the implementation here is a single
    tokenizing scan.  ``where='output'`` switches the base type to deconv and
    enables the ``++``/``!`` fields; an ``a``/``m``/``u`` prefix selects
    avg/max pooling or an upsampling layer.
    """
    if where == 'output':
        ltype = 'deconv'
    if s[:1].lower() in _PREFIX_LTYPE:
        ltype = _PREFIX_LTYPE[s[0].lower()]
        s = s[1:]

    fields = {}
    for m in _FIELD_RX.finditer(s):
        if m.group(3) is not None:
            if m.start() == 0:              # leading bare int = channels
                fields['out_channels'] = int(m.group(3))
            continue
        v = m.group(2)
        if v.isdigit():
            fields[_FIELD_OF[m.group(1)]] = int(v)

    if where != 'output':
        fields.pop('output_padding', None)
        fields.pop('conv_in_deconv', None)
    if 'conv_in_deconv' in fields:          # '!C': plain conv inside a deconv stack
        ltype = 'conv'
        out_channels = fields.pop('conv_in_deconv')
        fields.pop('out_channels', None)
        fields.pop('output_padding', None)

    is_convolution = ltype in ('conv', 'deconv')
    params = {'ltype': ltype,
              'kernel_size': fields.get('kernel_size', kernel_size),
              'padding': fields.get('padding', padding),
              'stride': fields.get('stride', stride)}
    if is_convolution:
        params['out_channels'] = fields.get('out_channels', out_channels)
    if ltype == 'deconv':
        params['output_padding'] = fields.get('output_padding', output_padding)

    if params['padding'] == '*':
        params['padding'] = params['kernel_size'] // 2 if is_convolution else 0
    if params['stride'] is None:
        params['stride'] = 1 if is_convolution else params['kernel_size']
    return params


@dataclasses.dataclass(frozen=True)
class LayerPlan:
    ltype: str                       # conv | deconv | mpooling | apooling | upsampler
    out_channels: Optional[int]
    kernel_size: int
    padding: int
    stride: int
    output_padding: int = 0
    batch_norm: bool = False
    activation: Optional[str] = 'relu'   # None = no activation after
    out_shape: Tuple[int, int, int] = (0, 0, 0)   # (C, H, W)

    @property
    def token(self) -> str:
        """Canonical token (ref conv_layer_name, conv.py:89-105)."""
        if self.ltype in ('conv', 'deconv'):
            s = '{}x{}'.format(self.out_channels, self.kernel_size)
            if self.padding != self.kernel_size // 2:
                s += '+{}'.format(self.padding)
            if self.stride != 1:
                s += ':{}'.format(self.stride)
            return s
        if self.ltype.endswith('pooling'):
            s = '{}x{}'.format(self.ltype[0].upper(), self.kernel_size)
            if self.stride != self.kernel_size:
                s += ':{}'.format(self.stride)
            return s
        return 'u:{}'.format(self.stride)


def conv_stack_plan(input_shape: Sequence[int], layers_name: str,
                    where: str = 'input', batch_norm: bool = False,
                    activation: str = 'relu', output_activation: str = 'linear',
                    output_distribution: str = 'gaussian'):
    """Resolve a DSL string into a static list of LayerPlans with inferred
    shapes (ref build_de_conv_layers, conv.py:128-244).

    Returns (name, [LayerPlan...], output_shape) — output_shape is (256, C, H, W)
    prepended for categorical output stacks.
    """
    name = None
    if where == 'input' and layers_name in FEATURES_ARCHS:
        name, layers_name = layers_name, FEATURES_ARCHS[layers_name]
    if where == 'output' and layers_name in UPSAMPLER_ARCHS:
        name, layers_name = layers_name, UPSAMPLER_ARCHS[layers_name]

    if isinstance(input_shape, int):
        input_shape = (input_shape, 1, 1)

    default_params = {}
    if layers_name.startswith('['):
        end = layers_name.find(']')
        for tok in layers_name[1:end].split('-'):
            p = parse_conv_layer_name(tok, where=where)
            default_params[p.pop('ltype')] = p
        layers_name = layers_name[end + 1:]

    tokens = layers_name.split('-')
    plans: List[LayerPlan] = []
    c, h, w = input_shape

    for i, tok in enumerate(tokens):
        last = i == len(tokens) - 1
        p0 = parse_conv_layer_name(tok, where=where)
        p = parse_conv_layer_name(tok, **default_params.get(p0['ltype'], {}), where=where)
        ltype = p.pop('ltype')

        if where == 'output' and last and output_distribution == 'categorical':
            p['out_channels'] = 256 * p['out_channels']

        k, pad, s = p['kernel_size'], p['padding'], p['stride']
        act = activation if ltype.endswith('conv') else None
        bn = batch_norm and ltype.endswith('conv')
        if ltype == 'conv':
            c = p['out_channels']
            h = (h + 2 * pad - k) // s + 1
            w = (w + 2 * pad - k) // s + 1
        elif ltype == 'deconv':
            c = p['out_channels']
            h = (h - 1) * s - 2 * pad + k + p.get('output_padding', 0)
            w = (w - 1) * s - 2 * pad + k + p.get('output_padding', 0)
        elif ltype.endswith('pooling'):
            h = (h + 2 * pad - k) // s + 1
            w = (w + 2 * pad - k) // s + 1
        elif ltype == 'upsampler':
            h, w = int(h * s), int(w * s)
        else:
            raise ValueError(ltype)

        plans.append(LayerPlan(ltype=ltype, out_channels=p.get('out_channels'),
                               kernel_size=k, padding=pad, stride=s,
                               output_padding=p.get('output_padding', 0),
                               batch_norm=bn, activation=act,
                               out_shape=(c, h, w)))

    # the last activation of an output stack becomes the output activation
    if where == 'output':
        for j in range(len(plans) - 1, -1, -1):
            if plans[j].activation is not None:
                plans[j] = dataclasses.replace(plans[j], activation=output_activation)
                break

    out_shape = (c, h, w)
    if where == 'output' and output_distribution == 'categorical':
        out_shape = (256, c // 256, h, w)
    name = name or '-'.join(pl.token for pl in plans)
    return name, tuple(plans), out_shape


def find_input_shape(layers_name: str, wanted_output_shape: Sequence[int],
                     input_shape: Tuple[int, int] = (1, 1)) -> Tuple[int, int]:
    """Smallest (H, W) whose deconv output matches wanted (H, W)
    (ref find_input_shape, conv.py:108-125)."""
    h, w = input_shape
    while True:
        _, _, out = conv_stack_plan((1, h, w), layers_name, where='output')
        oh, ow = out[-2], out[-1]
        if (oh, ow) == tuple(wanted_output_shape):
            return (h, w)
        if oh > wanted_output_shape[0] or ow > wanted_output_shape[1]:
            raise ValueError('Did not find an input shape yielding output size '
                             '({}, {}) for {}'.format(*wanted_output_shape, layers_name))
        h += int(oh < wanted_output_shape[0])
        w += int(ow < wanted_output_shape[1])


ACTIVATIONS = {
    'relu': nn.relu,
    'leaky': lambda x: nn.leaky_relu(x, negative_slope=0.2),
    'sigmoid': nn.sigmoid,
    'tanh': nn.tanh,
    'linear': lambda x: x,
}


class ConvStack(nn.Module):
    """A (de)conv stack executing a static plan.

    Input/output follow the reference's (..., C, H, W) layout; compute is NHWC.
    Leading batch axes of any rank are flattened for the conv and restored
    after (the (L+1, C, N) axes ride through as one fused batch).
    """
    input_shape: Tuple[int, int, int]         # (C, H, W)
    plans: Tuple[LayerPlan, ...]
    output_distribution: str = 'gaussian'
    where: str = 'input'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        lead = x.shape[:-3]
        c0, h0, w0 = self.input_shape
        x = x.reshape((-1, c0, h0, w0)).transpose(0, 2, 3, 1)  # NCHW->NHWC
        x = x.astype(self.dtype)

        for i, pl in enumerate(self.plans):
            if pl.ltype == 'conv':
                x = nn.Conv(pl.out_channels, (pl.kernel_size, pl.kernel_size),
                            strides=(pl.stride, pl.stride),
                            padding=[(pl.padding, pl.padding)] * 2,
                            dtype=self.dtype, name='conv_{}'.format(i))(x)
            elif pl.ltype == 'deconv':
                x = _DeconvLayer(pl, dtype=self.dtype, name='deconv_{}'.format(i))(x)
            elif pl.ltype == 'mpooling':
                x = nn.max_pool(x, (pl.kernel_size, pl.kernel_size),
                                strides=(pl.stride, pl.stride),
                                padding=[(pl.padding, pl.padding)] * 2)
            elif pl.ltype == 'apooling':
                x = nn.avg_pool(x, (pl.kernel_size, pl.kernel_size),
                                strides=(pl.stride, pl.stride),
                                padding=[(pl.padding, pl.padding)] * 2)
            elif pl.ltype == 'upsampler':
                x = jnp.repeat(jnp.repeat(x, pl.stride, axis=1), pl.stride, axis=2)
            if pl.batch_norm:
                x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                                 name='bn_{}'.format(i))(x)
            if pl.activation is not None:
                x = ACTIVATIONS[pl.activation](x)

        x = x.transpose(0, 3, 1, 2)  # NHWC->NCHW
        c, h, w = self.plans[-1].out_shape
        if self.where == 'output' and self.output_distribution == 'categorical':
            return x.reshape(lead + (256, c // 256, h, w))
        return x.reshape(lead + (c, h, w))


class _DeconvLayer(nn.Module):
    """Fractionally-strided conv matching torch ConvTranspose2d shape math.

    An exact phase-decomposition path (:func:`_phase_deconv`, sub-pixel
    convolution — s^2 dense convs instead of a zero-dilated one) is kept
    behind ``phase_decompose=True``: measured on the v5e it LOSES to XLA's
    native dilated lowering (90k vs 112k img/s on the flagship bench; the
    strided-scatter interleave and narrow sub-kernels cost more than the
    dilation zeros) — the MAC-count argument does not survive contact with
    the Mosaic scheduler.  Parity-tested in tests/test_phase_deconv.py;
    revisit for larger spatial dims.
    """
    plan: LayerPlan
    dtype: jnp.dtype = jnp.float32
    phase_decompose: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pl = self.plan
        k, p, s, op = pl.kernel_size, pl.padding, pl.stride, pl.output_padding
        in_ch = x.shape[-1]
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (k, k, in_ch, pl.out_channels), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (pl.out_channels,), jnp.float32)
        x = x.astype(self.dtype)
        kern = kernel.astype(self.dtype)
        if s > 1 and self.phase_decompose:
            y = _phase_deconv(x, kern, k, p, s, op)
        else:
            pad = (k - 1 - p, k - 1 - p + op)
            y = lax.conv_general_dilated(
                x, kern, window_strides=(1, 1), padding=[pad, pad],
                lhs_dilation=(s, s),
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return y + bias.astype(self.dtype)


def _phase_deconv(x: jax.Array, kernel: jax.Array, k: int, p: int, s: int,
                  op: int) -> jax.Array:
    """Transposed conv via s x s dense phase convolutions.

    Derivation: the dilation path computes (correlation convention)
        y[m] = sum_t K[t] * xd[m - A + t],   A = k - 1 - p,
    with xd the s-dilated input.  Nonzero terms need s | (m - A + t), so for
    output phase r = m mod s only taps t === (A - r) (mod s) contribute, and
        y[s*u + r] = sum_a K[c + s*a] * x[u + a + e],
    with c = (A - r) mod s and e = (r - A + c) / s (an integer).  Each phase
    is then a stride-1 conv of x with the sub-kernel, padded so the phase
    output has ceil((H_out - r) / s) rows."""
    N, H, W, Cin = x.shape
    Cout = kernel.shape[-1]
    A = k - 1 - p
    H_out = (H - 1) * s - 2 * p + k + op
    W_out = (W - 1) * s - 2 * p + k + op

    def phase_geometry(r: int, n_in: int, n_out: int):
        c = (A - r) % s
        taps = list(range(c, k, s))
        e = (r - A + c) // s
        n_r = -(-(n_out - r) // s) if n_out > r else 0
        kp = len(taps)
        lo = -e
        hi = n_r + kp - 1 - n_in - lo
        return c, e, n_r, kp, lo, hi

    y = jnp.zeros((N, H_out, W_out, Cout), x.dtype)
    for rh in range(s):
        ch, eh, nh, kh, lo_h, hi_h = phase_geometry(rh, H, H_out)
        if nh <= 0 or kh == 0:
            continue
        for rw in range(s):
            cw, ew, nw, kw, lo_w, hi_w = phase_geometry(rw, W, W_out)
            if nw <= 0 or kw == 0:
                continue
            sub = kernel[ch::s, cw::s]                    # (kh, kw, Cin, Cout)
            out = lax.conv_general_dilated(
                x, sub, window_strides=(1, 1),
                padding=[(lo_h, hi_h), (lo_w, hi_w)],
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            y = y.at[:, rh::s, rw::s, :].set(out)
    return y

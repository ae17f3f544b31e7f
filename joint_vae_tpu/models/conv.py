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
import numpy as np
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
        elif m.group(1) == '!':
            # a bare '!' still switches the token to a plain conv (the
            # reference's ValueError path keeps the running default
            # channels but flips the type, conv.py:66-77) — this is how
            # the ivgg defaults block '[!x3+1-...]' registers conv
            # defaults inside a deconv stack
            fields['conv_in_deconv'] = None

    if where != 'output':
        fields.pop('output_padding', None)
        fields.pop('conv_in_deconv', None)
    if 'conv_in_deconv' in fields:          # '!C': plain conv inside a deconv stack
        ltype = 'conv'
        # a bare '!' yields out_channels=None like the reference (its
        # int('') except-path overwrites the default, conv.py:68-77) —
        # that None only ever flows through defaults blocks ('[!x3+1-...]'),
        # where the layer token's own '!C' digits replace it
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
        # 'same' resolves to k//2 only for input-side convs; output stacks
        # (deconv AND '!'-embedded convs) resolve '*' to 0 — the reference
        # checks its pre-'!' local ltype (conv.py:79-80), so where='output'
        # never takes the k//2 branch
        params['padding'] = (params['kernel_size'] // 2
                             if ltype == 'conv' and where != 'output' else 0)
    if params['stride'] is None:
        if is_convolution:
            params['stride'] = 1
        elif ltype.endswith('pooling'):
            # torch's MaxPool2d/AvgPool2d default (the reference resolves
            # this at build time by passing stride=None to torch)
            params['stride'] = params['kernel_size']
        # upsampler: stays None like the reference — a bare 'U' is only
        # valid under a defaults block ('[...-U:2]') that supplies it
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


# ---------------------------------------------------------------------------
# Phase-packed (space-to-depth) convolution lowering.
#
# The conv32/deconv32 family computes most of its FLOPs in 3-to-64-channel
# convs whose output-channel count uses a fraction of the MXU's 128 lanes
# (measured on a v5e: the 32->3 output conv ran at ~12 TFLOP/s, the 32->32
# convs at ~75).  Lowering them onto an f x f phase-packed grid — tensor
# (H, W, C) stored as (H/f, W/f, f^2 C) — multiplies the lane occupancy by
# f^2 at the cost of structurally-zero kernel taps.
#
# One index identity covers conv, strided conv, and transposed conv: with
# output pixel m = f_out*P + R, input pixel i = f_in*pi + qi, and the layer
# relation i = (num*m + t - off)/den (conv: num=s, den=1, off=p; deconv:
# num=1, den=s, off=k-1-p), the packed operation is a plain conv over P with
# integer stride g = num*f_out/(den*f_in) and tap offsets
# d = (num*R + t - off - den*qi)/(den*f_in) wherever that is an integer.
# The packed kernel is a gather of the original (k, k, Cin, Cout) parameter
# (zeros elsewhere), so the stored parameter layout — and therefore
# checkpoints — are lowering-agnostic.
# ---------------------------------------------------------------------------

_PACK_DEFAULT = 2


def _pack_target() -> int:
    import os
    v = os.environ.get('JVT_PACK', '')
    if v == '':
        return _PACK_DEFAULT
    return max(int(v), 0)


def _packed_geometry(k: int, off: int, num: int, den: int,
                     f_in: int, f_out: int):
    """Tap table of the packed lowering; returns (g, dmin, tap) with
    tap[a, qi, R] = original tap index t at packed offset d = dmin + a for
    input phase qi / output phase R, or -1 where no tap lands."""
    assert (num * f_out) % (den * f_in) == 0, (num, den, f_in, f_out)
    g = (num * f_out) // (den * f_in)
    entries = []
    for R in range(f_out):
        for qi in range(f_in):
            for t in range(k):
                n = num * R + t - off - den * qi
                if n % (den * f_in) == 0:
                    entries.append((R, qi, t, n // (den * f_in)))
    dmin = min(e[3] for e in entries)
    dmax = max(e[3] for e in entries)
    tap = np.full((dmax - dmin + 1, f_in, f_out), -1, np.int64)
    for R, qi, t, d in entries:
        tap[d - dmin, qi, R] = t
    return g, dmin, tap


def _packed_kernel(kern: jax.Array, tap_h: np.ndarray,
                   tap_w: np.ndarray) -> jax.Array:
    """(k, k, Cin, Cout) -> (k'_h, k'_w, f_in^2 Cin, f_out^2 Cout); packed
    channel order is (phase_h, phase_w, channel) on both sides."""
    kph, fi, fo = tap_h.shape
    kpw = tap_w.shape[0]
    ih = np.maximum(tap_h, 0)[:, None, :, None, :, None]
    iw = np.maximum(tap_w, 0)[None, :, None, :, None, :]
    mask = ((tap_h >= 0)[:, None, :, None, :, None]
            & (tap_w >= 0)[None, :, None, :, None, :])
    g = kern[jnp.asarray(ih), jnp.asarray(iw)]   # (kph,kpw,fi,fi,fo,fo,Ci,Co)
    g = g * jnp.asarray(mask, kern.dtype)[..., None, None]
    ci, co = kern.shape[2], kern.shape[3]
    g = g.transpose(0, 1, 2, 3, 6, 4, 5, 7)
    return g.reshape(kph, kpw, fi * fi * ci, fo * fo * co)


def space_to_depth(x: jax.Array, f: int) -> jax.Array:
    """(N, H, W, C) -> (N, H/f, W/f, f^2 C), channel order (rh, rw, c)."""
    if f == 1:
        return x
    n, h, w, c = x.shape
    x = x.reshape(n, h // f, f, w // f, f, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // f, w // f, f * f * c)


def depth_to_space(x: jax.Array, f: int) -> jax.Array:
    if f == 1:
        return x
    n, hp, wp, cf = x.shape
    c = cf // (f * f)
    x = x.reshape(n, hp, wp, f, f, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, hp * f, wp * f, c)


def _unpack_to(x: jax.Array, f: int, h: int, w: int) -> jax.Array:
    """depth_to_space + slice to the true (h, w) when f does not divide."""
    y = depth_to_space(x, f)
    return y[:, :h, :w]


def packed_conv(x: jax.Array, kern: jax.Array, *, k: int, off: int, num: int,
                den: int, f_in: int, f_out: int, h_out: int, w_out: int) -> jax.Array:
    """Run a (de)conv on an f_in-packed input, producing an f_out-packed
    output of ceil(h_out/f_out) x ceil(w_out/f_out) packed pixels."""
    g, dmin, tap = _packed_geometry(k, off, num, den, f_in, f_out)
    kd = _packed_kernel(kern, tap, tap)
    hp_in, wp_in = x.shape[-3], x.shape[-2]
    p_h = -(-h_out // f_out)
    p_w = -(-w_out // f_out)
    dmax = dmin + tap.shape[0] - 1
    pad = lambda n_out, n_in: (-dmin, g * (n_out - 1) + dmax - (n_in - 1))
    pads = [pad(p_h, hp_in), pad(p_w, wp_in)]
    if g == 1:
        from ..ops.pallas_conv import maybe_same_grid_conv
        y = maybe_same_grid_conv(x, kd, (1, 1), pads)
        if y is not None:
            return y
    return lax.conv_general_dilated(
        x, kd, window_strides=(g, g),
        padding=pads,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def _grouped_target() -> int:
    """Horizontal group width for the grouped first-conv lowering
    (JVT_GROUPED_CONV: '' disables, 'auto' = 4, else the integer width)."""
    import os
    v = os.environ.get('JVT_GROUPED_CONV', '')
    if v in ('', '0'):
        return 0
    return 4 if v == 'auto' else max(int(v), 0)


def _c0_packed_target() -> int:
    """Packing factor for the packed-output first-conv lowering
    (JVT_C0_PACKED: '' disables, 'auto'/'1' = 2, else the integer factor).

    Measured on the v5e (probe_features_r2b, training-true backward — the
    input image is not differentiated): c0 3->32 packed f_out=2 + unpack
    runs in 0.194 ms vs 0.286 plain and 0.245 grouped f=4.  Unlike the
    decoder stacks the packing does NOT propagate (mid-stack packing
    measured as losing, docs/BENCH.md): the output is unpacked right after
    the conv, so only the lane-starved first matmul changes."""
    import os
    v = os.environ.get('JVT_C0_PACKED', '')
    if v in ('', '0'):
        return 0
    return 2 if v in ('auto', '1') else max(int(v), 0)


def grouped_conv(x: jax.Array, kern: jax.Array, *, k: int, p: int,
                 f: int) -> jax.Array:
    """'same' stride-1 conv as one im2col matmul over ``f`` horizontally
    adjacent output pixels.

    A conv whose out_channels use a fraction of the MXU's 128 lanes (the
    3->32 input conv measured ~11% effective bf16 FLOPs) is lifted to
    ``f * out_channels`` lanes: patches (N, H, W/f, Cin*k*(k+f-1)) contract
    against an embedded kernel whose ``f`` shifted copies share one stored
    (k, k, Cin, Cout) parameter — like ``packed_conv``, checkpoints are
    lowering-agnostic, and autodiff recovers dw through the embed.
    Requires p == k//2, odd k, and W divisible by f."""
    n, h, w, cin = x.shape
    cout = kern.shape[-1]
    kw = k + f - 1
    # patch features are ordered (cin, ky, kx) (conv_general_dilated_patches)
    wg = jnp.stack([jnp.pad(kern, ((0, 0), (j, f - 1 - j), (0, 0), (0, 0)))
                    for j in range(f)], axis=3)      # (k, kw, cin, f, cout)
    wg = wg.transpose(2, 0, 1, 3, 4).reshape(cin * k * kw, f * cout)
    pat = lax.conv_general_dilated_patches(
        x, (k, kw), (1, f), [(p, p), (p, p)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))  # (n, h, w/f, cin*k*kw)
    y = jnp.dot(pat.reshape(-1, cin * k * kw), wg,
                preferred_element_type=jnp.float32)
    return y.reshape(n, h, w, cout).astype(x.dtype)


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

    def native_f(self) -> int:
        """Packing factor of the stack's *native* (pre-unpack, NHWC) output.

        0 = no native output available (categorical output stacks need the
        256-way channel reshape); 1 = NHWC, unpacked; f>1 = f-phase-packed
        NHWC with channel order (phase_h, phase_w, channel) and every packed
        pixel mapping to a true pixel (exact divisibility).

        Scoring callers use this to compute permutation-invariant losses
        (MSE/NLL sums over image dims) directly on the native layout —
        skipping the depth-to-space + NHWC->NCHW formatting of every decoded
        sample; only the small true input batch gets transformed instead.
        Mirrors the f-evolution of ``__call__`` (asserted there)."""
        if self.where == 'output' and self.output_distribution == 'categorical':
            return 0
        pack = self._packing_factor()
        f = 1
        h, w = self.input_shape[1], self.input_shape[2]
        n_layers = len(self.plans)
        for i, pl in enumerate(self.plans):
            _, oh, ow = pl.out_shape
            last = i == n_layers - 1
            if pl.ltype in ('conv', 'deconv'):
                is_dc = pl.ltype == 'deconv'
                if is_dc and h == 1 and w == 1 and f == 1:
                    f = 1                       # matmul latent expansion
                elif is_dc and pl.stride > 1:
                    f = pl.stride if (pl.stride == pack and not last) else 1
                else:
                    f = f if f > 1 else 1   # input stacks never pack
            else:
                f = 1                           # pooling/upsampler unpack
            h, w = oh, ow
        if f > 1 and (h % f or w % f):
            return 1                            # final unpack slices padding
        return max(f, 1)

    def _packing_factor(self) -> int:
        """Static decision: phase-pack this stack (0 = unpacked).

        Packing requires a pure (de)conv stack (no pooling/upsampler/BN —
        pooling is phase-coupled, BN stats are per-true-channel) and even
        intermediate spatial dims (an odd packed row would carry garbage
        phases into the next layer's padding region)."""
        pack = _pack_target()
        if pack < 2:
            return 0
        if self.where == 'input':
            # measured on the v5e (probe_stacks): packing conv32 LOSES
            # (0.92 vs 0.66 ms fwd+bwd) — the packed kernels' structural
            # zeros inflate the MACs ~2-5x on the cheap early convs, more
            # than the f^2 lane gain recovers.  Decoder stacks win big
            # (1.06 vs 1.40 ms) because their expensive convs are
            # few-channel and late.
            return 0
        for pl in self.plans:
            if pl.ltype not in ('conv', 'deconv') or pl.batch_norm:
                return 0
            if pl.ltype == 'deconv' and pl.stride > 1 and pl.stride != pack:
                return 0
        for pl in self.plans[:-1]:
            _, oh, ow = pl.out_shape
            if oh % pack or ow % pack:
                return 0
        return pack

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 native_out: bool = False) -> jax.Array:
        lead = x.shape[:-3]
        c0, h0, w0 = self.input_shape
        x = x.reshape((-1, c0, h0, w0)).transpose(0, 2, 3, 1)  # NCHW->NHWC
        x = x.astype(self.dtype)

        pack = self._packing_factor()
        f = 1                                  # current packing of x
        h, w, c = h0, w0, c0                   # current true dims
        n_layers = len(self.plans)

        for i, pl in enumerate(self.plans):
            oc, oh, ow = pl.out_shape
            last = i == n_layers - 1
            if pl.ltype in ('conv', 'deconv'):
                is_dc = pl.ltype == 'deconv'
                k, p, s = pl.kernel_size, pl.padding, pl.stride
                op = pl.output_padding
                kern, bias = _ConvParams(
                    (k, k, c, pl.out_channels),
                    name=('deconv_{}' if is_dc else 'conv_{}').format(i))()
                kern = kern.astype(self.dtype)
                if is_dc and h == 1 and w == 1 and f == 1:
                    # latent->spatial expansion: one MXU matmul
                    kf = _flipped_1x1_kernel(kern, k, p, k - 2 * p + op)
                    x = jnp.einsum('nc,hwcd->nhwd', x[:, 0, 0, :], kf)
                    f = 1
                elif is_dc and s > 1:
                    # sub-pixel: dense conv to s^2-phase-packed channels
                    if f > 1:
                        x = _unpack_to(x, f, h, w)
                    x = packed_conv(x, kern, k=k, off=k - 1 - p, num=1, den=s,
                                    f_in=1, f_out=s, h_out=oh, w_out=ow)
                    if s == pack and not last:
                        f = s              # stay packed through what follows
                    else:
                        x = _unpack_to(x, s, oh, ow)
                        f = 1
                else:
                    num, den, off = (1, 1, k - 1 - p) if is_dc else (s, 1, p)
                    f_in = f
                    # input stacks are never phase-packed (_packing_factor
                    # returns 0 for where='input' — measured negative)
                    f_out = f if f > 1 else 1
                    gf = _grouped_target()
                    cp = _c0_packed_target()
                    if f_in == 1 and f_out == 1:
                        if (cp > 1 and not is_dc and s == 1 and i == 0
                                and self.where == 'input' and c <= 4
                                and pl.out_channels * cp * cp <= 128
                                and oh % cp == 0 and ow % cp == 0):
                            # lane-starved first conv -> cp-phase-packed
                            # output, unpacked immediately (the rest of the
                            # input stack stays unpacked; see
                            # _c0_packed_target)
                            x = packed_conv(x, kern, k=k, off=p, num=1,
                                            den=1, f_in=1, f_out=cp,
                                            h_out=oh, w_out=ow)
                            x = depth_to_space(x, cp)
                        elif (gf > 1 and not is_dc and s == 1 and k % 2 == 1
                                and p == k // 2 and w % gf == 0
                                and pl.out_channels * gf <= 128):
                            # lane-starved small-c_out conv -> grouped matmul
                            x = grouped_conv(x, kern, k=k, p=p, f=gf)
                        else:
                            pad = ((p, p) if not is_dc
                                   else (k - 1 - p, k - 1 - p + op))
                            st = (s, s) if not is_dc else (1, 1)
                            from ..ops.pallas_conv import maybe_same_grid_conv
                            x_p = maybe_same_grid_conv(x, kern, st, [pad, pad])
                            x = x_p if x_p is not None else \
                                lax.conv_general_dilated(
                                    x, kern, window_strides=st,
                                    padding=[pad, pad],
                                    dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
                    else:
                        x = packed_conv(x, kern, k=k, off=off, num=num, den=den,
                                        f_in=f_in, f_out=f_out, h_out=oh, w_out=ow)
                    f = f_out
                b = jnp.tile(bias, f * f) if f > 1 else bias
                x = x + b.astype(self.dtype)
            elif pl.ltype == 'mpooling':
                if f > 1:
                    x = _unpack_to(x, f, h, w)
                    f = 1
                x = nn.max_pool(x, (pl.kernel_size, pl.kernel_size),
                                strides=(pl.stride, pl.stride),
                                padding=[(pl.padding, pl.padding)] * 2)
            elif pl.ltype == 'apooling':
                if f > 1:
                    x = _unpack_to(x, f, h, w)
                    f = 1
                x = nn.avg_pool(x, (pl.kernel_size, pl.kernel_size),
                                strides=(pl.stride, pl.stride),
                                padding=[(pl.padding, pl.padding)] * 2)
            elif pl.ltype == 'upsampler':
                if f > 1:
                    x = _unpack_to(x, f, h, w)
                    f = 1
                x = jnp.repeat(jnp.repeat(x, pl.stride, axis=1), pl.stride, axis=2)
            if pl.batch_norm:           # _packing_factor guarantees f == 1
                x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                                 name='bn_{}'.format(i))(x)
            if pl.activation is not None:
                x = ACTIVATIONS[pl.activation](x)
            h, w, c = oh, ow, oc

        if native_out:
            nf = self.native_f()
            if nf:
                if f > 1 and nf == 1:
                    x = _unpack_to(x, f, h, w)
                else:
                    assert f == nf or (f == 1 and nf == 1), (f, nf)
                return x.reshape(lead + x.shape[1:])
        if f > 1:
            x = _unpack_to(x, f, h, w)
        x = x.transpose(0, 3, 1, 2)  # NHWC->NCHW
        c, h, w = self.plans[-1].out_shape
        if self.where == 'output' and self.output_distribution == 'categorical':
            return x.reshape(lead + (256, c // 256, h, w))
        return x.reshape(lead + (c, h, w))


class _ConvParams(nn.Module):
    """Parameter holder: the (k, k, Cin, Cout) kernel + bias, in the same
    tree position/layout as the round-1 nn.Conv / _DeconvLayer params, so
    checkpoints are independent of the (packed/subpixel/matmul) lowering."""
    kshape: Tuple[int, int, int, int]

    @nn.compact
    def __call__(self):
        kern = self.param('kernel', nn.initializers.lecun_normal(),
                          self.kshape, jnp.float32)
        bias = self.param('bias', nn.initializers.zeros,
                          (self.kshape[-1],), jnp.float32)
        return kern, bias


def _flipped_1x1_kernel(kern: jax.Array, k: int, p: int, h_out: int) -> jax.Array:
    """(h_out, h_out, Cin, Cout) gather of K[A-m, A-n] (zero where invalid)."""
    A = k - 1 - p
    rows = []
    zero = jnp.zeros_like(kern[0])
    for m in range(h_out):
        cols = [kern[A - m, A - n] if 0 <= A - m < k and 0 <= A - n < k
                else zero for n in range(h_out)]
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)


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

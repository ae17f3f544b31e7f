"""Grammar-parity fuzz: our conv-DSL token parser against the reference's
own parser, executed as an oracle (module/vae_layers/conv.py:20-86).

The implementations are deliberately different (one tokenizing scan here vs
per-field regex searches there); this test pins the *behavior* to the
reference over a structured random token grid plus every named architecture
string.  Ours resolves the '*'/None defaults inside parse, the reference
partly in its build step — the comparison normalizes both to resolved form.
"""

import random
import sys
import types

import pytest

pytestmark = pytest.mark.slow

from joint_vae_tpu.models.conv import (parse_conv_layer_name,
                                       FEATURES_ARCHS, UPSAMPLER_ARCHS)


@pytest.fixture(scope='module')
def ref_parse():
    # torchvision is absent in this image; the parser under test never
    # touches it
    if 'torchvision' not in sys.modules:
        tv = types.ModuleType('torchvision')
        tv.models = types.ModuleType('torchvision.models')
        sys.modules['torchvision'] = tv
        sys.modules['torchvision.models'] = tv.models
    sys.path.insert(0, '/root/reference')
    try:
        from module.vae_layers.conv import parse_conv_layer_name as rp
    except Exception as e:                      # pragma: no cover
        pytest.skip('reference parser unavailable: {}'.format(e))
    finally:
        sys.path.remove('/root/reference')
    return rp


def _normalize_ref(p):
    """Apply the build-time default resolutions the reference defers
    (stride None -> kernel for pooling via torch's MaxPool2d default,
    conv.py:203-207)."""
    q = dict(p)
    if q['ltype'].endswith('pooling') and q['stride'] is None:
        q['stride'] = q['kernel_size']
    return q


def _normalize_ours(p):
    return dict(p)


def _token_grid():
    rng = random.Random(20260817)
    toks = []
    # systematic singles
    for c in ('32', '200', '3'):
        for k in ('', 'x3', 'x7'):
            for pad in ('', '+0', '+2', '+*'):
                for s in ('', ':1', ':2'):
                    toks.append(('input', c + k + pad + s))
    # pooling / upsampler
    for pre in ('M', 'A', 'm', 'a'):
        for k in ('', 'x2', 'x3', '2'):
            for s in ('', ':2'):
                toks.append(('input', pre + k + s))
    toks.append(('input', 'U:2'))
    toks.append(('output', 'U:2'))
    # deconv tokens
    for c in ('64', '32'):
        for k in ('', 'x8', 'x5'):
            for pad in ('', '+0', '+2'):
                for s in ('', ':2'):
                    for op in ('', '++1'):
                        toks.append(('output', c + k + pad + s + op))
    # embedded convs in output stacks
    for t in ('!3x5+2', '!128', '!x3+1', '!64x3'):
        toks.append(('output', t))
    # random compositions
    for _ in range(300):
        where = rng.choice(['input', 'output'])
        parts = [rng.choice(['3', '16', '32', '64', '200', ''])]
        if rng.random() < 0.7:
            parts.append('x' + rng.choice(['1', '3', '5', '7', '8']))
        if rng.random() < 0.6:
            parts.append('+' + rng.choice(['0', '1', '2', '3', '*']))
        if rng.random() < 0.5:
            parts.append(':' + rng.choice(['1', '2', '3']))
        if where == 'output' and rng.random() < 0.4:
            parts.append('++' + rng.choice(['0', '1']))
        tok = ''.join(parts)
        if not tok:
            continue
        if where == 'output' and rng.random() < 0.25:
            tok = '!' + tok
        elif rng.random() < 0.2:
            tok = rng.choice(['M', 'A', 'a', 'm']) + tok
        toks.append((where, tok))
    # every token of every named arch (the shipping grammar surface)
    for name, s in FEATURES_ARCHS.items():
        body = s[s.find(']') + 1:] if s.startswith('[') else s
        dflt = s[1:s.find(']')] if s.startswith('[') else ''
        for tok in filter(None, dflt.split('-') + body.split('-')):
            toks.append(('input', tok))
    for name, s in UPSAMPLER_ARCHS.items():
        body = s[s.find(']') + 1:] if s.startswith('[') else s
        dflt = s[1:s.find(']')] if s.startswith('[') else ''
        for tok in filter(None, dflt.split('-') + body.split('-')):
            toks.append(('output', tok))
    return toks


def test_token_parity(ref_parse):
    mismatches = []
    for where, tok in _token_grid():
        try:
            theirs = _normalize_ref(ref_parse(tok, where=where))
        except Exception:
            continue                 # token invalid for the reference
        ours = _normalize_ours(parse_conv_layer_name(tok, where=where))
        keys = set(theirs) & set(ours)
        assert keys >= {'ltype', 'kernel_size', 'padding', 'stride'}, tok
        diff = {k: (ours.get(k), theirs.get(k))
                for k in keys if ours.get(k) != theirs.get(k)}
        if diff:
            mismatches.append((where, tok, diff))
    assert not mismatches, mismatches[:10]


def test_default_block_parity(ref_parse):
    """Defaults-block tokens parse identically too (they feed the
    per-ltype default dicts, ref conv.py:154-163)."""
    for where, blk in [('input', 'x5+2'), ('input', 'x3-Mx2'),
                       ('output', 'x5+2'), ('output', '!x3+1-U:2'),
                       ('output', 'x3+1'), ('input', 'x3-Ax2')]:
        for tok in blk.split('-'):
            theirs = _normalize_ref(ref_parse(tok, where=where))
            ours = _normalize_ours(parse_conv_layer_name(tok, where=where))
            for k in set(theirs) & set(ours):
                assert ours[k] == theirs[k], (where, tok, k,
                                              ours[k], theirs[k])

"""ParamFilter grammar parity against the reference's own filter engine
(utils/filters.py:12-144), executed as an oracle: for a battery of
(filter string, type) pairs and probe values, both implementations must
accept/reject identically."""

import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from joint_vae_tpu.utils.filters import ParamFilter

torch = pytest.importorskip('torch')   # the reference tree assumes torch


@pytest.fixture(scope='module')
def ref_pf():
    sys.path.insert(0, '/root/reference')
    try:
        from utils.filters import ParamFilter as RefPF
    finally:
        sys.path.remove('/root/reference')
    return RefPF


CASES = [
    # (arg_str, type, probe values)
    ('100', int, [100, 99, 101]),
    ('100 200', int, [100, 150, 200, 300]),
    ('100, 200', int, [100, 150, 200]),
    ('not 100', int, [100, 99]),
    ('100...200', int, [99, 100, 150, 200, 201]),
    ('...200', int, [-5, 200, 201]),
    ('100...', int, [99, 100, 10 ** 6]),
    ('not 100...200', int, [99, 150, 201]),
    ('0.5', float, [0.5, 0.4]),
    ('0.1...0.9', float, [0.05, 0.1, 0.5, 0.9, 0.95]),
    ('cvae', str, ['cvae', 'vae', 'jvae']),
    ('cvae vae', str, ['cvae', 'vae', 'xvae']),
    ('not cvae vae', str, ['cvae', 'xvae']),
    ('true', bool, [True, False]),
    ('false', bool, [True, False]),
    ('', str, ['anything', 3]),
    (None, str, ['anything', None]),
]


def test_filter_parity(ref_pf, ):
    for arg, tp, probes in CASES:
        ref = ref_pf.from_string(arg_str=arg, type=tp)
        ours = ParamFilter.from_string(arg_str=arg, type=tp)
        for v in probes:
            want = bool(ref.filter(v))
            got = bool(ours.filter(v))
            assert got == want, (arg, tp, v, got, want)


def test_list_values_parity(ref_pf):
    """List-valued model entries: any-match, all-fail under neg
    (ref filters.py:120-125)."""
    ref = ref_pf.from_string(arg_str='a b', type=str)
    ours = ParamFilter.from_string(arg_str='a b', type=str)
    for v in (['a', 'x'], ['x', 'y'], [], ['b']):
        assert bool(ours.filter(v)) == bool(ref.filter(v)), v
    refn = ref_pf.from_string(arg_str='not a', type=str)
    oursn = ParamFilter.from_string(arg_str='not a', type=str)
    for v in (['a', 'x'], ['x', 'y'], ['a']):
        assert bool(oursn.filter(v)) == bool(refn.filter(v)), v


def test_interval_wrong_type_parity(ref_pf):
    """Un-comparable values inside an interval test return neg
    (ref filters.py:152-157)."""
    ref = ref_pf.from_string(arg_str='100...200', type=int)
    ours = ParamFilter.from_string(arg_str='100...200', type=int)
    assert bool(ours.filter(None)) == bool(ref.filter(None))
    ref2 = ref_pf.from_string(arg_str='not 100...200', type=int)
    ours2 = ParamFilter.from_string(arg_str='not 100...200', type=int)
    assert bool(ours2.filter(None)) == bool(ref2.filter(None))

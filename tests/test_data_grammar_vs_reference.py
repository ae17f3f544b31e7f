"""Dataset name-grammar parity against the reference's torch_load helpers
(utils/torch_load.py:584-682) executed as oracles: shapes/class counts
under rotation and heldout-class suffixes, same-size OOD companions, and
the heldout round-trip naming."""

import os
import sys

import pytest

pytestmark = pytest.mark.slow

from joint_vae_tpu.data.registry import (get_shape_by_name,
                                         get_same_size_by_name,
                                         get_heldout_classes_by_name,
                                         get_name_by_heldout_classes)

torch = pytest.importorskip('torch')


class _ChdirProxy:
    """The reference reads data/sets.ini relative to its repo root at call
    time — chdir around every oracle call."""

    def __init__(self, mod, root):
        self._mod, self._root = mod, root

    def __getattr__(self, name):
        fn = getattr(self._mod, name)

        def wrapped(*a, **k):
            cwd = os.getcwd()
            os.chdir(self._root)
            try:
                return fn(*a, **k)
            finally:
                os.chdir(cwd)
        return wrapped


@pytest.fixture(scope='module')
def ref_tl():
    from test_evaluate_vs_reference import _stub_torchvision
    _stub_torchvision()
    sys.path.insert(0, '/root/reference')
    cwd = os.getcwd()
    os.chdir('/root/reference')       # sets.ini paths are repo-relative
    try:
        import utils.torch_load as tl
    finally:
        os.chdir(cwd)
        sys.path.remove('/root/reference')
    return _ChdirProxy(tl, '/root/reference')


NAMES = ['mnist', 'fashion', 'cifar10', 'cifar100', 'svhn', 'letters',
         'mnist90', 'fashion90', 'cifar10-0', 'mnist-3-4', 'cifar10+0+1',
         'mnist+2+3+5', 'fashion-1-2-3', 'const32', 'uniform32', 'const28',
         'uniform28']


def test_shape_and_class_count_parity(ref_tl):
    for n in NAMES:
        want_shape, want_C = ref_tl.get_shape_by_name(n)
        got_shape, got_C = get_shape_by_name(n)[:2]
        assert tuple(got_shape) == tuple(want_shape), n
        assert got_C == want_C, n


def test_same_size_parity(ref_tl):
    for n in ('cifar10', 'mnist', 'fashion', 'svhn', 'cifar100'):
        want = set(ref_tl.get_same_size_by_name(n))
        got = set(get_same_size_by_name(n))
        assert want <= got, (n, sorted(want - got))
        # the only allowed extra is this framework's procedural benchmark
        # set (PARITY.md 'beyond the reference')
        assert got - want <= {'shapes32'}, (n, sorted(got - want))


def test_heldout_parsing_parity(ref_tl):
    for n in ('mnist-3-4', 'cifar10+0+1', 'mnist+2+3+5', 'fashion-1-2-3',
              'cifar100-10-20-30', 'mnist'):
        want_base, want_heldout = ref_tl.get_heldout_classes_by_name(n)
        got_base, got_heldout = get_heldout_classes_by_name(n)
        assert got_base == want_base, n
        assert list(got_heldout) == list(want_heldout), n


def test_heldout_naming_roundtrip_parity(ref_tl):
    for base, held in (('mnist', (3, 4)), ('cifar10', (0, 1, 2)),
                       ('fashion', (9,))):
        want = ref_tl.get_name_by_heldout_classes(base, *held)
        got = get_name_by_heldout_classes(base, *held)
        assert got == want, (base, held)

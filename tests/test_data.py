"""Data layer tests: registry grammar, heldout relabeling, transforms,
synthetic sets, seeded loaders."""

import numpy as np

from joint_vae_tpu.data.registry import (
    dataset_properties, get_shape_by_name, get_same_size_by_name,
    get_heldout_classes_by_name, get_name_by_heldout_classes,
    get_classes_by_name)
from joint_vae_tpu.data.loaders import get_dataset, get_batch, DataLoader


def test_shapes_and_labels():
    assert get_shape_by_name('mnist') == ((1, 28, 28), 10)
    assert get_shape_by_name('cifar10') == ((3, 32, 32), 10)
    assert get_shape_by_name('cifar100') == ((3, 32, 32), 100)
    assert get_shape_by_name('letters') == ((1, 28, 28), 26)
    # rotation suffix transposes H/W
    shape, labels = get_shape_by_name('mnist90')
    assert shape == (1, 28, 28) and labels == 10
    # pad transform grows shape
    assert get_shape_by_name('mnist', transform='pad')[0] == (1, 32, 32)


def test_heldout_grammar():
    assert get_heldout_classes_by_name('mnist-3-4') == ('mnist', [3, 4])
    parent, ho = get_heldout_classes_by_name('cifar10+0+1')
    assert parent == 'cifar10' and ho == list(range(2, 10))
    assert get_shape_by_name('mnist-3-4')[1] == 8
    assert get_shape_by_name('cifar10+0+1')[1] == 2
    # naming round trip picks the shorter form
    assert get_name_by_heldout_classes('mnist', 3, 4) == 'mnist-3-4'
    assert get_name_by_heldout_classes('mnist', *range(2, 10)) == 'mnist+0+1'
    # heldout companion = the complement set
    assert get_same_size_by_name('mnist-3-4') == ['mnist+3+4']


def test_same_size_companions():
    same = get_same_size_by_name('cifar10')
    assert 'svhn' in same and 'cifar100' in same and 'cifar1090' in same
    assert 'cifar10' not in same
    assert 'const32' in same and 'uniform32' in same
    same_m = get_same_size_by_name('mnist')
    assert 'fashion' in same_m and 'letters' in same_m and 'mnist90' in same_m


def test_classes():
    assert get_classes_by_name('mnist') == [str(i) for i in range(10)]
    assert get_classes_by_name('mnist-3-4') == ['0', '1', '2', '5', '6',
                                                '7', '8', '9']
    assert len(get_classes_by_name('cifar100')) == 100


def test_synthetic_sets():
    const, _ = get_dataset('const32', splits=['train'], size=64)
    assert const.shape == (3, 32, 32)
    # constant per image
    assert np.allclose(const.data.std(axis=(2, 3)), 0, atol=1e-6)
    _, uni = get_dataset('uniform28', splits=['test'], size=64)
    assert uni.shape == (1, 28, 28)
    assert uni.data.std() > 0.2


def test_fallback_dataset_determinism_and_structure():
    tr1, te = get_dataset('mnist', size=256)
    tr2, _ = get_dataset('mnist', splits=['train'], size=256)
    assert tr1.synthetic  # no real files in this sandbox
    np.testing.assert_array_equal(tr1.data, tr2.data)
    assert tr1.shape == (1, 28, 28)
    assert tr1.targets.min() >= 0 and tr1.targets.max() <= 9
    assert te.name == 'mnist'
    assert 0 <= tr1.data.min() and tr1.data.max() <= 1


def test_heldout_filtering_and_relabeling():
    full, _ = get_dataset('mnist', splits=['train'], size=512)
    ho, _ = get_dataset('mnist-3-4', splits=['train'], size=512)
    assert set(np.unique(ho.targets)) <= set(range(8))
    assert len(ho) < len(full)
    comp, _ = get_dataset('mnist+3+4', splits=['train'], size=512)
    assert set(np.unique(comp.targets)) <= {0, 1}


def test_rotated_view():
    tr, _ = get_dataset('mnist', splits=['train'], size=64)
    tr90, _ = get_dataset('mnist90', splits=['train'], size=64)
    np.testing.assert_array_equal(np.transpose(tr.data, (0, 1, 3, 2)),
                                  tr90.data)


def test_transforms_g2c_pad():
    p, _ = get_dataset('mnist32p', splits=['train'], size=32)
    assert p.shape == (3, 32, 32)
    r, _ = get_dataset('mnist32r', splits=['train'], size=32)
    assert r.shape == (3, 32, 32)


def test_loader_determinism_and_augmentation():
    tr, _ = get_dataset('cifar10', splits=['train'], size=128)
    dl1 = DataLoader(tr, 32, seed=5)
    dl2 = DataLoader(tr, 32, seed=5)
    b1 = [x for x, _ in dl1]
    b2 = [x for x, _ in dl2]
    for a, b in zip(b1, b2):
        np.testing.assert_array_equal(a, b)
    # second epoch differs
    b3 = [x for x, _ in dl2]
    assert not np.array_equal(b1[0], b3[0])
    # augmentation keeps shapes
    dla = DataLoader(tr, 32, seed=5, data_augmentation=['flip', 'crop'])
    xb, yb = next(iter(dla))
    assert xb.shape == (32, 3, 32, 32)
    # crop pads with edge values (ref RandomCrop padding_mode='edge',
    # torch_load.py:409-412): constant-1 inputs stay constant-1 after any
    # crop offset (zero padding would leak 0 rows in)
    ones = np.ones((8, 3, 32, 32), np.float32)
    out = dla._augment(ones, np.random.default_rng(0))
    np.testing.assert_array_equal(out, ones)

    x, y = get_batch(tr, 16, seed=3)
    x2, _ = get_batch(tr, 16, seed=3)
    np.testing.assert_array_equal(x, x2)


def test_registry_ini_override(tmp_path):
    """User INI extends the registry (ref sets.ini schema)."""
    from joint_vae_tpu.data.registry import load_registry_ini, dataset_properties
    ini = tmp_path / 'sets.ini'
    cf = tmp_path / 'classes.txt'
    cf.write_text('n01 spotted_cat\nn02 big_dog\n# comment\n')
    ini.write_text(
        '[custom64]\nshape = 3 64 64\nclasses = cat dog bird\n'
        'pre_transform = resize tensor\n\n'
        '[customfile]\nshape = 1 8 8\nclasses_from_file = {}\n\n'
        '[customnoise]\nshape = 3 16 16\nby_shape = true\n'.format(cf))
    reg = load_registry_ini(str(ini))
    assert reg['custom64']['shape'] == (3, 64, 64)
    assert reg['custom64']['classes'] == ['cat', 'dog', 'bird']
    assert reg['custom64']['pre_transform'] == 'resize tensor'
    assert reg['customfile']['classes'] == ['spotted cat', 'big dog']
    assert reg['customnoise']['by_shape'] is True

    # merged into the global registry
    merged = dataset_properties(conf_file=str(ini), reload=True)
    assert 'custom64' in merged and 'mnist' in merged
    assert merged['custom64']['labels'] == 3
    # restore the default registry for other tests
    dataset_properties(reload=True)

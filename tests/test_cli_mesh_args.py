"""The shared --mesh/--model-axis/--sample-axis/--distributed CLI flags
(cli.add_mesh_args / mesh_from_args) used by cli.train and cli.ft."""

import argparse

import pytest

from joint_vae_tpu.cli import add_mesh_args, mesh_from_args


def _parse(argv):
    p = argparse.ArgumentParser()
    add_mesh_args(p)
    return p.parse_args(argv)


def test_no_flags_means_no_mesh():
    assert mesh_from_args(_parse([])) is None


def test_mesh_all_devices():
    import jax
    m = mesh_from_args(_parse(['--mesh']))
    assert m is not None and m.size == jax.device_count()
    assert m.shape['model'] == 1


def test_mesh_n_with_model_axis():
    m = mesh_from_args(_parse(['--mesh', '4', '--model-axis', '2']))
    assert dict(m.shape) == {'data': 2, 'model': 2}


def test_sample_axis():
    m = mesh_from_args(_parse(['--mesh', '8', '--model-axis', '2',
                               '--sample-axis', '2']))
    assert dict(m.shape) == {'data': 2, 'model': 2, 'sample': 2}


def test_axes_without_mesh_rejected():
    with pytest.raises(SystemExit):
        mesh_from_args(_parse(['--model-axis', '2']))


def test_train_cli_parser_accepts_mesh_flags():
    from joint_vae_tpu.utils.parameters import get_args
    args = get_args(['--dataset', 'cifar10', '--mesh', '4',
                     '--model-axis', '2'], 'train')
    assert args.mesh == '4' and args.model_axis == 2


def test_distributed_alone_implies_a_mesh():
    """--distributed on a launch that resolves to one process (single-host
    rehearsal) must still build the mesh, like the pod run would."""
    import jax
    m = mesh_from_args(_parse(['--distributed']))
    assert m is not None and m.size == jax.device_count()
    m2 = mesh_from_args(_parse(['--distributed', '--model-axis', '2']))
    assert m2.shape['model'] == 2

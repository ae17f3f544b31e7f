"""Partitioning-quality audit of the GSPMD programs on a {'data':4,'model':2}
mesh (SURVEY section 7 stage 6; round-2 verdict item 7).

The mesh dryruns prove the sharded programs run and produce finite numbers;
this test inspects the *compiled HLO* and asserts the partitioning is the one
the design intends (parallel/mesh.py module docstring):

- train step: the gradient sum rides ONE combined all-reduce over the 'data'
  axis (XLA's all-reduce combiner bundles every parameter gradient into a
  single collective — one ICI latency per step, not one per tensor);
- no decode/encode activation is ever all-gathered over 'model' — the only
  all-gathers allowed are scalar/metric-sized (the train-accuracy argmax
  gather); a batch-sized gather would mean GSPMD fell back to replicating
  the per-class work the 'model' axis is supposed to split;
- eval program: per-item scoring needs NO collective over 'data' at all
  (items are independent); everything that crosses devices is a small
  'model'-axis reduction from the class-sharded prior/classifier head.

Reference scale-out equivalent: the reference is single-device torch
(train loop cvae.py:2424-2479); this audit guards the part it never had.
"""

import re

import numpy as np
import pytest

import jax
from jax.sharding import PartitionSpec as P

from joint_vae_tpu.models.cvnet import CVNetConfig
from joint_vae_tpu.ops.priors import PriorConfig
from joint_vae_tpu.ops.sigma import SigmaConfig
from joint_vae_tpu.parallel.mesh import (make_mesh, state_shardings,
                                         batch_sharding)
from joint_vae_tpu.save_load.jobs import new_job
from joint_vae_tpu.train.optimizers import OptimizerConfig, build_optimizer
from joint_vae_tpu.train.steps import make_train_step

INPUT_SHAPE = (1, 6, 6)
C = 4
N = 32                               # global batch; 8 per 'data' shard
DATA, MODEL = 4, 2

# smallest per-shard batch-sized activation: (N/DATA) * prod(input_shape);
# any all-gather at or above this is moving activations, not metrics
ACT_ELEMS = (N // DATA) * int(np.prod(INPUT_SHAPE))

_DTYPE_BYTES = {'f64': 8, 'f32': 4, 's32': 4, 'u32': 4, 'f16': 2, 'bf16': 2,
                's16': 2, 'u16': 2, 'pred': 1, 's8': 1, 'u8': 1}


def _parse_groups(line, n_devices=8):
    """Replica groups of a collective HLO line as a frozenset of frozensets.

    Handles both the explicit form ``replica_groups={{0,2},{1,3}}`` and the
    iota (v2) form ``replica_groups=[4,2]<=[8]`` /
    ``[2,4]<=[4,2]T(1,0)`` (arange over the <=[...] shape, optionally
    transposed, reshaped to [groups, group_size])."""
    m = re.search(r'replica_groups=\{(\{[^}]*\}(?:,\{[^}]*\})*)\}', line)
    if m:
        return frozenset(
            frozenset(int(x) for x in g.split(',') if x)
            for g in re.findall(r'\{([^{}]*)\}', m.group(1)))
    m = re.search(r'replica_groups=\[(\d+),(\d+)\]<=\[([\d,]+)\]'
                  r'(?:T\(([\d,]+)\))?', line)
    assert m, f'unrecognized replica_groups in: {line[:200]}'
    ng, gs = int(m.group(1)), int(m.group(2))
    src_shape = tuple(int(x) for x in m.group(3).split(','))
    v = np.arange(int(np.prod(src_shape))).reshape(src_shape)
    if m.group(4):
        v = v.transpose(tuple(int(x) for x in m.group(4).split(',')))
    v = v.reshape(ng, gs)
    return frozenset(frozenset(int(x) for x in row) for row in v)


def _collective_lines(hlo, kind):
    pat = re.compile(r'%' + kind + r'(?:\.\d+)?\s*=')
    return [l for l in hlo.splitlines()
            if pat.search(l) and 'replica_groups' in l]


def _out_elem_counts(line, kind):
    """Element count of each tensor produced by the collective op."""
    m = re.match(r'\s*%[\w.\-]+\s*=\s*(.*?)\s+' + kind + r'(?:\.\d+)?\(',
                 line)
    assert m, f'cannot parse collective output shapes: {line[:200]}'
    lhs = m.group(1)
    counts = []
    for dt, dims in re.findall(r'(\w+)\[([\d,]*)\]', lhs):
        if dt in _DTYPE_BYTES:
            counts.append(int(np.prod([int(d) for d in dims.split(',') if d],
                                      dtype=np.int64)) if dims else 1)
    return counts


def _setup():
    cfg = CVNetConfig(input_shape=INPUT_SHAPE, num_labels=C, type='cvae',
                      encoder=(16,), decoder=(16,), classifier=(8,),
                      latent_dim=8, latent_sampling=2, gamma=10.0, beta=1e-2,
                      sigma=SigmaConfig(value=0.3),
                      prior=PriorConfig(dim=8, num_priors=C, init_mean=1.0,
                                        learned_means=True))
    job = new_job(cfg, OptimizerConfig(lr=3e-3), key=jax.random.PRNGKey(0))
    mesh = make_mesh(DATA * MODEL, model_axis=MODEL)
    state = jax.device_put(job.state, state_shardings(mesh, job.state))
    x = jax.device_put(np.zeros((N, *INPUT_SHAPE), np.float32),
                       batch_sharding(mesh, 1 + len(INPUT_SHAPE)))
    y = jax.device_put(np.zeros((N,), np.int32), batch_sharding(mesh, 1))
    # axis -> set-of-groups, derived from the mesh itself so the audit stays
    # correct if the device order ever changes
    dev_ids = np.vectorize(lambda d: d.id)(mesh.devices)     # (DATA, MODEL)
    data_groups = frozenset(frozenset(int(i) for i in col)
                            for col in dev_ids.T)            # vary 'data'
    model_groups = frozenset(frozenset(int(i) for i in row)
                             for row in dev_ids)             # vary 'model'
    return job, mesh, state, x, y, data_groups, model_groups


@pytest.fixture(scope='module')
def compiled():
    job, mesh, state, x, y, data_groups, model_groups = _setup()
    tx = build_optimizer(job.opt_cfg)
    step = make_train_step(job.model, tx, donate=False)
    train_hlo = step.lower(state, x, y).compile().as_text()

    from joint_vae_tpu.evals.engines import _make_eval_fn
    eval_batch, _, _ = _make_eval_fn(job.model, state.sigma_state, False,
                                     methods=('kl', 'max', 'iws'), mesh=mesh)
    eval_hlo = eval_batch.lower({'params': state.params}, x,
                                jax.random.PRNGKey(1)).compile().as_text()
    return train_hlo, eval_hlo, data_groups, model_groups


def test_prior_is_model_sharded():
    _, _, state, *_ = _setup()
    assert state.params['prior']['mean'].sharding.spec == P('model')


def test_train_gradients_all_reduce_once_over_data(compiled):
    train_hlo, _, data_groups, model_groups = compiled
    ars = _collective_lines(train_hlo, 'all-reduce')
    data_ars = [l for l in ars if _parse_groups(l) == data_groups]
    full = frozenset({frozenset(g for gr in data_groups for g in gr)})
    full_ars = [l for l in ars if _parse_groups(l) == full]
    # the combiner must bundle every gradient into ONE data-axis all-reduce
    # (and none should degrade to an 8-device reduce, which would re-sum
    # the already-consistent model-axis contributions)
    assert len(data_ars) == 1, (
        f'{len(data_ars)} data-axis all-reduces (want 1 combined): '
        + '\n'.join(l[:160] for l in data_ars))
    assert not full_ars
    # ...and that one op really is the gradient bundle: it carries many
    # parameter-shaped tensors (conv/dense kernels + biases), not a scalar
    n_out = len(_out_elem_counts(data_ars[0], 'all-reduce'))
    assert n_out >= 10, f'gradient all-reduce carries only {n_out} tensors'


def test_train_no_activation_all_gather(compiled):
    train_hlo, _, _, _ = compiled
    for l in _collective_lines(train_hlo, 'all-gather'):
        for n in _out_elem_counts(l, 'all-gather'):
            assert n < ACT_ELEMS, (
                f'activation-sized all-gather ({n} elems): {l[:200]}')


def test_eval_needs_no_data_axis_collectives(compiled):
    _, eval_hlo, data_groups, model_groups = compiled
    full = frozenset({frozenset(g for gr in data_groups for g in gr)})
    for kind in ('all-reduce', 'all-gather', 'all-to-all',
                 'collective-permute', 'reduce-scatter'):
        for l in _collective_lines(eval_hlo, kind):
            g = _parse_groups(l)
            assert g == model_groups, (
                f'eval {kind} crosses the data axis '
                f'(per-item scoring should not): {l[:200]}')
            if kind == 'all-gather':
                for n in _out_elem_counts(l, kind):
                    assert n < ACT_ELEMS, f'eval activation gather: {l[:200]}'

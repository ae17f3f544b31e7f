"""Multi-chip sharding tests on the virtual 8-device CPU mesh: pure DP and
the 2D (data x model) mesh sharding the class dictionary."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from joint_vae_tpu.models.cvnet import CVNetConfig
from joint_vae_tpu.ops.priors import PriorConfig
from joint_vae_tpu.ops.sigma import SigmaConfig
from joint_vae_tpu.parallel.mesh import (make_mesh, batch_sharding,
                                         state_shardings, replicated)
from joint_vae_tpu.save_load.jobs import new_job
from joint_vae_tpu.train.optimizers import OptimizerConfig, build_optimizer
from joint_vae_tpu.train.steps import make_train_step

INPUT_SHAPE = (1, 6, 6)
C = 4


def _setup(model_axis=1):
    cfg = CVNetConfig(input_shape=INPUT_SHAPE, num_labels=C, type='cvae',
                      encoder=(16,), decoder=(16,), classifier=(8,),
                      latent_dim=8, latent_sampling=1, gamma=10.0, beta=1e-2,
                      sigma=SigmaConfig(value=0.3),
                      prior=PriorConfig(dim=8, num_priors=C, init_mean=1.0,
                                        learned_means=True))
    job = new_job(cfg, OptimizerConfig(lr=1e-3), key=jax.random.PRNGKey(0))
    tx = build_optimizer(job.opt_cfg)
    step = make_train_step(job.model, tx, donate=False)
    return job, step


def _batch(n=32):
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (n, *INPUT_SHAPE)).astype(np.float32)
    y = rng.integers(0, C, n).astype(np.int32)
    return jnp.asarray(x), jnp.asarray(y)


def test_mesh_shapes():
    assert len(jax.devices()) == 8, 'conftest must force 8 cpu devices'
    mesh = make_mesh(8, model_axis=2)
    assert mesh.shape == {'data': 4, 'model': 2}
    mesh_dp = make_mesh(8, model_axis=1)
    assert mesh_dp.shape == {'data': 8, 'model': 1}


def test_dp_matches_single_device():
    job, step = _setup()
    x, y = _batch(32)
    state1, m1 = step(job.state, x, y)

    mesh = make_mesh(8, model_axis=1)
    st_sh = state_shardings(mesh, job.state)
    state_sharded = jax.device_put(job.state, st_sh)
    xb = jax.device_put(x, batch_sharding(mesh, x.ndim))
    yb = jax.device_put(y, batch_sharding(mesh, y.ndim))
    state8, m8 = step(state_sharded, xb, yb)
    np.testing.assert_allclose(float(m1['total']), float(m8['total']),
                               rtol=1e-5)
    # params identical after one update
    p1 = jax.tree_util.tree_leaves(state1.params)[0]
    p8 = jax.tree_util.tree_leaves(state8.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p8), rtol=1e-5,
                               atol=1e-7)


def test_2d_mesh_shards_prior():
    job, step = _setup(model_axis=2)
    mesh = make_mesh(8, model_axis=2)
    st_sh = state_shardings(mesh, job.state)
    # prior mean (C=4, K) must be sharded over 'model'
    mean_sh = st_sh.params['prior']['mean']
    assert mean_sh.spec == P('model')
    state_sharded = jax.device_put(job.state, st_sh)
    x, y = _batch(32)
    xb = jax.device_put(x, batch_sharding(mesh, x.ndim))
    yb = jax.device_put(y, batch_sharding(mesh, y.ndim))
    state2, m2 = step(state_sharded, xb, yb)
    assert np.isfinite(float(m2['total']))
    # reference value from unsharded run
    _, m1 = step(job.state, x, y)
    np.testing.assert_allclose(float(m1['total']), float(m2['total']),
                               rtol=1e-5)


def test_eval_engine_under_dp_mesh():
    from joint_vae_tpu.models.evaluate import evaluate
    job, _ = _setup()
    mesh = make_mesh(8, model_axis=1)
    variables = jax.device_put(job.state.variables, replicated(mesh))
    x, _ = _batch(32)
    xb = jax.device_put(x, batch_sharding(mesh, x.ndim))
    model = job.model

    @jax.jit
    def f(variables, x):
        out = evaluate(model, variables, x, None, rng=jax.random.PRNGKey(0),
                       sigma_state=job.state.sigma_state, train=False)
        return out.losses['iws']
    v = f(variables, xb)
    assert v.shape == (C, 32)
    assert np.isfinite(np.asarray(v)).all()


def test_sample_axis_mesh_eval_matches_unsharded():
    """A ('data','model','sample') mesh shards the eval sample axis; OOD
    scores and AUC match the unsharded engine bit-for-bit."""
    from joint_vae_tpu.data.loaders import ArrayDataset
    from joint_vae_tpu.evals.engines import ood_detection_rates

    job, _ = _setup()
    rng = np.random.default_rng(3)

    def synth(name, seed, n=32):
        r = np.random.default_rng(seed)
        return ArrayDataset(
            r.uniform(0, 1, (n, *INPUT_SHAPE)).astype(np.float32),
            r.integers(0, C, n).astype(np.int32), name, synthetic=True)

    mesh = make_mesh(8, model_axis=2, sample_axis=2)
    assert mesh.shape == {'data': 2, 'model': 2, 'sample': 2}
    kw = dict(testset=synth('t', 1), oodsets=[synth('o', 2)], batch_size=8,
              method=['elbo', 'iws'], recording=False, update_self_ood=False,
              from_where=('compute',))
    sharded = ood_detection_rates(job, mesh=mesh, **kw)
    plain = ood_detection_rates(job, **kw)
    for m in ('elbo', 'iws'):
        assert sharded['o'][m]['auc'] == plain['o'][m]['auc']
        np.testing.assert_allclose(sharded['o'][m]['mean'],
                                   plain['o'][m]['mean'], rtol=1e-6)


def test_mesh_eval_with_uneven_tail_batch():
    """drop_last=False eval loaders end on tail batches whose size need not
    divide the mesh 'data' axis; those go in fully replicated
    (parallel/mesh.py::eval_batch_putters) and the scores/AUC still match
    the meshless engine."""
    from joint_vae_tpu.data.loaders import ArrayDataset
    from joint_vae_tpu.evals.engines import accuracy, ood_detection_rates

    job, _ = _setup()

    def synth(name, seed, n):
        r = np.random.default_rng(seed)
        return ArrayDataset(
            r.uniform(0, 1, (n, *INPUT_SHAPE)).astype(np.float32),
            r.integers(0, C, n).astype(np.int32), name, synthetic=True)

    mesh = make_mesh(8, model_axis=2)        # data axis 4
    # n=30, batch 8 -> tail of 6; 6 % 4 != 0 (and 30 % 4 != 0)
    kw = dict(testset=synth('t', 1, n=30), oodsets=[synth('o', 2, n=30)],
              batch_size=8, method=['elbo', 'iws'], recording=False,
              update_self_ood=False, from_where=('compute',))
    sharded = ood_detection_rates(job, mesh=mesh, **kw)
    plain = ood_detection_rates(job, **kw)
    for m in ('elbo', 'iws'):
        assert sharded['o'][m]['n'] == 30
        assert sharded['o'][m]['auc'] == plain['o'][m]['auc']
        np.testing.assert_allclose(sharded['o'][m]['mean'],
                                   plain['o'][m]['mean'], rtol=1e-6)
    akw = dict(testset=synth('t', 1, n=30), batch_size=8, recording=False,
               update_self_testing=False, from_where=('compute',))
    a_mesh = accuracy(job, mesh=mesh, **akw)
    a_plain = accuracy(job, **akw)
    assert a_mesh == a_plain


def test_sample_axis_mesh_at_L128():
    """The reference's standard eval operating point is L=128 test samples
    (ref config.ini:28; grids to 256, grid.ini:22-24): a 4-way ('sample',)
    shard of L=128 must produce the same OOD AUC as the unsharded engine."""
    import dataclasses

    from joint_vae_tpu.data.loaders import ArrayDataset
    from joint_vae_tpu.evals.engines import ood_detection_rates

    job, _ = _setup()
    cfg = dataclasses.replace(job.model_cfg, test_latent_sampling=128)
    job = new_job(cfg, OptimizerConfig(lr=1e-3), key=jax.random.PRNGKey(0))

    def synth(name, seed, n=16):
        r = np.random.default_rng(seed)
        return ArrayDataset(
            r.uniform(0, 1, (n, *INPUT_SHAPE)).astype(np.float32),
            r.integers(0, C, n).astype(np.int32), name, synthetic=True)

    mesh = make_mesh(8, model_axis=1, sample_axis=4)
    assert mesh.shape == {'data': 2, 'model': 1, 'sample': 4}
    kw = dict(testset=synth('t', 1), oodsets=[synth('o', 2)], batch_size=8,
              method=['elbo', 'iws'], recording=False, update_self_ood=False,
              from_where=('compute',))
    sharded = ood_detection_rates(job, mesh=mesh, **kw)
    plain = ood_detection_rates(job, **kw)
    for m in ('elbo', 'iws'):
        assert sharded['o'][m]['auc'] == plain['o'][m]['auc']
        np.testing.assert_allclose(sharded['o'][m]['mean'],
                                   plain['o'][m]['mean'], rtol=1e-6)


def test_replicated_fallback_warns_once_and_not_on_tails(caplog):
    """A full-size batch that cannot shard warns exactly once (shared flag
    across the x/y putters); a tail after full batches stays silent."""
    import logging as _logging
    from joint_vae_tpu.parallel.mesh import eval_batch_putters, make_mesh
    mesh = make_mesh(4)

    # non-divisible full batches: one warning total
    flag = {}
    put_x, put_y = eval_batch_putters(mesh, 2, warn_flag=flag)
    with caplog.at_level(_logging.WARNING):
        for _ in range(3):
            put_x(np.ones((6, 3)))
            put_y(np.ones((6,)))
    warnings = [r for r in caplog.records
                if 'fully replicated' in r.getMessage()]
    assert len(warnings) == 1

    # divisible batches then a tail: no warning at all
    caplog.clear()
    put_x, put_y = eval_batch_putters(mesh, 2)
    with caplog.at_level(_logging.WARNING):
        put_x(np.ones((8, 3)))
        put_x(np.ones((3, 3)))          # tail
    assert not [r for r in caplog.records
                if 'fully replicated' in r.getMessage()]

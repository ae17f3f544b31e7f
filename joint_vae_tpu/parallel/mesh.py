"""Mesh construction and sharding rules.

Design (SURVEY.md section 7, stage 6): a 2D mesh ('data', 'model'):

- inputs: batch axis sharded over 'data' (pure DP — the reference's whole
  execution model was single-device, so DP is its scale-out equivalent);
- the class-conditional prior dictionary (C, K), per-class variance
  parameters and the classifier head are sharded over 'model' — the class
  axis C is the natural tensor-parallel dim of this model family (per-class
  evaluation broadcasts over it);
- everything else is replicated; XLA/GSPMD inserts all-reduces for gradient
  sums over 'data' and all-gathers where the class axis is consumed.

Multi-host: ``distributed_init`` wraps jax.distributed.initialize; the same
mesh then spans all processes' devices (DCN between slices).
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ('data', 'model'),
              model_axis: int = 1,
              sample_axis: int = 1,
              devices=None) -> Mesh:
    """Mesh over the first n devices: ('data', 'model') with the model axis
    sized ``model_axis`` (1 = pure DP).  ``sample_axis > 1`` adds a third
    'sample' axis for sharding the L latent-sample dim during large-L
    evaluation (SURVEY section 7 stage 6; the reference tests at L up to
    128-256, config.ini:28,96 — at that width the (L, N) eval grid is the
    dominant axis and deserves its own mesh dim)."""
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    devices = devices[:n]
    assert n % (model_axis * sample_axis) == 0, (n, model_axis, sample_axis)
    if sample_axis > 1:
        arr = np.array(devices).reshape(
            n // (model_axis * sample_axis), model_axis, sample_axis)
        return Mesh(arr, axis_names=tuple(axis_names) + ('sample',))
    arr = np.array(devices).reshape(n // model_axis, model_axis)
    return Mesh(arr, axis_names=tuple(axis_names))


def sample_constraint(mesh: Mesh):
    """with_sharding_constraint callable for eval tensors carrying the
    latent-sample axis first and the batch axis second-to-last:
    z (L+1, [C,] N, K) -> P('sample', ..., 'data', None).  Returns None when
    the mesh has no 'sample' axis (nothing to constrain — GSPMD already
    propagates the batch sharding)."""
    if 'sample' not in mesh.axis_names or mesh.shape['sample'] == 1:
        return None

    def constrain(z):
        spec = ['sample'] + [None] * (z.ndim - 3) + ['data', None]
        return jax.lax.with_sharding_constraint(
            z, NamedSharding(mesh, P(*spec)))

    return constrain


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P('data', *([None] * (ndim - 1))))


def _prior_spec(path_names, leaf, mesh) -> NamedSharding:
    """Sharding rule per parameter leaf (see module docstring)."""
    if 'prior' in path_names and getattr(leaf, 'ndim', 0) >= 1:
        if leaf.shape[0] > 1 and leaf.shape[0] % mesh.shape['model'] == 0:
            return NamedSharding(mesh, P('model'))
    if ('classifier' in path_names and 'head' in path_names):
        if path_names[-1] == 'kernel' and leaf.shape[-1] % mesh.shape['model'] == 0:
            return NamedSharding(mesh, P(None, 'model'))
        if path_names[-1] == 'bias' and leaf.shape[0] % mesh.shape['model'] == 0:
            return NamedSharding(mesh, P('model'))
    return NamedSharding(mesh, P())


def state_shardings(mesh: Mesh, state):
    """Pytree of NamedShardings for a TrainState (params via the rules
    above, everything else replicated)."""
    def name_of(p):
        return getattr(p, 'key', getattr(p, 'name', str(p)))

    def spec(path, leaf):
        names = [name_of(p) for p in path]
        if 'params' in names or 'opt_state' in names or 'mu' in names:
            return _prior_spec(names, leaf, mesh)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, state)


def ensure_placed(tree, mesh: Mesh):
    """Place a state pytree on the mesh with the framework's sharding rules
    — unless some leaf already lives on this mesh (re-placement of a
    cross-process global would crash on the host copy)."""
    for leaf in jax.tree_util.tree_leaves(tree):
        if (isinstance(leaf, jax.Array)
                and isinstance(leaf.sharding, NamedSharding)
                and leaf.sharding.mesh == mesh):
            return tree
    return put_tree(tree, state_shardings(mesh, tree))


def put_tree(tree, shardings):
    """device_put a host-replicated pytree onto (possibly cross-process)
    shardings.

    Single-process: plain jax.device_put.  Multi-process: device_put's
    replicated-host path runs a per-leaf cross-process assert_equal
    collective, which is both a collective per leaf and WRONG for NaN
    initializers (NaN != NaN trips it) — use make_array_from_callback
    instead: each process slices its own addressable shards from its host
    copy, no verification collective (the caller guarantees replication;
    every process built the same state from the same seed/checkpoint)."""
    if jax.process_count() == 1:
        return jax.device_put(tree, shardings)
    return jax.tree_util.tree_map(
        lambda leaf, sh: None if leaf is None else put_global(leaf, sh),
        tree, shardings, is_leaf=lambda x: x is None)


def put_global(a, sharding) -> jax.Array:
    """One host array (a full global copy on every process) -> a sharded
    jax.Array.  Single-process: plain device_put.  Multi-process: each
    process slices its addressable shards out of its host copy
    (make_array_from_callback — no cross-process verification collective;
    the caller guarantees every process holds the same bytes, e.g. the
    aligned full-dataset loaders)."""
    host = np.asarray(a)
    if jax.process_count() == 1:
        return jax.device_put(host, sharding)
    return jax.make_array_from_callback(host.shape, sharding,
                                        lambda idx: host[idx])


def warn_replicated_fallback(flag: dict, batch: int, nd: int):
    """One-shot warning for the silent perf cliff of a batch size that
    does not divide the mesh 'data' axis (every batch then runs fully
    replicated).  ``flag`` is the caller's warn-state dict; shared across
    putters so one eval warns at most once."""
    if not flag.get('warned'):
        flag['warned'] = True
        import logging
        logging.warning(
            'eval batch size %d does not divide the mesh data axis '
            '(%d): batches run fully replicated (exact but each '
            'device computes the whole batch) — pick a batch size '
            "divisible by mesh.shape['data']", batch, nd)


def eval_batch_putters(mesh: Mesh, ndim: int, warn_flag: Optional[dict] = None):
    """(put_x, put_y) for feeding eval batches over the 'data' axis.

    Array construction (device_put / make_array_from_callback) rejects
    leading dims that do not divide the axis size — and drop_last=False
    eval loaders routinely end on such a tail batch.  Tail batches go in
    FULLY REPLICATED instead: results are exact (no padding, no masking),
    at the cost of every device computing the whole tail once and one
    extra trace of the eval program for the replicated layout.

    If the FIRST batch already takes the fallback (loaders yield full
    batches first, so every batch will), a one-time warning flags the
    silent perf cliff — pick a batch size divisible by the data axis.
    ``warn_flag``: share the warn-once state with other putters of the
    same eval."""
    sh_x = NamedSharding(mesh, P('data', *[None] * (ndim - 1)))
    sh_y = NamedSharding(mesh, P('data'))
    rep = NamedSharding(mesh, P())
    nd = mesh.shape['data']
    flag = warn_flag if warn_flag is not None else {}

    def putter(sh, is_x):
        def put(a):
            host = np.asarray(a)
            if host.shape[0] % nd == 0:
                flag.setdefault('full_seen', True)
                return put_global(host, sh)
            # only a FULL-size first batch signals the every-batch cliff;
            # a tail after full batches is the expected exact fallback
            if is_x and not flag.get('full_seen'):
                warn_replicated_fallback(flag, host.shape[0], nd)
            return put_global(host, rep)
        return put

    return putter(sh_x, True), putter(sh_y, False)


def host_get(tree):
    """device->host pull that also works for cross-process global arrays
    (plain ``jax.device_get`` raises on arrays with non-addressable
    shards).  Fully-replicated globals read their local copy; sharded
    globals are gathered with a collective — so every process must call
    this on the same tree, SPMD-style.  When nothing in the tree crosses
    a process boundary this delegates to ``jax.device_get``, which
    prefetches every leaf with copy_to_host_async before pulling (one
    overlapped transfer instead of a blocking round-trip per leaf —
    the difference dominates on the tunneled TPU)."""
    leaves = jax.tree_util.tree_leaves(tree)
    if not any(isinstance(x, jax.Array) and not x.is_fully_addressable
               for x in leaves):
        return jax.device_get(tree)

    def pull(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            if x.is_fully_replicated:
                return np.asarray(x)
            from jax.experimental import multihost_utils
            return np.asarray(multihost_utils.process_allgather(
                x, tiled=True))
        return np.asarray(x) if isinstance(x, jax.Array) else x
    return jax.tree_util.tree_map(pull, tree)


def distributed_init(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Multi-host init (jax.distributed).

    Explicit ``num_processes > 1`` uses the given rendezvous.  With
    ``num_processes=None`` a distributed context is auto-detected (an
    explicit/env coordinator address, SLURM, or TPU-pod worker metadata)
    and handed to jax's own auto-initialization — silently skipping
    initialize() there would leave each pod host training as a disjoint
    single-host replica.  No context detected = single-process no-op."""
    import logging
    import os
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    elif num_processes is None and (
            coordinator_address
            or os.environ.get('JAX_COORDINATOR_ADDRESS')
            or os.environ.get('SLURM_NTASKS', '1') not in ('', '0', '1')
            or os.environ.get('TPU_WORKER_HOSTNAMES', '').count(',') > 0):
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address)
        except Exception as e:           # already-initialized / no backend
            logging.warning('jax.distributed auto-init failed: %s', e)
    return jax.process_count(), jax.process_index()

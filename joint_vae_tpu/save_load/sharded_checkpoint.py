"""Sharded + async checkpointing for pod scale.

The npz checkpoint (checkpoint.py) gathers every leaf to host 0 — O(model
x fleet) host RAM and a collective per sharded leaf, and the step blocks on
the file write.  Neither survives pod scale, so this module adds the two
standard remedies (SURVEY.md section 7 stage 6; the reference never needed
either, its execution model was single-device, ref cvae.py:2650-2675):

- **per-process shard files**: each process writes only the array chunks it
  owns to ``shard-<process>.npz`` (no collectives, no host-0 bottleneck);
  host 0 writes a ``manifest.json`` with every leaf's global shape/dtype and
  the process count.  Chunk keys are ``<tree path>@<offset0>,<offset1>,...``
  so restore can stitch chunks back regardless of the mesh that produced
  them — restoring onto a *different* mesh shape needs no special casing
  (the loader returns plain global numpy arrays; placement is the caller's
  usual device_put with the new shardings).
- **async writes** (``AsyncCheckpointer``): the device->host pulls and file
  IO run on a worker thread, overlapped with the next epoch.  Training
  steps donate their state buffers, so the submit path first snapshots the
  leaves with an on-device copy (cheap HBM->HBM, async-dispatched) — the
  worker then reads immutable copies that the next step cannot invalidate.

Exactly-one-writer rule: a chunk is written by the process that holds its
``replica_id == 0`` copy, which is unique per chunk across the whole fleet
for every jax.Array regardless of how it is replicated/sharded.  Leaves
that are not jax.Arrays (counters, host numpy) are written by process 0.
"""

import json
import os
import tempfile
import threading
from typing import Any, Callable, Dict, Optional

import jax
import numpy as np

from .checkpoint import _path_str, is_write_process

MANIFEST = 'manifest.json'


def _chunk_key(path: str, offsets) -> str:
    return '{}@{}'.format(path, ','.join(str(int(o)) for o in offsets))


def _split_key(key: str):
    path, _, off = key.rpartition('@')
    offsets = tuple(int(o) for o in off.split(',')) if off else ()
    return path, offsets


def _shard_offsets(index, shape):
    """Normalize a shard's index (tuple of slices) to start offsets."""
    return tuple(sl.indices(dim)[0] for sl, dim in zip(index, shape))


def _local_chunks(tree):
    """-> (chunks this process must write, manifest leaf entries).

    ``chunks`` values are device shard handles (or numpy) — the host pull
    is deferred so AsyncCheckpointer can run it off-thread."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    chunks: Dict[str, Any] = {}
    entries: Dict[str, Any] = {}
    for path, leaf in flat:
        if leaf is None:
            continue
        key = _path_str(path)
        if isinstance(leaf, jax.Array):
            entries[key] = {'shape': list(leaf.shape),
                            'dtype': np.dtype(leaf.dtype).name}
            for s in leaf.addressable_shards:
                if s.replica_id != 0:
                    continue
                offs = _shard_offsets(s.index, leaf.shape)
                chunks[_chunk_key(key, offs)] = s.data
        else:
            arr = np.asarray(leaf)
            entries[key] = {'shape': list(arr.shape),
                            'dtype': arr.dtype.name}
            if jax.process_index() == 0:
                chunks[_chunk_key(key, (0,) * arr.ndim)] = arr
    return chunks, entries


def _storable(arr: np.ndarray) -> np.ndarray:
    """npz cannot round-trip extension dtypes (bfloat16 & friends load back
    as raw void): store them viewed as same-width uints; the manifest keeps
    the true dtype and load views back."""
    if arr.dtype.kind == 'V':
        return arr.view('u{}'.format(arr.dtype.itemsize))
    return arr


def _write_npz(path: str, arrays: Dict[str, np.ndarray]):
    d = os.path.dirname(path) or '.'
    fd, tmp = tempfile.mkstemp(dir=d, suffix='.tmp')
    os.close(fd)
    try:
        np.savez(tmp, **arrays)
        src = tmp + '.npz' if os.path.exists(tmp + '.npz') else tmp
        os.replace(src, path)
    finally:
        for t in (tmp, tmp + '.npz'):
            if os.path.exists(t):
                os.unlink(t)


def barrier(tag: str = 'jvt_ckpt'):
    """Cross-process sync so all shard files exist before anyone loads."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(tag)


def save_checkpoint_sharded(dir_path: str, tree,
                            checkpointer: Optional['AsyncCheckpointer'] = None,
                            sync: bool = True):
    """Write ``tree`` as <dir>/shard-<p>.npz files + manifest.json.

    No collectives: each process serializes only its addressable
    replica-0 chunks.  ``checkpointer`` defers the host pull + file IO to
    its worker thread (pass sync=False to skip the cross-process barrier
    — the caller must then barrier() after checkpointer.wait() before any
    process may load)."""
    os.makedirs(dir_path, exist_ok=True)
    chunks, entries = _local_chunks(tree)
    pid = jax.process_index()
    shard_path = os.path.join(dir_path, 'shard-{}.npz'.format(pid))
    manifest = {'format': 'jvt-sharded-v1',
                'process_count': jax.process_count(),
                'leaves': entries}

    def write():
        host = {k: _storable(np.asarray(v)) for k, v in chunks.items()}
        _write_npz(shard_path, host)
        if pid == 0:
            fd, tmp = tempfile.mkstemp(dir=dir_path, suffix='.tmp')
            with os.fdopen(fd, 'w') as f:
                json.dump(manifest, f, indent=1)
            os.replace(tmp, os.path.join(dir_path, MANIFEST))

    if checkpointer is not None:
        # snapshot on device: the next train step donates (invalidates)
        # the live state buffers, the worker must read immutable copies
        for k, v in list(chunks.items()):
            if isinstance(v, jax.Array):
                chunks[k] = jax.numpy.copy(v)
        checkpointer.submit(write)
        if sync:
            checkpointer.wait()
            barrier('jvt_ckpt_save:' + dir_path)
    else:
        write()
        if sync:
            barrier('jvt_ckpt_save:' + dir_path)


def is_sharded_checkpoint(dir_path: str) -> bool:
    return os.path.isfile(os.path.join(dir_path, MANIFEST))


def load_checkpoint_sharded(dir_path: str) -> Dict[str, np.ndarray]:
    """Stitch shard files back into {tree path: global ndarray}.

    Every process reads every shard file (restore is rare and the result
    feeds the standard unflatten_into + device_put path, which reshards
    onto whatever mesh the caller is using now)."""
    with open(os.path.join(dir_path, MANIFEST)) as f:
        manifest = json.load(f)
    leaves = manifest['leaves']
    out = {k: np.zeros(tuple(e['shape']), np.dtype(e['dtype']))
           for k, e in leaves.items()}
    filled = {k: 0 for k in leaves}
    for p in range(manifest['process_count']):
        sp = os.path.join(dir_path, 'shard-{}.npz'.format(p))
        if not os.path.exists(sp):
            raise FileNotFoundError(
                'sharded checkpoint {} is missing {} (incomplete save? '
                'manifest expects {} processes)'.format(
                    dir_path, sp, manifest['process_count']))
        with np.load(sp) as z:
            for key in z.files:
                path, offs = _split_key(key)
                chunk = z[key]
                want = out[path].dtype
                if chunk.dtype != want and chunk.dtype.kind in 'uV':
                    chunk = chunk.view(want)
                sl = tuple(slice(o, o + s)
                           for o, s in zip(offs, chunk.shape))
                out[path][sl] = chunk
                filled[path] += max(chunk.size, 1)
    bad = [k for k, e in leaves.items()
           if filled[k] < max(int(np.prod(e['shape'])), 1)]
    if bad:
        raise ValueError('sharded checkpoint {} has unfilled leaves '
                         '(chunks missing): {}'.format(dir_path, bad[:5]))
    return out


class AsyncCheckpointer:
    """One background writer; submit() waits for the previous write first
    (bounds in-flight host copies to one checkpoint).  Exceptions from the
    worker re-raise on the next wait()/submit() so a failed save cannot
    pass silently."""

    def __init__(self):
        self._thread: Optional[threading.Thread] = None
        self._exc: Optional[BaseException] = None

    def submit(self, fn: Callable[[], None]):
        self.wait()

        def run():
            try:
                fn()
            except BaseException as e:   # re-raised on wait()
                self._exc = e

        self._thread = threading.Thread(target=run, daemon=True,
                                        name='jvt-ckpt-writer')
        self._thread.start()

    def wait(self):
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._exc is not None:
            e, self._exc = self._exc, None
            raise e

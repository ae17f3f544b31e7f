"""Checkpoint primitives: atomic JSON and flattened-pytree npz archives.

The reference's split checkpoint (architecture/params JSON + state.pth +
optimizer.pth, ref cvae.py:2650-2675) maps to: JSON files with the same
names/schemas + ``state.npz`` / ``optimizer.npz`` holding pytree leaves keyed
by their tree paths.  Loading restores leaves *into* a freshly initialized
pytree by path (so the treedef never needs to be serialized).
"""

import json
import os
import tempfile
from typing import Any, Dict

import jax
import numpy as np


def save_json(d: Dict[str, Any], path: str, indent: int = 1):
    """Atomic JSON write (ref utils/save_load/misc.py:32-38 retries on
    corrupt files; we avoid corruption instead with rename)."""
    if not is_write_process():
        return
    os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or '.', suffix='.tmp')
    try:
        with os.fdopen(fd, 'w') as f:
            json.dump(d, f, indent=indent, default=_json_default)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def _json_default(o):
    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        return float(o)
    if isinstance(o, np.ndarray):
        return o.tolist()
    if hasattr(o, 'item'):
        return o.item()
    raise TypeError('not JSON serializable: {}'.format(type(o)))


def load_json(path: str, presumed_type=dict):
    """JSON load converting top-level integer-string keys back to ints
    (the reference keys results by epoch int — ref dictify/misc)."""
    with open(path) as f:
        d = json.load(f)

    def intify(x):
        if isinstance(x, dict):
            out = {}
            for k, v in x.items():
                try:
                    k = int(k)
                except (ValueError, TypeError):
                    pass
                out[k] = intify(v)
            return out
        return x
    return intify(d)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, 'key'):
            parts.append(str(p.key))
        elif hasattr(p, 'name'):
            parts.append(str(p.name))
        elif hasattr(p, 'idx'):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return '/'.join(parts)


def flatten_pytree(tree) -> Dict[str, np.ndarray]:
    """Pytree -> {path: ndarray}, skipping non-array leaves.

    Multi-process: leaves sharded across process boundaries are gathered
    with a collective (every process must call this — it participates in
    the all-gather even if only host 0 ends up writing the file)."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    gather = None
    for path, leaf in flat:
        if leaf is None:
            continue
        if (isinstance(leaf, jax.Array) and not leaf.is_fully_addressable
                and not leaf.is_fully_replicated):
            if gather is None:
                from jax.experimental import multihost_utils
                gather = multihost_utils.process_allgather
            arr = np.asarray(gather(leaf, tiled=True))
        else:
            arr = np.asarray(leaf)
        out[_path_str(path)] = arr
    return out


def is_write_process() -> bool:
    """Multi-process runs write checkpoints/JSONs from host 0 only (the
    collective gathers in flatten_pytree still run on every process)."""
    return jax.process_index() == 0


def unflatten_into(template, arrays: Dict[str, np.ndarray]):
    """Replace template leaves by arrays matched on tree path.

    Leaves missing from ``arrays`` keep the template value (lenient load, the
    behavior WIM relies on — ref ft/job.py:121-169); extra keys are returned
    so callers can warn."""
    flat = jax.tree_util.tree_flatten_with_path(template)
    paths = [(_path_str(p), leaf) for p, leaf in flat[0]]
    used = set()
    leaves = []
    for key, leaf in paths:
        if key in arrays and leaf is not None:
            arr = arrays[key]
            if (hasattr(leaf, 'shape') and tuple(arr.shape) != tuple(leaf.shape)
                    and getattr(leaf, 'ndim', 0) > 0):
                raise ValueError(
                    'checkpoint leaf {} has shape {}, template expects {} — '
                    'the saved arrays do not match the rebuilt architecture'
                    .format(key, tuple(arr.shape), tuple(leaf.shape)))
            leaves.append(jax.numpy.asarray(arr).astype(
                leaf.dtype if hasattr(leaf, 'dtype') else arr.dtype))
            used.add(key)
        else:
            leaves.append(leaf)
    missing = [k for k, leaf in paths if k not in used and leaf is not None]
    extra = [k for k in arrays if k not in used]
    tree = jax.tree_util.tree_unflatten(flat[1], leaves)
    return tree, missing, extra


def save_checkpoint(path: str, tree):
    """Save a pytree to a .npz (atomic).

    Multi-process: every process participates in the flatten (it gathers
    cross-process shards collectively) but only host 0 touches the file —
    concurrent writers racing os.replace on a shared filesystem would
    corrupt the archive.  Per-process shard files without the gather:
    sharded_checkpoint.save_checkpoint_sharded."""
    arrays = flatten_pytree(tree)
    if not is_write_process():
        return
    os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or '.', suffix='.tmp')
    os.close(fd)
    try:
        # np.savez appends .npz to names without that extension
        np.savez(tmp, **arrays)
        os.replace(tmp + '.npz' if os.path.exists(tmp + '.npz') else tmp, path)
    finally:
        for t in (tmp, tmp + '.npz'):
            if os.path.exists(t):
                os.unlink(t)


def load_checkpoint(path: str) -> Dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}

"""Multi-host data feeding: build global device arrays from per-process
host shards.

On a pod each process sees only its own chips; the global batch must be
assembled from process-local numpy shards
(``jax.make_array_from_process_local_data``).  Single-process meshes get a
plain device_put with the same sharding — so the training loop is identical
on a laptop, one host, or a pod (SURVEY.md section 5, distributed statement).
"""

from typing import Iterator, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.loaders import ArrayDataset, DataLoader


def process_shard(dataset: ArrayDataset,
                  process_index: Optional[int] = None,
                  process_count: Optional[int] = None) -> ArrayDataset:
    """The contiguous slice of a dataset this process is responsible for."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    n = len(dataset)
    per = n // pc
    # every shard gets exactly `per` items — handing the remainder to the
    # last process could give it one MORE batch than its peers, and a
    # process entering the SPMD step alone hangs the collective; the
    # (< pc) dataset tail is dropped like a drop_last batch tail
    lo = pi * per
    return dataset.subset(np.arange(lo, lo + per))


def global_batch(mesh: Mesh, x_local: np.ndarray, y_local: np.ndarray
                 ) -> Tuple[jax.Array, jax.Array]:
    """Assemble global arrays batch-sharded over 'data' from local shards."""
    x_sh = NamedSharding(mesh, P('data', *([None] * (x_local.ndim - 1))))
    y_sh = NamedSharding(mesh, P('data'))
    if jax.process_count() == 1:
        return jax.device_put(x_local, x_sh), jax.device_put(y_local, y_sh)
    gx = jax.make_array_from_process_local_data(x_sh, x_local)
    gy = jax.make_array_from_process_local_data(y_sh, y_local)
    return gx, gy


def aligned_global_batch(mesh: Mesh, x: np.ndarray, y: np.ndarray
                         ) -> Tuple[jax.Array, jax.Array]:
    """Assemble a global batch from a host copy of the FULL global batch.

    Every process iterates the same full-dataset loader (identical seed →
    identical permutation → identical global batches) and ships only its
    contiguous slice; the resulting data order is bit-identical to a
    single-process run with the same loader, which makes multi-process
    trajectories directly comparable to single-process ones
    (tests/test_multiprocess.py).  Whole-array datasets are host-resident
    per process anyway, so the full-batch host copy costs nothing extra;
    pod-scale per-shard feeding (each process reading only its slice of the
    dataset) is ``sharded_loader`` below."""
    pc, pi = jax.process_count(), jax.process_index()
    if pc == 1:
        return global_batch(mesh, x, y)
    n = x.shape[0]
    if n % pc:
        raise ValueError(
            'global batch of {} rows does not divide over {} processes — '
            'pick a batch size that is a multiple of the process count '
            '(the bit-identical data-order guarantee needs equal '
            'contiguous per-process slices)'.format(n, pc))
    per = n // pc
    return global_batch(mesh, x[pi * per:(pi + 1) * per],
                        y[pi * per:(pi + 1) * per])


def sharded_loader(mesh: Mesh, dataset: ArrayDataset, global_batch_size: int,
                   seed: int = 0, shuffle: bool = True,
                   data_augmentation=()) -> Iterator[Tuple[jax.Array, jax.Array]]:
    """Per-epoch iterator of globally-sharded batches.

    Every process iterates its own shard with the same seed, so global
    batches stay aligned; the local batch is global_batch_size / #processes.
    """
    pc = jax.process_count()
    assert global_batch_size % pc == 0, (global_batch_size, pc)
    local = process_shard(dataset)
    loader = DataLoader(local, global_batch_size // pc, shuffle=shuffle,
                        seed=seed, data_augmentation=data_augmentation,
                        drop_last=True)
    for x, y in loader:
        yield global_batch(mesh, x, y)

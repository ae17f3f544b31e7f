"""Scalable ImageFolder ingestion: one-time parallel decode into a uint8
memmap cache.

The reference streams ImageFolder trees per batch through torchvision
workers (ref utils/torch_load.py:250-294) and re-pays JPEG decode every
epoch.  Whole-array ingestion (this framework's model) must not pay the
opposite cost — a single-threaded float32 decode of the full tree on every
run (~16 GB host RAM + hours for imagenet1k@64px).  Instead:

- first touch decodes the tree ONCE with a pool of decode subprocesses
  straight into ``<root>/.jvt_cache/<tag>-<C>x<H>x<W>-<hash>.u8`` (uint8,
  4x smaller than float32; workers write disjoint slices of the same
  memmap, so peak RSS stays at a few decode buffers regardless of dataset
  size).  Workers are plain ``subprocess`` children started with ``-S``
  (no site/sitecustomize, so no multi-second jax import and no TPU-tunnel
  touch) importing only numpy+PIL — NOT a ``multiprocessing`` fork pool:
  ingest runs inside an already jax-threaded process, and forking a
  multi-threaded process deadlocks the child on inherited locks
  (observed live in the test suite);
- subsequent runs open the cache as a read-only ``np.memmap`` in
  milliseconds; batches normalize to float32 [0,1] lazily per batch
  (loaders.to_float / the DeviceDataset normalizes in-step on device);
- the cache key hashes every file's (relative path, size, mtime_ns) plus
  the target shape — touching the tree invalidates it.

The labels and a meta JSON live next to the .u8; the meta file is written
last (atomic rename), so a crashed ingest never presents a complete cache.
"""

import json
import logging
import os
import subprocess
import sys
import tempfile
import zlib
from typing import List, Optional, Sequence, Tuple

import numpy as np

EXTS = ('.jpg', '.jpeg', '.png', '.bmp')


def list_folder(base: str, allowed: Optional[Sequence[str]] = None):
    """-> (sorted class names, [(path, label)]) for root/<class>/*.img."""
    classes = sorted(d for d in os.listdir(base)
                     if os.path.isdir(os.path.join(base, d))
                     and not d.startswith('.'))    # skip .jvt_cache itself
    if allowed:
        allowed = set(allowed)
        classes = [c for c in classes if c in allowed]
    files: List[Tuple[str, int]] = []
    for yi, cname in enumerate(classes):
        cdir = os.path.join(base, cname)
        for fn in sorted(os.listdir(cdir)):
            if fn.lower().endswith(EXTS):
                files.append((os.path.join(cdir, fn), yi))
    return classes, files


def _cache_key(base: str, files, shape) -> str:
    crc = zlib.crc32(repr(tuple(shape)).encode())
    for path, label in files:
        st = os.stat(path)
        rec = '{}|{}|{}|{}'.format(os.path.relpath(path, base), label,
                                   st.st_size, st.st_mtime_ns)
        crc = zlib.crc32(rec.encode(), crc)
    return '{:08x}'.format(crc)


def _cache_dir(base: str) -> str:
    d = os.path.join(base, '.jvt_cache')
    try:
        os.makedirs(d, exist_ok=True)
        probe = os.path.join(d, '.probe')
        with open(probe, 'w'):
            pass
        os.unlink(probe)
        return d
    except OSError:
        alt = os.path.join(os.path.expanduser('~'), '.cache', 'jvt_ingest')
        os.makedirs(alt, exist_ok=True)
        return alt


def _decode_one(path: str, shape) -> np.ndarray:
    from PIL import Image
    c, h, w = shape
    img = Image.open(path).convert('RGB' if c == 3 else 'L').resize((w, h))
    arr = np.asarray(img, np.uint8)
    if arr.ndim == 2:
        arr = arr[None]
    else:
        arr = arr.transpose(2, 0, 1)
    return arr


# decode-worker program: run with `python -S` (no site/sitecustomize, so
# no jax import, no TPU-tunnel touch) + the parent's site-packages dir on
# sys.path for numpy/PIL only.  argv: <site-packages dir> <jobs json>.
# The jobs file carries the memmap path/shape and (index, path) entries;
# the worker writes its disjoint memmap rows and reports failures one per
# stdout line (exit 1 when any).
_WORKER_SRC = r"""
import json, sys
sys.path.insert(0, sys.argv[1])
import numpy as np
from PIL import Image
spec = json.load(open(sys.argv[2]))
c, h, w = spec['shape']
mm = np.memmap(spec['mm'], dtype=np.uint8, mode='r+',
               shape=(spec['n'], c, h, w))
failed = 0
for i, p in spec['entries']:
    try:
        img = Image.open(p).convert('RGB' if c == 3 else 'L').resize((w, h))
        a = np.asarray(img, np.uint8)
        mm[i] = a[None] if a.ndim == 2 else a.transpose(2, 0, 1)
    except Exception as e:           # keep the slot zeroed, report
        failed += 1
        print('{}: {}'.format(p, e), flush=True)
mm.flush()
sys.exit(1 if failed else 0)
"""


def _spawn_decoders(mm_path, files, n, shape, workers, cdir) -> List[str]:
    """Decode ``files`` into ``mm_path`` with ``workers`` subprocesses over
    contiguous index ranges; returns per-file error strings."""
    site_dir = os.path.dirname(os.path.dirname(np.__file__))
    per = (n + workers - 1) // workers
    procs = []
    for w0 in range(0, n, per):
        entries = [[i, files[i][0]] for i in range(w0, min(w0 + per, n))]
        fd, jf = tempfile.mkstemp(dir=cdir, suffix='.jobs')
        with os.fdopen(fd, 'w') as f:
            json.dump({'mm': mm_path, 'n': n, 'shape': list(shape),
                       'entries': entries}, f)
        p = subprocess.Popen([sys.executable, '-S', '-c', _WORKER_SRC,
                              site_dir, jf],
                             stdout=subprocess.PIPE,
                             stderr=subprocess.STDOUT, text=True)
        procs.append((p, jf))
    errors: List[str] = []
    for p, jf in procs:
        out, _ = p.communicate()
        os.unlink(jf)
        if p.returncode != 0:
            lines = [l for l in out.splitlines() if l.strip()]
            # A worker killed without output (OOM-kill, segfault, startup
            # crash) must still poison the ingest, or a COMPLETE cache with
            # an all-zeros slice would be presented — silent corruption.
            errors.extend(lines or
                          ['decode worker exited {}'.format(p.returncode)])
    return errors


def _cache_paths(base: str, files, shape):
    c, h, w = shape
    key = _cache_key(base, files, shape)
    cdir = _cache_dir(base)
    tag = '{}-{}x{}x{}-{}'.format(
        os.path.basename(os.path.normpath(base)) or 'data', c, h, w, key)
    return (os.path.join(cdir, tag + '.u8'),
            os.path.join(cdir, tag + '.y.npy'),
            os.path.join(cdir, tag + '.json'), cdir)


def _open_cache(mm_path, y_path, meta_path, n, shape):
    """-> (uint8 memmap, labels) if a COMPLETE warm cache exists, else None.

    The meta JSON is written last (atomic), but a cache cleaner can still
    delete the large .u8 while keeping the tiny .json — validate every
    file (and the memmap's byte size) before trusting the cache, and treat
    any inconsistency as a miss to re-ingest rather than crash."""
    c, h, w = shape
    if not os.path.exists(meta_path):
        return None
    try:
        with open(meta_path) as f:
            meta = json.load(f)
        if (meta.get('n') != n
                or os.path.getsize(mm_path) != n * c * h * w):
            return None
        labels = np.load(y_path)
        if labels.shape != (n,):
            return None
    except (OSError, ValueError):
        return None
    x = np.memmap(mm_path, dtype=np.uint8, mode='r', shape=(n, c, h, w))
    return x, labels


def open_cached_image_folder(base: str, shape,
                             allowed: Optional[Sequence[str]] = None):
    """Warm-cache-only open: -> (uint8 memmap, labels, classes) or None.

    Needs only os.stat over the tree (no PIL, no decode) — the path a
    minimal worker image without PIL uses to consume a cache built
    elsewhere (data/loaders.py::_load_image_folder)."""
    classes, files = list_folder(base, allowed)
    if not files:
        return None
    mm_path, y_path, meta_path, _ = _cache_paths(base, files, shape)
    got = _open_cache(mm_path, y_path, meta_path, len(files), shape)
    if got is None:
        return None
    return got[0], got[1], classes


def ingest_image_folder(base: str, shape,
                        allowed: Optional[Sequence[str]] = None,
                        workers: Optional[int] = None,
                        chunk: int = 256):
    """-> (uint8 memmap (N, C, H, W), labels int32, classes) or None.

    Decodes once into the cache (parallel, bounded RSS), then memmaps.
    ``JVT_INGEST_WORKERS`` overrides the pool size; the pool is skipped
    entirely for single-worker runs (1-core hosts) where fork overhead
    would only hurt.
    """
    classes, files = list_folder(base, allowed)
    if not files:
        return None
    c, h, w = shape
    mm_path, y_path, meta_path, cdir = _cache_paths(base, files, shape)

    n = len(files)
    labels = np.asarray([lb for _, lb in files], np.int32)
    got = _open_cache(mm_path, y_path, meta_path, n, shape)
    if got is not None:
        return got[0], got[1], classes

    # cold path: decode everything once, in parallel, into the memmap
    workers = workers or int(os.environ.get('JVT_INGEST_WORKERS', 0)) \
        or (os.cpu_count() or 1)
    with open(mm_path, 'wb') as f:
        f.truncate(n * c * h * w)
    errors: List[str] = []
    if workers > 1 and n > chunk:
        errors = _spawn_decoders(mm_path, files, n, shape, workers, cdir)
    else:
        # 1-core hosts: in-process loop (worker startup would only hurt)
        mm = np.memmap(mm_path, dtype=np.uint8, mode='r+',
                       shape=(n, c, h, w))
        for i, (p, _) in enumerate(files):
            try:
                mm[i] = _decode_one(p, shape)
            except Exception as e:   # keep the slot zeroed, report
                errors.append('{}: {}'.format(p, e))
        mm.flush()
        del mm
    if errors:
        os.unlink(mm_path)
        raise RuntimeError('ingest failed on {} file(s), e.g. {}'.format(
            len(errors), errors[0]))
    np.save(y_path, labels)
    fd, tmp = tempfile.mkstemp(dir=cdir, suffix='.tmp')
    with os.fdopen(fd, 'w') as f:
        json.dump({'n': n, 'shape': [c, h, w], 'classes': classes,
                   'base': os.path.abspath(base)}, f)
    os.replace(tmp, meta_path)
    logging.info('ingested %d images from %s into %s', n, base, mm_path)
    x = np.memmap(mm_path, dtype=np.uint8, mode='r', shape=(n, c, h, w))
    return x, labels, classes

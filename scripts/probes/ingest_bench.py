"""Ingest-cache benchmark (VERDICT r3 item 2 'done' criterion).

Generates a synthetic ImageFolder tree of N JPEGs, then measures:
- cold ingest (parallel decode -> uint8 memmap cache): wall, img/s, MB/s
- peak RSS during ingest (must stay bounded, i.e. << dataset size)
- warm open (cache hit) latency
- one epoch of DataLoader batches off the memmap (uint8 -> float32 lazy)

Usage: python scripts/probes/ingest_bench.py [N] [HW]
"""

import os
import resource
import shutil
import sys
import time

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    hw = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    shape = (3, hw, hw)
    root = '/tmp/jvt_ingest_bench'
    shutil.rmtree(root, ignore_errors=True)
    from PIL import Image
    rng = np.random.default_rng(0)
    classes = 20
    t0 = time.time()
    jpeg_bytes = 0
    for c in range(classes):
        d = os.path.join(root, 'c{:03d}'.format(c))
        os.makedirs(d)
        for i in range(n // classes):
            arr = rng.integers(0, 256, (hw, hw, 3), dtype=np.uint8)
            p = os.path.join(d, '{:06d}.jpg'.format(i))
            Image.fromarray(arr).save(p, quality=85)
            jpeg_bytes += os.path.getsize(p)
    print('generated {} jpegs ({:.1f} MB) in {:.1f}s'.format(
        n, jpeg_bytes / 1e6, time.time() - t0))

    from joint_vae_tpu.data.ingest import ingest_image_folder
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    t0 = time.time()
    x, y, _ = ingest_image_folder(root, shape)
    cold = time.time() - t0
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    out_mb = x.size / 1e6
    print('cold ingest: {:.1f}s  {:.0f} img/s  in {:.1f} MB/s (jpeg) '
          'out {:.1f} MB/s (u8)  parent RSS delta {:.0f} MB'.format(
              cold, n / cold, jpeg_bytes / 1e6 / cold, out_mb / cold,
              (rss1 - rss0) / 1024))

    t0 = time.time()
    x2, y2, _ = ingest_image_folder(root, shape)
    warm = time.time() - t0
    assert isinstance(x2, np.memmap)
    print('warm open: {:.1f} ms'.format(warm * 1e3))

    from joint_vae_tpu.data.loaders import ArrayDataset, DataLoader
    ds = ArrayDataset(x2, y2, 'bench')
    t0 = time.time()
    seen = 0
    for xb, yb in DataLoader(ds, 512, shuffle=True, seed=1):
        assert xb.dtype == np.float32
        seen += len(xb)
    ep = time.time() - t0
    rss2 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    print('epoch off memmap: {:.2f}s  {:.0f} img/s  total peak RSS {:.0f} MB '
          '(dataset u8 = {:.0f} MB, f32 would be {:.0f} MB)'.format(
              ep, seen / ep, rss2 / 1024, out_mb, 4 * out_mb))


if __name__ == '__main__':
    main()

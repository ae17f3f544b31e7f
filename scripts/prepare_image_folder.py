#!/usr/bin/env python
"""Organize a flat image directory into the ImageFolder layout the loaders
read (ref tests/prepare_imagenet_folder.py):

    prepare_image_folder.py <src> <dst> --labels labels.txt [--val-frac 0.1]

labels.txt lines: "<filename> <class-id-or-wnid>".  Produces
dst/train/<class>/... and dst/val/<class>/... (symlinks by default).
"""

import argparse
import os
import random
import sys


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('src')
    p.add_argument('dst')
    p.add_argument('--labels', required=True)
    p.add_argument('--val-frac', type=float, default=0.1)
    p.add_argument('--copy', action='store_true', help='copy instead of link')
    p.add_argument('--seed', type=int, default=0)
    args = p.parse_args(argv)

    pairs = []
    with open(args.labels) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                pairs.append((parts[0], parts[1]))
    rng = random.Random(args.seed)
    rng.shuffle(pairs)
    n_val = int(len(pairs) * args.val_frac)

    import shutil
    for i, (fn, cls) in enumerate(pairs):
        split = 'val' if i < n_val else 'train'
        src = os.path.join(args.src, fn)
        if not os.path.exists(src):
            print('missing:', src, file=sys.stderr)
            continue
        d = os.path.join(args.dst, split, cls)
        os.makedirs(d, exist_ok=True)
        dst = os.path.join(d, os.path.basename(fn))
        if os.path.exists(dst):
            continue
        if args.copy:
            shutil.copy2(src, dst)
        else:
            os.symlink(os.path.abspath(src), dst)
    print('organized {} files into {}'.format(len(pairs), args.dst))
    return 0


if __name__ == '__main__':
    sys.exit(main())

"""Export native job directories into reference-loadable jobs.

    python -m joint_vae_tpu.cli.export_ref SRC [SRC...] --out ref-jobs
    python -m joint_vae_tpu.cli.export_ref --scan JOBS_ROOT --out ref-jobs

The inverse of cli/import_ref.py: each SRC is a native job directory
(save_load/jobs.py layout); the output is a directory the reference's own
``CVNet.load`` / test.py / results pipelines consume (ref cvae.py:2677-2857).
Requires the reference package importable — pass --reference or set
JVT_REFERENCE (it defines the torch checkpoint formats being written).
"""

import argparse
import os
import sys

from ..save_load.export_reference import (export_to_reference_job,
                                          default_reference_path)
from ..utils.print_log import set_log
from . import (add_platform_arg, apply_platform, find_job_dirs,
               convert_job_batch)

find_native_jobs = find_job_dirs


def main(argv=None):
    p = argparse.ArgumentParser(prog='jvt-export')
    p.add_argument('sources', nargs='*',
                   help='native job directories to export')
    p.add_argument('--scan', default=None, metavar='ROOT',
                   help='walk a native jobs tree and export every job')
    p.add_argument('--out', '-O', default='ref-jobs',
                   help='destination reference jobs root')
    p.add_argument('--reference', default=None, metavar='PATH',
                   help='reference package path (default: $JVT_REFERENCE)')
    p.add_argument('--no-recorders', dest='recorders', action='store_false',
                   help='skip converting recorders to record-*.pth')
    p.add_argument('--no-optimizer', dest='optimizer', action='store_false',
                   help='skip exporting optimizer moments')
    p.add_argument('--dry-run', action='store_true',
                   help='list what would be exported')
    p.add_argument('-v', '--verbose', action='count', default=0)
    p.add_argument('--debug', action='store_true')
    add_platform_arg(p)
    args = p.parse_args(argv)
    apply_platform(args)
    set_log(args.verbose, args.debug)

    if not args.dry_run and not (args.reference or default_reference_path()):
        p.error('no reference package (pass --reference or set '
                'JVT_REFERENCE)')

    sources = list(args.sources)
    rel_root = None
    if args.scan:
        rel_root = os.path.abspath(args.scan)
        sources += sorted(find_native_jobs(args.scan))
    if not sources:
        p.error('no sources (pass job dirs or --scan a jobs root)')

    def convert(src, dst):
        export_to_reference_job(src, dst, reference_path=args.reference,
                                export_recorders=args.recorders,
                                export_optimizer=args.optimizer)
        print('exported {} -> {}'.format(src, dst))

    done, failed = convert_job_batch(sources, rel_root, args.out,
                                     convert, args.dry_run)
    if not args.dry_run:
        print('{} exported, {} failed'.format(done, failed))
    # any failure is a nonzero exit (same rationale as cli/import_ref.py)
    return 1 if failed else 0


if __name__ == '__main__':
    sys.exit(main())

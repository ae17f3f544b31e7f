"""Import reference-trained job directories into native jobs.

    python -m joint_vae_tpu.cli.import_ref SRC [SRC...] --job-dir jobs
    python -m joint_vae_tpu.cli.import_ref --scan REF_JOBS_ROOT --job-dir jobs

Each SRC is a reference job directory (holds params.json + state.pth,
ref cvae.py:2650-2857); --scan walks a reference jobs tree and imports
every job found.  Imported jobs land under the same
<dataset>/<arch>/<options>/<job#> relative layout when importing from a
jobs root, else under <job-dir>/<job#>, and are immediately consumable by
the test/sample/ft CLIs (see save_load/import_reference.py).
"""

import argparse
import os
import sys

from ..save_load.import_reference import import_reference_job
from ..utils.print_log import set_log
from . import (add_platform_arg, apply_platform, find_job_dirs,
               convert_job_batch)

find_reference_jobs = find_job_dirs


def main(argv=None):
    p = argparse.ArgumentParser(prog='jvt-import')
    p.add_argument('sources', nargs='*',
                   help='reference job directories to import')
    p.add_argument('--scan', default=None, metavar='ROOT',
                   help='walk a reference jobs tree and import every job')
    p.add_argument('--job-dir', '-J', default='jobs',
                   help='destination native jobs root')
    p.add_argument('--job-number', type=int, default=None,
                   help='override the imported job number '
                        '(single-source only)')
    p.add_argument('--no-recorders', dest='recorders', action='store_false',
                   help='skip converting record-*.pth recorder dumps')
    p.add_argument('--dry-run', action='store_true',
                   help='list what would be imported')
    p.add_argument('-v', '--verbose', action='count', default=0)
    p.add_argument('--debug', action='store_true')
    add_platform_arg(p)
    args = p.parse_args(argv)
    apply_platform(args)
    set_log(args.verbose, args.debug)

    sources = list(args.sources)
    rel_root = None
    if args.scan:
        rel_root = os.path.abspath(args.scan)
        sources += sorted(find_reference_jobs(args.scan))
    if not sources:
        p.error('no sources (pass job dirs or --scan a jobs root)')
    if args.job_number is not None and len(sources) > 1:
        p.error('--job-number only applies to a single source')

    def convert(src, dst):
        import_reference_job(src, dst, job_number=args.job_number,
                             import_recorders=args.recorders)
        print('imported {} -> {}'.format(src, dst))

    done, failed = convert_job_batch(sources, rel_root, args.job_dir,
                                     convert, args.dry_run)
    if not args.dry_run:
        print('{} imported, {} failed'.format(done, failed))
    # any failure is a nonzero exit: scripted batch conversions must not
    # silently lose jobs behind a 0 status (round-3 advisor)
    return 1 if failed else 0


if __name__ == '__main__':
    sys.exit(main())

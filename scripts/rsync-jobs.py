#!/usr/bin/env python
"""Pull/push job trees between machines (ref utils/rsync-jobs.sh).

    scripts/rsync-jobs.py <remote-host> [--push] [--profile results|records|full]
        [--job-dir jobs] [--go]
"""

import argparse
import sys

sys.path.insert(0, '.')

from joint_vae_tpu.utils.maintenance import sync_jobs, rsync_command  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument('remote')
    p.add_argument('--push', action='store_true')
    p.add_argument('--profile', default='results',
                   choices=['results', 'records', 'full'])
    p.add_argument('--job-dir', default='jobs')
    p.add_argument('--go', action='store_true', help='actually run (else dry)')
    args = p.parse_args()
    print(' '.join(rsync_command(args.remote, args.job_dir, args.push,
                                 args.profile)))
    r = sync_jobs(args.remote, args.job_dir, args.push, args.profile,
                  dry_run=not args.go)
    sys.stdout.write(r.stdout)
    sys.stderr.write(r.stderr)
    return r.returncode


if __name__ == '__main__':
    sys.exit(main())

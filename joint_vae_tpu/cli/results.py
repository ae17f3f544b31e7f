"""INI-driven paper tables (ref results/__main__.py:32-150).

    python -m joint_vae_tpu.cli.results <config.ini> [--job-dir jobs]

Each INI section defines one model group: filter keys select jobs, the
section's table options shape the output; tables land as .tex/.tab next to
the INI (or --out-dir).

Example section:

    [cifar10-cvae]
    type = cvae
    set = cifar10
    done = 100...
    tpr = 95
"""

import argparse
import configparser
import os
import sys

from ..results.tables import results_dataframe, agg_results, auto_remove_index
from ..results.texify import texify_test_results_df
from ..save_load.fetch import fetch_models
from ..utils.filters import filters_from_dict
from ..utils.print_log import set_log

TABLE_OPTIONS = {'tpr', 'agg', 'index', 'out'}


def main(argv=None):
    p = argparse.ArgumentParser(prog='jvt-results')
    p.add_argument('config', help='results INI file')
    p.add_argument('--job-dir', default='jobs')
    p.add_argument('--out-dir', default=None)
    p.add_argument('-v', '--verbose', action='count', default=0)
    args = p.parse_args(argv)
    set_log(args.verbose)

    cp = configparser.ConfigParser()
    cp.read(args.config)
    out_dir = args.out_dir or os.path.dirname(os.path.abspath(args.config))

    models = fetch_models(args.job_dir)
    wrote = []
    for section in cp.sections():
        opts = dict(cp[section])
        filter_keys = {k: v for k, v in opts.items()
                       if k not in TABLE_OPTIONS}
        flt = filters_from_dict(filter_keys)
        group = [m for m in models if flt(m)]
        if not group:
            print('[{}] no models'.format(section))
            continue
        try:
            tpr = int(opts.get('tpr', 95))
        except ValueError:
            print('[{}] bad tpr option {!r} (want an integer percent)'
                  .format(section, opts['tpr']))
            continue
        df = auto_remove_index(results_dataframe(group, tpr=tpr))
        if opts.get('agg', '').lower() == 'true':
            df = agg_results(df)
        tex = os.path.join(out_dir, '{}.tex'.format(section))
        tab = os.path.join(out_dir, '{}.tab'.format(section))
        texify_test_results_df(df, tex_file=tex, tab_file=tab)
        wrote.append(tex)
        print('[{}] {} models -> {}'.format(section, len(group), tex))
    return 0 if wrote else 1


if __name__ == '__main__':
    sys.exit(main())

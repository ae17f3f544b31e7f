"""Fleet-evaluation CLI (ref test.py:19-523).

    python -m joint_vae_tpu.cli.test --job-dir jobs [--filter key=value ...]
        [--compute] [--tex out.tex]

Flow: fetch+filter models -> plan via available_results (json / recorders /
compute per --compute) -> recompute what is missing -> build dataframes ->
print + optionally write .tex/.tab.
"""

import argparse
import logging
import sys

from ..data.loaders import get_dataset
from ..save_load.dictify import make_dict_from_model
from ..save_load.fetch import fetch_models
from ..save_load.jobs import load_job
from ..evals.engines import (accuracy, ood_detection_rates,
                             misclassification_detection_rates)
from ..results.tables import results_dataframe, agg_results, auto_remove_index
from ..results.texify import texify_test_results_df
from ..utils.filters import filters_from_dict
from ..utils.print_log import set_log
from ..utils.testing import cache_early_stopping
from . import add_platform_arg, apply_platform


def main(argv=None):
    p = argparse.ArgumentParser(prog='jvt-test')
    p.add_argument('--job-dir', default='jobs')
    p.add_argument('--filter', nargs='*', default=[],
                   help='key=value filter strings (value grammar: lists, '
                        'not, a...b intervals)')
    p.add_argument('--compute', action='store_true',
                   help='recompute missing results (else json/recorders only)')
    p.add_argument('--epoch', default='last')
    p.add_argument('--epoch-tolerance', type=int, default=5)
    p.add_argument('--early-stopping', action='store_true')
    p.add_argument('--batch-size', type=int, default=512)
    p.add_argument('--test-sample-size', '-t', type=int, default=0,
                   help='cap recomputation to this many samples '
                        '(0 = whole set; ref test.py -t)')
    p.add_argument('--sets', nargs='*', default=None,
                   help='OOD set names to evaluate against (default: the '
                        'registry same-size list; ref test.py --sets)')
    p.add_argument('--ood-methods', nargs='*', default=None,
                   help='restrict OOD scoring methods (ref test.py)')
    p.add_argument('--predict-methods', nargs='*', default=None,
                   help='restrict accuracy predict methods (ref test.py)')
    p.add_argument('--misclass-methods', nargs='*', default=None,
                   help='restrict misclassification methods (ref test.py)')
    p.add_argument('--only-finished', '-F', action='store_true',
                   help='keep only jobs trained to their target epochs '
                        '(ref test.py -F)')
    p.add_argument('--tpr', type=int, default=95,
                   help='kept-TPR level whose FPR column is shown '
                        '(ref test.py --tpr)')
    p.add_argument('--tnr', action='store_true',
                   help='show TNR (1-FPR) instead of FPR (ref test.py --tnr)')
    p.add_argument('--list-jobs-and-quit', action='store_true')
    p.add_argument('--agg', action='store_true', help='mean/std aggregation')
    p.add_argument('--tex', default=None)
    p.add_argument('--tab', default=None)
    p.add_argument('--best', action='store_true',
                   help='bold the best value per metric column in the .tex '
                        '(max accuracy/auc, min fpr)')
    p.add_argument('--last', type=int, default=0,
                   help='keep only the N highest job numbers (ref test.py)')
    p.add_argument('--sort', nargs='*', default=[],
                   help='sort rows by these flat-dict keys; a trailing "-" '
                        'sorts descending, e.g. --sort accuracy- job '
                        '(ref test.py --sort)')
    p.add_argument('--export-losses', action='store_true',
                   help='write per-job recorded losses as losses-<set>.tab '
                        '(ref utils/tables.py:26-83)')
    p.add_argument('-v', '--verbose', action='count', default=0)
    add_platform_arg(p)
    args = p.parse_args(argv)
    apply_platform(args)
    set_log(args.verbose)

    fdict = {}
    for f in args.filter:
        k, _, v = f.partition('=')
        fdict[k] = v
    flt = filters_from_dict(fdict) if fdict else None

    models = fetch_models(args.job_dir, filter=flt)
    if args.only_finished:
        models = [m for m in models if m.get('finished')]
    if args.list_jobs_and_quit:
        for m in sorted(models, key=lambda m: m.get('job') or 0):
            print(m.get('job'), m.get('dir'))
        return 0
    if args.last:
        models = sorted(models, key=lambda m: m.get('job') or 0)[-args.last:]
    if args.sort:
        for key in reversed(args.sort):
            rev = key.endswith('-')
            k = key.rstrip('-')
            models = sorted(models,
                            key=lambda m: (m.get(k) is None, m.get(k)),
                            reverse=rev)
    logging.info('%d models', len(models))

    where = ('json', 'recorders', 'compute') if args.compute \
        else ('json', 'recorders')
    # an explicit --epoch bounds result selection by --epoch-tolerance;
    # 'last' keeps the nearest-epoch default
    ep_tol = args.epoch_tolerance if args.epoch != 'last' else None
    if args.epoch != 'last' and args.epoch != 'min-loss':
        args.epoch = int(args.epoch)
    refreshed = []
    for m in models:
        if not args.compute and not args.early_stopping:
            refreshed.append(m)
            continue
        try:
            job = load_job(m['dir'], load_state=args.compute)
        except Exception as e:
            logging.warning('cannot load %s: %s', m['dir'], e)
            refreshed.append(m)
            continue
        if not args.compute:
            cache_early_stopping(job)
            refreshed.append(make_dict_from_model(
                job, directory=m['dir'], wanted_epoch=args.epoch,
                epoch_tolerance=ep_tol))
            continue
        name = job.training_parameters.get('set')
        # per-method recompute: the engines resolve each (set, method) from
        # the json / recorders / compute tiers and only evaluate the residue
        # (ref available_results, dictify.py:215-382 + test.py:178-318)
        _, testset = get_dataset(name, splits=['test'])
        oodsets = []
        ood_names = (args.sets if args.sets is not None
                     else testset.same_size)
        for n in ood_names:
            try:
                _, s = get_dataset(n, splits=['test'])
                oodsets.append(s)
            except Exception:
                pass
        num_batch = (-(-args.test_sample_size // args.batch_size)
                     if args.test_sample_size else None)
        # a flag given with zero values ('--predict-methods') means NONE
        # (skip that pass), like --sets; only an absent flag means 'all'
        pm = 'all' if args.predict_methods is None else args.predict_methods
        om = 'all' if args.ood_methods is None else args.ood_methods
        mm = 'all' if args.misclass_methods is None else args.misclass_methods
        ep = args.epoch
        accuracy(job, testset, batch_size=args.batch_size,
                 num_batch=num_batch, method=pm, epoch=ep, from_where=where)
        ood_detection_rates(job, testset, oodsets,
                            batch_size=args.batch_size, num_batch=num_batch,
                            method=om, epoch=ep, from_where=where)
        misclassification_detection_rates(
            job, testset, batch_size=args.batch_size, num_batch=num_batch,
            predict_methods=pm, misclass_methods=mm, epoch=ep,
            from_where=where)
        from ..save_load.jobs import save_job
        save_job(job, m['dir'], save_state=False)
        if args.early_stopping:
            cache_early_stopping(job)
        refreshed.append(make_dict_from_model(
            job, directory=m['dir'], wanted_epoch=args.epoch,
            epoch_tolerance=ep_tol))

    if args.export_losses:
        import os
        from ..save_load.recorders import LossRecorder
        from ..results.tables import export_losses
        for m in refreshed:
            d = m.get('dir')
            samples = os.path.join(d or '', 'samples')
            if not d or not os.path.isdir(samples):
                continue
            epochs = sorted(e for e in os.listdir(samples) if e.isdigit())
            if not epochs:
                continue
            for name, rec in LossRecorder.loadall(
                    os.path.join(samples, epochs[-1])).items():
                export_losses(rec, os.path.join(d, 'losses-{}.tab'.format(name)))
                logging.info('losses-%s.tab written for job %s', name,
                             m.get('job'))

    df = results_dataframe(refreshed, tpr=args.tpr, tnr=args.tnr,
                           sort_index=not args.sort)
    if df.empty:
        print('no models')
        return 0
    df = auto_remove_index(df)
    with_all = df
    if args.agg:
        with_all = agg_results(df)
    try:
        print(with_all.to_string(float_format=lambda v: '{:.4g}'.format(v)))
    except Exception:
        print(with_all)
    if args.tex or args.tab:
        texify_test_results_df(df, tex_file=args.tex, tab_file=args.tab,
                               best_in_group=args.best)
    return 0


if __name__ == '__main__':
    sys.exit(main())

"""Ensemble CLI (ref module/aggregation.py __main__ + results/aggregation.py).

    python -m joint_vae_tpu.cli.aggregate <job> <job> ... --job-dir jobs \
        [--methods elbo joint mean vote] [--ood]

Loads the jobs, evaluates the shared test set once per model, combines the
per-class scores into ensemble posteriors, and prints accuracy (and OOD
AUROC when --ood) per combination method, plus the pairwise latent mutual
information matrix.
"""

import argparse
import sys

import numpy as np
import jax
import jax.numpy as jnp

from ..data.loaders import get_dataset, DataLoader
from ..evals.aggregation import (ensemble_posterior, ensemble_predict,
                                 compute_latent_mutual_info)
from ..models.evaluate import evaluate
from ..ops.roc import auroc_one_sided_exact
from ..save_load.fetch import find_by_job_number
from ..utils.print_log import set_log
from . import add_platform_arg, apply_platform


def _scores(job, dataset, batch_size, key, score='total'):
    """(C, N) per-class scores + true labels + posteriors + neg-kl scores
    (the 'mean~' combine input, ref results/aggregation.py:330-335)."""
    model = job.model

    @jax.jit
    def f(variables, x, k):
        out = evaluate(model, variables, x, None, rng=k,
                       sigma_state=job.state.sigma_state, train=False)
        return out.losses, out.logits

    per, ys, posts, nkls = [], [], [], []
    for i, (x, y) in enumerate(DataLoader(dataset, batch_size, shuffle=False)):
        losses, logits = f(job.state.variables, jnp.asarray(x),
                           jax.random.fold_in(key, i))
        s = losses.get('iws')
        if s is None or s.ndim < 2:
            s = -losses['total']
        per.append(np.asarray(s))
        kl = losses.get('kl')
        nkls.append(-np.asarray(kl if kl is not None and kl.ndim >= 2
                                else losses['total']))
        ys.append(y)
        posts.append(np.asarray(jax.nn.softmax(logits, -1)).T)
    return (np.concatenate(per, -1), np.concatenate(ys),
            np.concatenate(posts, -1), np.concatenate(nkls, -1))


def main(argv=None):
    p = argparse.ArgumentParser(prog='jvt-aggregate')
    p.add_argument('jobs', nargs='+', type=int)
    p.add_argument('--job-dir', default='jobs')
    p.add_argument('--methods', nargs='*',
                   default=['elbo', 'joint', 'mean', 'vote'])
    p.add_argument('--combos', nargs='*', type=int, default=None,
                   help='evaluate every k-of-n sub-ensemble for each given '
                        'k (ref results/aggregation.py:241-308); prints one '
                        'accuracy row per (combo, method)')
    p.add_argument('--sets-to-exclude', nargs='*', default=[],
                   help='OOD companions to skip in --ood/--record '
                        '(ref results/aggregation.py:33)')
    p.add_argument('--ood', action='store_true', default=True,
                   help='(on by default, like the reference)')
    p.add_argument('--no-ood', action='store_false', dest='ood',
                   help='skip the ensemble OOD pass (ref aggregation.py:135)')
    p.add_argument('--batch-size', '-M', type=int, default=256)
    p.add_argument('--dataset-size', '-N', type=int, default=None)
    p.add_argument('--record', action='store_true',
                   help='record per-sample Im-{T} tensors per set into '
                        '<job-dir>/<set>/<j1|j2>/record-<set>.npz '
                        '(ref module/aggregation.py:219; consumed by '
                        'results.mutual_info)')
    p.add_argument('-T', '--temps', nargs='*', type=float,
                   default=[1.0, 2.0, 5.0])
    p.add_argument('-v', '--verbose', action='count', default=0)
    p.add_argument('--debug', action='store_true')
    add_platform_arg(p)
    args = p.parse_args(argv)
    apply_platform(args)
    set_log(args.verbose, args.debug)

    jobs = []
    for n in args.jobs:
        j = find_by_job_number(args.job_dir, n)
        if j is None:
            sys.exit('job {} not found'.format(n))
        jobs.append(j)
    name = jobs[0].training_parameters.get('set')
    _, testset = get_dataset(name, splits=['test'], size=args.dataset_size)

    key = jax.random.PRNGKey(0)
    all_scores, all_posts, all_nkl = [], [], []
    y = None
    for j in jobs:
        s, y, post, nkl = _scores(j, testset, args.batch_size, key)
        all_scores.append(s)
        all_posts.append(post)
        all_nkl.append(nkl)
        acc = (s.argmax(0) == y).mean()
        print('job {:>6}: accuracy {:.2%}'.format(j.job_number, acc))

    def _inputs(m, idx, scores=all_scores, nkl=all_nkl):
        """combine inputs for method m over the models at idx — the one
        place that knows each method's score source and sign"""
        if m == 'joint':
            return [-scores[i] for i in idx]
        if m == 'mean~':
            return [nkl[i] for i in idx]
        return [scores[i] for i in idx]

    everyone = list(range(len(jobs)))
    for m in args.methods:
        pred = ensemble_predict(_inputs(m, everyone), m)
        print('ensemble {:>6}: accuracy {:.2%}'.format(m, (pred == y).mean()))

    if args.combos:
        # every k-of-n sub-ensemble (ref results/aggregation.py:241-308);
        # combo named with the reference's agg-type letters (:18)
        import itertools
        # reference agg_type letters (results/aggregation.py:18); elbo/lme/
        # iws are not reference combo types — each gets its own join char
        # (none of the reference's) so no two methods' rows share a name
        letter = {'vote': '&', 'joint': ',', 'mean': '+', 'mean~': '~',
                  'elbo': '|', 'lme': '/', 'iws': '^'}
        for k in sorted(set(args.combos)):
            if not 1 <= k <= len(jobs):
                continue
            for idx in itertools.combinations(everyone, k):
                for m in (args.methods if k > 1 else ['mean']):
                    pred = ensemble_predict(_inputs(m, list(idx)), m)
                    cname = letter.get(m, '+').join(
                        str(jobs[i].job_number) for i in idx)
                    print('combo {:>14}: accuracy {:.2%}'.format(
                        cname, (pred == y).mean()))

    print('\nlatent mutual information (nats):')
    for i in range(len(jobs)):
        row = ['{:.3f}'.format(compute_latent_mutual_info(all_posts[i],
                                                          all_posts[k]))
               for k in range(len(jobs))]
        print('  job {:>6}: {}'.format(jobs[i].job_number, ' '.join(row)))

    if args.record:
        if len(jobs) != 2:
            sys.exit('--record needs exactly two jobs')
        import os
        from ..evals.aggregation import latent_mutual_info_tensors
        from ..save_load.recorders import LossRecorder, record_filename
        out_dir = os.path.join(
            args.job_dir, name,
            '|'.join(str(n) for n in sorted(args.jobs)))
        os.makedirs(out_dir, exist_ok=True)
        sets = [testset]
        if args.ood:
            for ood_name in testset.same_size:
                if ood_name in args.sets_to_exclude:
                    continue
                try:
                    _, s = get_dataset(ood_name, splits=['test'],
                                       size=args.dataset_size)
                    sets.append(s)
                except Exception:
                    continue
        for s in sets:
            rec = LossRecorder(args.batch_size)
            for i, (x, yb) in enumerate(DataLoader(s, args.batch_size,
                                                   shuffle=False)):
                Im, y_hat = latent_mutual_info_tensors(
                    jobs[0], jobs[1], x, temps=args.temps,
                    key=jax.random.fold_in(key, 31 + i))
                rec.append_batch(
                    **{'Im-{:g}'.format(T): v for T, v in Im.items()},
                    y_=y_hat, y_true=np.asarray(yb))
            path = os.path.join(out_dir, record_filename(s.name))
            rec.save(path)
            print('recorded Im tensors for {} -> {}'.format(s.name, path))

    if args.ood:
        names = [n for n in testset.same_size
                 if n not in args.sets_to_exclude][:3]
        for ood_name in names:
            try:
                _, ood = get_dataset(ood_name, splits=['test'],
                                     size=args.dataset_size)
            except Exception:
                continue
            per = [_scores(j, ood, args.batch_size, jax.random.fold_in(key, 9))
                   for j in jobs]
            ood_scores = [p[0] for p in per]
            ood_nkl = [p[3] for p in per]
            for m in args.methods:
                pi = ensemble_posterior(_inputs(m, everyone), m).max(0)
                po = ensemble_posterior(
                    _inputs(m, everyone, ood_scores, ood_nkl), m).max(0)
                auc = float(auroc_one_sided_exact(jnp.asarray(pi),
                                                  jnp.asarray(po)))
                print('ood {} {}: auroc {:.2%}'.format(ood_name, m, auc))
    return 0


if __name__ == '__main__':
    sys.exit(main())

"""Result tables: flat model dicts -> pandas MultiIndex dataframes.

Re-design of ref ``utils/tables.py``:

- :func:`results_dataframe` (ref :84-350): one row per job, columns grouped
  into (arch | train | accuracy | per-OOD-set AUC/FPR) with a MultiIndex;
- :func:`agg_results` (ref :366-430): groupby over architecture keys with
  mean/std aggregation and job counts;
- :func:`export_losses` (ref :26-83): per-job recorded losses -> .tab file;
- :func:`auto_remove_index`: drop constant index levels (ref :352-364).
"""

import os
from typing import Dict, List, Optional, Sequence

import pandas as pd

DEFAULT_INDEX = ['type', 'set', 'arch_code', 'sigma_train', 'beta', 'gamma',
                 'latent_dim', 'job']

ARCH_COLUMNS = ['features', 'encoder', 'latent_dim', 'decoder', 'upsampler',
                'classifier', 'prior', 'depth', 'width']
TRAIN_COLUMNS = ['beta', 'gamma', 'sigma', 'latent_sampling', 'optim', 'lr',
                 'batch_size', 'done', 'epochs', 'finished']


def results_dataframe(models: List[Dict], index: Optional[Sequence[str]] = None,
                      ood: bool = True, tpr: int = 95, tnr: bool = False,
                      sort_index: bool = True) -> pd.DataFrame:
    """Rows = jobs; columns = (group, key) MultiIndex.

    ``tpr`` selects which kept-TPR level's FPR column appears (the
    reference's per-table tpr option, results/__main__.py); ``tnr`` shows
    1-FPR under a 'tnr' group instead (ref test.py --tnr);
    ``sort_index=False`` keeps the caller's model order (--sort/--last)."""
    if not models:
        return pd.DataFrame()
    index = list(index or DEFAULT_INDEX)
    rows = []
    for m in models:
        row = {}
        for k in index:
            row[('index', k)] = m.get(k)
        for k in ARCH_COLUMNS:
            row[('arch', k)] = m.get(k)
        for k in TRAIN_COLUMNS:
            row[('train', k)] = m.get(k)
        for k, v in m.items():
            if k == 'accuracy':
                row[('accuracy', 'best')] = v
            elif k == 'accuracy_epoch':
                # an epoch number, not an accuracy — keep it out of the
                # metric group so agg_results never averages epochs
                row[('train', 'acc_epoch')] = v
            elif k.startswith('accuracy_'):
                row[('accuracy', k[len('accuracy_'):])] = v
        if ood:
            fpr_suffix = '_fpr{}'.format(tpr)
            for k, v in m.items():
                if k.startswith('ood_') and k.endswith('_auc'):
                    row[('auc', k[4:-4])] = v
                elif k.startswith('ood_') and k.endswith(fpr_suffix):
                    s = k[4:-len(fpr_suffix)]
                    if tnr:
                        row[('tnr{}'.format(tpr), s)] = (
                            1.0 - v if v is not None else None)
                    else:
                        row[('fpr{}'.format(tpr), s)] = v
        rows.append(row)
    df = pd.DataFrame(rows)
    df.columns = pd.MultiIndex.from_tuples(df.columns)
    idx_cols = [('index', k) for k in index if ('index', k) in df.columns]
    df = df.set_index(idx_cols)
    df.index.names = [k for _, k in idx_cols]
    return df.sort_index() if sort_index else df


def auto_remove_index(df: pd.DataFrame, keep: Sequence[str] = ('job',)
                      ) -> pd.DataFrame:
    """Drop index levels with a single unique value (ref tables.py:352-364)."""
    to_drop = [n for n in df.index.names
               if n not in keep
               and df.index.get_level_values(n).nunique() <= 1]
    if len(to_drop) == len(df.index.names):
        to_drop = to_drop[:-1]
    return df.droplevel(to_drop) if to_drop else df


def agg_results(df: pd.DataFrame, group_by: Optional[Sequence[str]] = None,
                metrics_groups: Sequence[str] = ('accuracy', 'auc')
                ) -> pd.DataFrame:
    """mean/std/count per architecture group (ref tables.py:366-430).

    Any ``fpr<NN>``/``tnr<NN>`` column group counts as a metric regardless
    of the table's selected TPR level (tnr=True tables must not lose their
    OOD columns in aggregation)."""
    if df.empty:
        return df
    group_by = [n for n in (group_by or [n for n in df.index.names
                                         if n != 'job'])
                if n in df.index.names]
    metric_cols = [c for c in df.columns
                   if c[0] in metrics_groups
                   or c[0].startswith(('fpr', 'tnr'))]
    if not metric_cols or not group_by:
        return df
    g = df[metric_cols].groupby(level=group_by)
    agg = pd.concat({'mean': g.mean(), 'std': g.std(), 'count': g.count()},
                    axis=1)
    return agg


def export_losses(recorder, path: str, keys: Optional[Sequence[str]] = None):
    """Recorded per-item losses -> whitespace .tab file (ref tables.py:26-83)."""
    keys = list(keys or recorder.keys())
    cols = {}
    for k in keys:
        v = recorder.get(k)
        if v.ndim == 1:
            cols[k] = v
        else:
            for c in range(v.shape[0]):
                cols['{}_{}'.format(k, c)] = v[c]
    df = pd.DataFrame(cols)
    os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
    df.to_csv(path, sep=' ', index=False, float_format='%.6g')
    return df

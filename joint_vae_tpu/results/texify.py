"""LaTeX table export (re-design of ref ``utils/texify.py``).

:class:`TexTab` renders rows/cells with column formats, multicolumn headers
and midrules (ref TexTab, texify.py:538-790);
:func:`texify_test_results_df` turns a results dataframe into a .tex tabular
(ref texify.py:181-536, simplified: values formatted per column group,
percent columns in 10^-2).
"""

import os
from typing import List, Optional

import numpy as np
import pandas as pd


def texify_str(s) -> str:
    s = str(s)
    for a, b in (('_', r'\_'), ('%', r'\%'), ('#', r'\#'), ('&', r'\&')):
        s = s.replace(a, b)
    return s


class TexTab:
    """Minimal LaTeX tabular builder."""

    def __init__(self, *col_format: str, float_format: str = '{:.3g}'):
        self.col_format = list(col_format)
        self.float_format = float_format
        self._rows: List = []

    def append_cell(self, value, row: int, formatter: Optional[str] = None,
                    multicol: int = 1):
        while len(self._rows) <= row:
            self._rows.append([])
        if isinstance(value, float):
            txt = (formatter or self.float_format).format(value)
        else:
            txt = texify_str(value)
        if multicol > 1:
            txt = r'\multicolumn{%d}{c}{%s}' % (multicol, txt)
        self._rows[row].append(txt)

    def add_midrule(self, row: int):
        while len(self._rows) <= row:
            self._rows.append([])
        self._rows.insert(row, r'\midrule')

    def render(self) -> str:
        lines = [r'\begin{tabular}{%s}' % ''.join(self.col_format),
                 r'\toprule']
        for r in self._rows:
            if isinstance(r, str):
                lines.append(r)
            elif r:
                lines.append(' & '.join(r) + r' \\')
        lines += [r'\bottomrule', r'\end{tabular}']
        return '\n'.join(lines)

    def save(self, path: str):
        os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
        with open(path, 'w') as f:
            f.write(self.render() + '\n')


PERCENT_GROUPS = ('accuracy', 'auc')


def _is_percent_group(group) -> bool:
    return group in PERCENT_GROUPS or str(group).startswith('fpr')


def texify_test_results_df(df: pd.DataFrame, dataset: Optional[str] = None,
                           tex_file: Optional[str] = None,
                           tab_file: Optional[str] = None) -> str:
    """Dataframe -> LaTeX tabular string (+ optional .tex/.tab files)."""
    if df.empty:
        return ''
    ncols = df.index.nlevels + len(df.columns)
    tab = TexTab(*(['l'] * df.index.nlevels + ['r'] * len(df.columns)))

    # header rows: group line + key line
    row = 0
    for name in (df.index.names or []):
        tab.append_cell(name or '', row)
    if isinstance(df.columns, pd.MultiIndex):
        groups: List = []
        for g, k in df.columns:
            if groups and groups[-1][0] == g:
                groups[-1][1] += 1
            else:
                groups.append([g, 1])
        for _ in range(df.index.nlevels - len(df.index.names or [])):
            tab.append_cell('', row)
        for g, n in groups:
            tab.append_cell(g, row, multicol=n)
        row += 1
        for _ in range(df.index.nlevels):
            tab.append_cell('', row)
        for col in df.columns:
            tab.append_cell(col[-1], row)
    else:
        for col in df.columns:
            tab.append_cell(str(col), row)
    row += 1
    tab.add_midrule(row)
    row += 1

    for idx, r in df.iterrows():
        idx = idx if isinstance(idx, tuple) else (idx,)
        for v in idx:
            tab.append_cell(v, row)
        for col, v in zip(df.columns, r.values):
            group = col[0] if isinstance(col, tuple) else ''
            if isinstance(v, (float, np.floating)) and not np.isnan(v):
                if _is_percent_group(group):
                    tab.append_cell(100 * float(v), row, formatter='{:.1f}')
                else:
                    tab.append_cell(float(v), row)
            else:
                tab.append_cell('' if (isinstance(v, float) and np.isnan(v))
                                else v, row)
        row += 1

    out = tab.render()
    if tex_file:
        tab.save(tex_file)
    if tab_file:
        os.makedirs(os.path.dirname(tab_file) or '.', exist_ok=True)
        df.to_csv(tab_file, sep=' ', float_format='%.4g')
    return out

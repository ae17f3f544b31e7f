"""Live epoch output: grouped-column progress rows to stdout and per-job
.out files (ref EpochOutput, utils/print_log.py:50-344).

Simplified re-design: one refresh line per call with column groups
(losses | metrics | accuracy | fpr), carriage-return refresh within an
epoch, newline at epoch end.  Also rotating-file logging setup
(ref utils/parameters.py:72-148)."""

import logging
import logging.handlers
import os
import sys
from typing import Dict, Optional


def _fmt(v) -> str:
    try:
        v = float(v)
    except (TypeError, ValueError):
        return str(v)[:8].rjust(8)
    if v != v:  # nan
        return '     -- '
    if v == 0:
        return '     0  '
    if abs(v) >= 1e4 or abs(v) < 1e-3:
        return '{:8.1e}'.format(v)
    return '{:8.4g}'.format(v)


class EpochOutput:
    """results(i, per_epoch, epoch, epochs, ...) renders one status row."""

    def __init__(self, stdout: bool = True):
        self.streams: list = [sys.stdout] if stdout else []
        self.files: list = []

    def add_file(self, path: str):
        os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
        f = open(path, 'a')
        self.files.append(f)
        return f

    def close(self):
        for f in self.files:
            f.close()
        self.files = []

    def results(self, i: int, per_epoch: int, epoch: int, epochs: int,
                preambule: str = '',
                losses: Optional[Dict[str, float]] = None,
                metrics: Optional[Dict[str, float]] = None,
                accuracy: Optional[Dict[str, float]] = None,
                fpr: Optional[Dict[str, float]] = None,
                time_per_i: float = 0.0,
                batch_size: int = 0,
                end_of_epoch: str = '\n'):
        parts = ['{:>10}'.format(preambule[:10]),
                 '{:4d}/{:<4d}'.format(epoch, epochs),
                 '{:5d}/{:<5d}'.format(i + 1, per_epoch)]
        for group, d in (('loss', losses), ('m', metrics),
                         ('acc', accuracy), ('fpr', fpr)):
            if d:
                cells = ' '.join('{}:{}'.format(k[:8], _fmt(v).strip())
                                 for k, v in d.items())
                parts.append('| {} '.format(cells))
        if time_per_i:
            ips = batch_size / time_per_i if time_per_i else float('nan')
            parts.append('| {:7.1f} im/s'.format(ips))
        line = ' '.join(parts)

        last = i + 1 >= per_epoch
        for s in self.streams:
            end = end_of_epoch if last else '\r'
            try:
                s.write(line + end)
                s.flush()
            except ValueError:
                pass
        if last:
            for f in self.files:
                f.write(line + '\n')
                f.flush()


def set_log(verbose: int = 0, debug: bool = False, log_dir: Optional[str] = None,
            job_number: Optional[int] = None, name: str = 'jvt'):
    """Root logger with stream + optional rotating file handlers
    (ref utils/parameters.py:72-148)."""
    level = logging.DEBUG if debug else (logging.INFO if verbose
                                         else logging.WARNING)
    root = logging.getLogger()
    root.setLevel(level)
    if not any(isinstance(h, logging.StreamHandler) for h in root.handlers):
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter(
            '[%(levelname).1s %(asctime)s %(name)s] %(message)s', '%H:%M:%S'))
        root.addHandler(h)
    if log_dir:
        os.makedirs(log_dir, exist_ok=True)
        fname = '{}{}.log'.format(name, '-{}'.format(job_number)
                                  if job_number is not None else '')
        fh = logging.handlers.RotatingFileHandler(
            os.path.join(log_dir, fname), maxBytes=2 ** 20, backupCount=3)
        fh.setFormatter(logging.Formatter(
            '[%(levelname).1s %(asctime)s] %(message)s'))
        root.addHandler(fh)
    return root


def texify_str(s, num=False):
    """Minimal LaTeX-escaping helper (ref utils/print_log.texify_str)."""
    s = str(s)
    for a, b in (('_', r'\_'), ('%', r'\%'), ('#', r'\#')):
        s = s.replace(a, b)
    return s

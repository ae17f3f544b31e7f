"""Regressions for the eighth code-review batch (results/parallel/infra).

Covers: tnr columns surviving aggregation, agg-table percent formatting and
best-bolding through the ('mean', group, set) column shape, Im-key
temperature parsing, registry-lock ownership on exit, set_log idempotence,
and the live-table header tracking the time column.
"""

import io
import logging
import os
import tempfile

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.slow


# -- agg_results keeps tnr columns -----------------------------------------


def _df():
    cols = pd.MultiIndex.from_tuples([
        ('accuracy', 'esty'), ('auc', 'svhn'), ('tnr95', 'svhn')])
    idx = pd.MultiIndex.from_tuples(
        [('a', 1), ('a', 2), ('b', 3)], names=['arch', 'job'])
    return pd.DataFrame([[0.9, 0.8, 0.7], [0.92, 0.82, 0.72],
                         [0.5, 0.5, 0.5]], index=idx, columns=cols)


def test_agg_results_keeps_tnr_columns():
    from joint_vae_tpu.results.tables import agg_results
    agg = agg_results(_df())
    groups = {c[1] for c in agg.columns}
    assert 'tnr95' in groups, agg.columns


def test_texify_agg_table_percent_and_bold():
    from joint_vae_tpu.results.tables import agg_results
    from joint_vae_tpu.results.texify import texify_test_results_df
    agg = agg_results(_df())
    out = texify_test_results_df(agg, best_in_group=True)
    # percent scaling applied to mean accuracy (91.0 = mean of .90/.92)
    assert '91.0' in out, out
    # counts stay raw integers-ish, never percent-scaled to 200
    assert '200' not in out
    # best-in-group bolding lands on the better arch's mean
    assert '\\bfseries' in out or 'bf' in out


def test_texify_plain_table_tnr_is_percent():
    from joint_vae_tpu.results.texify import texify_test_results_df
    out = texify_test_results_df(_df(), best_in_group=True)
    assert '70.0' in out, out          # 0.7 tnr -> percent


# -- Im-key temperature parsing ---------------------------------------------


def test_im_keys_scientific_and_negative():
    from joint_vae_tpu.results.mutual_info import _im_keys

    class R:
        def keys(self):
            return ['Im-5e-05', 'Im-5', 'Im--2', 'y_true']

    out = _im_keys(R())
    assert out == {5e-05: 'Im-5e-05', 5.0: 'Im-5', -2.0: 'Im--2'}


# -- registry lock: exit only removes an owned lock -------------------------


def test_lock_exit_spares_foreign_lock():
    from joint_vae_tpu.save_load.fetch import _Lock
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, 'registry.json')
        lk = _Lock(p, timeout=1.0)
        with lk:
            # simulate: our stale lock was broken and another process
            # acquired its own
            with open(lk.path, 'w') as f:
                f.write('someone-else')
        assert os.path.exists(lk.path), 'foreign lock must survive our exit'
        os.unlink(lk.path)
        # normal path: own lock removed
        with lk:
            pass
        assert not os.path.exists(lk.path)


# -- set_log idempotence -----------------------------------------------------


def test_set_log_idempotent_handlers():
    from joint_vae_tpu.utils.print_log import set_log
    root = logging.getLogger()
    before = list(root.handlers)
    try:
        with tempfile.TemporaryDirectory() as d:
            set_log(1, log_dir=d, job_number=7)
            set_log(1, log_dir=d, job_number=7)
            fhs = [h for h in root.handlers
                   if isinstance(h, logging.FileHandler)
                   and 'jvt-7.log' in getattr(h, 'baseFilename', '')]
            assert len(fhs) == 1, fhs
            # console handler present even though a file handler exists
            consoles = [h for h in root.handlers
                        if isinstance(h, logging.StreamHandler)
                        and not isinstance(h, logging.FileHandler)]
            assert consoles
    finally:
        for h in list(root.handlers):
            if h not in before:
                root.removeHandler(h)
                h.close()


# -- live table: time column participates in the header signature -----------


def test_epoch_output_header_tracks_time_column():
    from joint_vae_tpu.utils.print_log import EpochOutput
    buf = io.StringIO()
    out = EpochOutput(stdout=False, ansi=False)
    out.streams.append(buf)
    losses = {'total': 1.0}
    out.results(0, 2, 1, 1, preambule='train', losses=losses, time_per_i=0.0)
    out.results(1, 2, 1, 1, preambule='train', losses=losses, time_per_i=0.5,
                batch_size=8)
    text = buf.getvalue()
    assert text.count('total') >= 2, text   # header reprinted for im/s rows
    assert 'im/s' in text


# -- shard_map step accepts donate=False for reuse-style callers -------------


def test_shard_map_step_donate_flag():
    import inspect

    from joint_vae_tpu.parallel.shard_steps import make_shard_map_train_step
    assert 'donate' in inspect.signature(make_shard_map_train_step).parameters

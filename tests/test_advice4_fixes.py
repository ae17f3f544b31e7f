"""Regressions for the round-3 advisor findings (ADVICE.md).

Covers: batch import/export CLIs exiting nonzero on PARTIAL failure,
enable_compilation_cache accepting the common falsy spellings, and the
saved -agg.tab being aggregated from the full frame (not the -e
display-pruned one).
"""

import os

import pytest


def test_import_ref_partial_failure_exits_nonzero(monkeypatch, tmp_path):
    """One failed job out of N must yield exit code 1 (previously 0 unless
    EVERY job failed, silently losing jobs in scripted conversions)."""
    import joint_vae_tpu.cli.import_ref as I
    monkeypatch.setattr(I, 'convert_job_batch', lambda *a, **k: (3, 1))
    rc = I.main(['srcdir', '--job-dir', str(tmp_path)])
    assert rc == 1
    monkeypatch.setattr(I, 'convert_job_batch', lambda *a, **k: (4, 0))
    assert I.main(['srcdir', '--job-dir', str(tmp_path)]) == 0


def test_export_ref_partial_failure_exits_nonzero(monkeypatch, tmp_path):
    import joint_vae_tpu.cli.export_ref as E
    monkeypatch.setattr(E, 'convert_job_batch', lambda *a, **k: (3, 1))
    assert E.main(['srcdir', '--out', str(tmp_path)]) == 1
    monkeypatch.setattr(E, 'convert_job_batch', lambda *a, **k: (4, 0))
    assert E.main(['srcdir', '--out', str(tmp_path)]) == 0


@pytest.mark.parametrize('spelling', ['0', 'off', 'false', 'FALSE', 'no',
                                      'None', ' Off ', 'disabled'])
def test_compile_cache_falsy_spellings(monkeypatch, tmp_path, spelling):
    """JVT_COMPILE_CACHE=false must disable the cache, not create a
    directory literally named 'false' (round-3 advisor)."""
    from joint_vae_tpu.utils.device import enable_compilation_cache
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv('JVT_COMPILE_CACHE', spelling)
    assert enable_compilation_cache() is None
    assert not (tmp_path / spelling.strip()).exists()


def test_compile_cache_explicit_path_still_works(monkeypatch, tmp_path):
    from joint_vae_tpu.utils.device import enable_compilation_cache
    target = str(tmp_path / 'xla-cache')
    monkeypatch.delenv('JVT_COMPILE_CACHE', raising=False)
    assert enable_compilation_cache(target) == target
    assert os.path.isdir(target)


@pytest.mark.slow
def test_saved_agg_tab_uses_full_frame(tmp_path, monkeypatch):
    """The saved -agg.tab must aggregate the FULL results frame; the -e
    pruning is console-display only (round-3 advisor; mirrors
    test_advice3_fixes.test_saved_tab_keeps_all_columns for the agg)."""
    from joint_vae_tpu.cli.train import main as train_main
    job_dir = str(tmp_path / 'jobs')
    args = ['--dataset', 'mnist', '--type', 'cvae', '--epochs', '1',
            '--batch-size', '32', '--test-batch-size', '64',
            '-K', '8', '--encoder', '32', '--decoder', '32',
            '--classifier', '8', '--gamma', '100', '--sigma', '0.3',
            '--test-latent-sampling', '2', '--dataset-size', '96',
            '--validation', '32', '--oodsets', 'fashion',
            '--job-dir', job_dir]
    assert train_main(args) == 0

    import joint_vae_tpu.cli.test as T
    frames = []
    real = T.agg_results

    def spy(df, *a, **kw):
        frames.append(df)
        return real(df, *a, **kw)

    monkeypatch.setattr(T, 'agg_results', spy)
    res_dir = str(tmp_path / 'res')
    assert T.main(['--job-dir', job_dir, '--agg',
                   '--results-directory', res_dir,
                   '--results-file', 'out']) == 0
    assert os.path.exists(os.path.join(res_dir, 'out-agg.tab'))
    # the save path must have aggregated a frame that still carries the
    # display-pruned arch/train columns (e.g. 'optim')
    assert any(any(c[0] not in ('accuracy', 'auc')
                   and not c[0].startswith(('fpr', 'tnr'))
                   for c in df.columns)
               for df in frames), 'saved agg computed only from pruned frame'

"""Serving CLI (VERDICT r4 item 6): scores image dirs / arrays through the
compiled Scorer, emits JSON lines + a summary, exits 3 on reject-rate
anomalies."""

import json
import os

import numpy as np
import pytest

import jax

from joint_vae_tpu.data.loaders import ArrayDataset
from joint_vae_tpu.evals.engines import ood_detection_rates
from joint_vae_tpu.models.cvnet import CVNetConfig
from joint_vae_tpu.ops.sigma import SigmaConfig
from joint_vae_tpu.save_load.jobs import new_job, save_job

INPUT_SHAPE = (3, 6, 6)
C = 3


def _ds(name, n=64, noise=False, seed=0):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, C, n).astype(np.int32)
    if noise:
        x = rng.uniform(0, 1, (n, *INPUT_SHAPE)).astype(np.float32)
    else:
        base = np.linspace(0.2, 0.8, C)[y][:, None, None, None]
        x = np.clip(base + 0.05 * rng.standard_normal((n, *INPUT_SHAPE)),
                    0, 1).astype(np.float32)
    return ArrayDataset(x, y, name)


@pytest.fixture(scope='module')
def job_dir(tmp_path_factory):
    # nested one level: tests resolving by job number walk dirname(job_dir),
    # which must be THIS module's root, not the shared pytest tmp root
    # (other modules' job dirs there can carry the same job number)
    d = os.path.join(str(tmp_path_factory.mktemp('servejob')), 'job')
    cfg = CVNetConfig(input_shape=INPUT_SHAPE, num_labels=C, type='cvae',
                      encoder=(16,), decoder=(16,), classifier=(8,),
                      latent_dim=4, latent_sampling=1,
                      test_latent_sampling=2, gamma=10.0, beta=1e-2,
                      sigma=SigmaConfig(value=0.3))
    job = new_job(cfg, key=jax.random.PRNGKey(0))
    job.train_history = {'epochs': 1}
    job.training_parameters['set'] = 'blobs'
    # calibrate the gate: stored ood.json thresholds feed the Scorer
    ood_detection_rates(job, _ds('blobs'), [_ds('noise', noise=True, seed=5)],
                        batch_size=32, method=['elbo'], recording=False)
    save_job(job, d)
    return d


def _run(argv):
    from joint_vae_tpu.cli.serve import main
    return main(argv + ['--platform', 'cpu'])


def test_serve_cli_scores_images_and_arrays(job_dir, tmp_path, capsys):
    from PIL import Image
    img_dir = tmp_path / 'imgs'
    os.makedirs(img_dir)
    rng = np.random.default_rng(1)
    for i in range(3):
        a = (rng.uniform(0, 255, (6, 6, 3))).astype(np.uint8)
        Image.fromarray(a).save(str(img_dir / 'im{}.png'.format(i)))
    npy = tmp_path / 'batch.npy'
    np.save(npy, _ds('blobs', n=5, seed=2).data)

    rc = _run([job_dir, str(img_dir), str(npy), '--batch-size', '4'])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.startswith('{')]
    summary = lines[-1]
    assert summary['summary'] and summary['n'] == 8
    rows = lines[:-1]
    assert len(rows) == 8
    for r in rows:
        assert 0 <= r['label'] < C
        assert 0.0 <= r['confidence'] <= 1.0
        assert 'elbo' in r['scores']
        assert isinstance(r['in_distribution'], bool)
    # the 5 in-distribution rows came from the calibrated set: mostly kept
    kept = [r['in_distribution'] for r in rows if '.npy' in r['input']]
    assert sum(kept) >= 3


def test_serve_cli_reject_rate_anomaly_exit(job_dir, tmp_path, capsys):
    """OOD uniform noise against a tight --max-reject-rate trips exit 3."""
    npy = tmp_path / 'noise.npy'
    np.save(npy, np.random.default_rng(7).uniform(
        0, 1, (16, *INPUT_SHAPE)).astype(np.float32))
    rc = _run([job_dir, str(npy), '--summary-only',
               '--max-reject-rate', '-0.1'])
    assert rc == 3
    out = [json.loads(l) for l in capsys.readouterr().out.splitlines()
           if l.startswith('{')]
    assert len(out) == 1 and out[0]['summary']


def test_serve_cli_output_file_and_job_number(job_dir, tmp_path, capsys):
    """Job resolution by number (--job-dir walk) + --output FILE."""
    root = os.path.dirname(job_dir)
    npy = tmp_path / 'b.npy'
    np.save(npy, _ds('blobs', n=4, seed=3).data)
    out_path = tmp_path / 'scores.jsonl'
    from joint_vae_tpu.save_load.jobs import load_job
    jn = load_job(job_dir).job_number
    rc = _run([str(jn), str(npy), '--job-dir', root,
               '-o', str(out_path)])
    assert rc == 0
    lines = [json.loads(l) for l in open(out_path)]
    assert len(lines) == 5 and lines[-1]['summary']


def test_default_method_pick_tolerates_mixed_epoch_keys(job_dir, tmp_path,
                                                        capsys):
    """Imported/hand-written ood.json can carry non-int top-level keys;
    the default gate-method pick must filter before sorting."""
    import json as _json
    p = os.path.join(job_dir, 'ood.json')
    with open(p) as f:
        original = f.read()
    try:
        d = _json.loads(original)
        d['note'] = {'not': 'an epoch'}
        with open(p, 'w') as f:
            _json.dump(d, f)
        npy = tmp_path / 'm.npy'
        np.save(npy, _ds('blobs', n=4, seed=9).data)
        rc = _run([job_dir, str(npy), '--summary-only'])
    finally:
        # job_dir is module-scoped: never leak the junk key to later tests
        with open(p, 'w') as f:
            f.write(original)
    assert rc == 0
    out = [l for l in capsys.readouterr().out.splitlines()
           if l.startswith('{')]
    assert _json.loads(out[-1])['methods'] == ['elbo']

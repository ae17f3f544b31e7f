"""Signal stop levels, EpochOutput rendering, trainer break behavior."""

import io
import signal

import numpy as np
import jax

from joint_vae_tpu.data.loaders import ArrayDataset
from joint_vae_tpu.models.cvnet import CVNetConfig
from joint_vae_tpu.ops.sigma import SigmaConfig
from joint_vae_tpu.save_load.jobs import new_job
from joint_vae_tpu.train.trainer import train_model
from joint_vae_tpu.utils.print_log import EpochOutput, _fmt
from joint_vae_tpu.utils.signaling import SIGHandler


def test_sig_levels():
    h = SIGHandler()
    assert h.sig == 0
    h(signal.SIGINT, None)
    assert h.sig == 2          # first Ctrl-C: stop after epoch-ish
    h(signal.SIGINT, None)
    assert h.sig == 4          # second: abort
    h2 = SIGHandler()
    h2(signal.SIGTERM, None)
    assert h2.sig == 3
    if hasattr(signal, 'SIGUSR1'):
        h3 = SIGHandler()
        h3(signal.SIGUSR1, None)
        assert h3.sig == 2


def test_trainer_stops_on_signal():
    cfg = CVNetConfig(input_shape=(1, 6, 6), num_labels=3, type='vae',
                      encoder=(8,), decoder=(8,), latent_dim=2,
                      latent_sampling=1, sigma=SigmaConfig(value=0.5))
    job = new_job(cfg, key=jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    ds = ArrayDataset(rng.uniform(0, 1, (64, 1, 6, 6)).astype(np.float32),
                      rng.integers(0, 3, 64).astype(np.int32), 'd')

    class Stop:
        sig = 3                 # stop before any epoch completes

    train_model(job, ds, None, [], epochs=5, batch_size=32,
                signal_handler=Stop(), outputs=EpochOutput(stdout=False))
    assert job.trained == 0     # broke immediately


def test_epoch_output_rendering():
    out = EpochOutput(stdout=False)
    buf = io.StringIO()
    out.streams = [buf]
    out.results(0, 2, 1, 10, preambule='train',
                losses={'total': 1.2345, 'kl': float('nan')},
                metrics={'rmse': 0.01},
                time_per_i=0.5, batch_size=64)
    out.results(1, 2, 1, 10, preambule='train',
                losses={'total': 1.0}, end_of_epoch='\n')
    s = buf.getvalue()
    assert 'train' in s and 'total' in s
    assert s.endswith('\n')      # epoch end newline
    assert '--' in s             # nan rendered as --


def test_fmt():
    assert _fmt(float('nan')).strip() == '--'
    assert '1.234' in _fmt(1.2345)
    assert 'e' in _fmt(1e-7)

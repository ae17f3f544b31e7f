"""Real-data dry-dock drill (VERDICT r4 item 7): for EVERY registered
on-disk format, fabricate byte-exact fixtures (scripts/prepare_data.py
make-fixtures), then run the FULL loop — get_dataset(require_real=True)
-> train 1 epoch -> OOD detection — so the first contact with a real
$JVT_DATA_DIR is derisked end-to-end, not just at the reader.

Formats (ref utils/torch_load.py:150-309): MNIST idx (gz train / raw
test variants, shared by fashion + EMNIST letters with its y-1 and
rotate/flip transforms), CIFAR-10 batch pickles, CIFAR-100 fine_labels
pickle, SVHN .mat, DTD split files, LSUN exported folders (crop +
resize), random300k .npy, ImageFolder restricted by wnid class file.
"""

import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax

import joint_vae_tpu.data.loaders as loaders
from joint_vae_tpu.data.loaders import ArrayDataset
from joint_vae_tpu.evals.engines import ood_detection_rates
from joint_vae_tpu.models.cvnet import CVNetConfig
from joint_vae_tpu.ops.priors import PriorConfig
from joint_vae_tpu.ops.sigma import SigmaConfig
from joint_vae_tpu.save_load.jobs import new_job
from joint_vae_tpu.train.optimizers import OptimizerConfig
from joint_vae_tpu.train.trainer import train_model
from joint_vae_tpu.utils.print_log import EpochOutput


@pytest.fixture(scope='module')
def data_dir(tmp_path_factory):
    from scripts.prepare_data import cmd_make_fixtures

    class A:
        pass
    a = A()
    d = str(tmp_path_factory.mktemp('drill'))
    a.data_dir = d
    cmd_make_fixtures(a)
    old = loaders.DATA_DIR
    loaders.DATA_DIR = d
    loaders._cache.clear()
    yield d
    loaders.DATA_DIR = old
    loaders._cache.clear()


# (set name, expected test-set size); every entry reads REAL fixture bytes
DRILL_SETS = [
    ('mnist', 8),
    ('fashion', 8),
    ('letters', 8),          # y-1 target transform + rotate-270/hflip
    ('cifar10', 16),
    ('cifar100', 8),
    ('svhn', 8),
    ('dtd', 4),              # test1 + val1 concat
    ('lsunc', 4),
    ('lsunr', 4),
    ('imagenet2', 4),        # wnid-restricted ImageFolder, val split
]


def _job_for(ts):
    c = max(2, len(ts.classes or []) or int(ts.targets.max()) + 1)
    cfg = CVNetConfig(
        input_shape=ts.shape, num_labels=c, type='cvae',
        encoder=(8,), decoder=(8,), classifier=(8,),
        latent_dim=4, latent_sampling=1, test_latent_sampling=2,
        gamma=10.0, beta=1e-2, sigma=SigmaConfig(value=0.3),
        prior=PriorConfig(dim=4, num_priors=c, init_mean=1.0))
    return new_job(cfg, OptimizerConfig(lr=1e-3),
                   key=jax.random.PRNGKey(0))


@pytest.mark.parametrize('name,n_test', DRILL_SETS)
def test_full_loop_on_real_format(data_dir, name, n_test):
    loaders._cache.clear()
    tr, ts = loaders.get_dataset(name, require_real=True)
    assert not tr.synthetic and not ts.synthetic, name
    assert len(ts) == n_test, (name, len(ts))
    assert tr.data.dtype in (np.float32, np.uint8)
    y = np.asarray(ts.targets)
    assert y.min() >= 0, name                       # letters y-1 applied

    job = _job_for(ts)
    job.training_parameters['set'] = name
    train_model(job, tr, None, None, epochs=1, batch_size=2,
                test_batch_size=4, full_test_every=100,
                ood_detection_every=100, final_test=False, final_ood=False,
                outputs=EpochOutput(stdout=False))
    assert job.trained == 1
    total = job.train_history[1]['train_loss']['total']
    assert np.isfinite(total), (name, total)

    rng = np.random.default_rng(3)
    ood = ArrayDataset(
        rng.uniform(0, 1, (n_test, *ts.shape)).astype(np.float32),
        np.zeros(n_test, np.int32), 'drill-noise')
    rates = ood_detection_rates(job, ts, [ood], batch_size=4,
                                method=['elbo'], recording=False)
    auc = rates['drill-noise']['elbo']['auc']
    assert np.isfinite(auc) and 0.0 <= auc <= 1.0, (name, auc)


def test_imagenet_wnid_restriction_and_val_split(data_dir):
    """The decoy class not listed in data/imagenet2.txt is excluded; the
    'test' request reads the val/ directory of the ImageNet layout."""
    loaders._cache.clear()
    tr, ts = loaders.get_dataset('imagenet2', require_real=True)
    assert set(np.unique(tr.targets)) == {0, 1}     # 2 wnids, no decoy
    assert len(tr) == 6 and len(ts) == 4            # 3+2 per listed wnid
    assert ts.shape == (3, 224, 224)

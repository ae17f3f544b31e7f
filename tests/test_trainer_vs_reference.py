"""Full-training-loop trajectory oracle against the reference's own
``train_model`` (VERDICT r4 item 2; ref cvae.py:2081-2547).

Every piece is oracled elsewhere (per-batch evaluate, 12-step optimizer
trajectories, sigma update sequences); THIS test pins the composite:
update ordering, when sigma and the warmup ramps are applied relative to
the step, the validation split, per-epoch LR decay — by running the
reference's actual ``train_model`` for 3 epochs on a tiny cvae with
matched init and injected ε, then our ``train_model`` on the same data,
and comparing the per-epoch loss history, the sigma trajectory, and the
final prior-mean state.

Determinism controls (documented deviations, applied to BOTH sides):

- identical init via the weight-transfer machinery
  (test_evaluate_vs_reference._transfer);
- ε injection: a deterministic shape-keyed table replaces torch.randn on
  the reference side (Sampling zeroes ε[0] itself, layers.py:238) and
  ``reparameterize`` on ours — every forward of a given shape consumes
  the same ε on both sides;
- shuffling disabled on both loaders (the shufflers' RNG streams differ
  by construction; data ORDER equality is what the trajectory needs —
  the shuffler itself is covered by tests/test_data.py);
- the validation split patched to a deterministic first-k split on both
  sides (torch random_split and our permutation split use different RNGs;
  the seeded-split mechanics are covered by tests/test_trainer.py);
- the reference's ``available_results`` stubbed to plan 'compute' (a
  fresh in-memory net has no ``saved_dir``, ref dictify.py:292 would
  crash; the 3-tier planner is oracled in test_planner_reuse.py).
"""

import copy
import sys
import zlib

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from joint_vae_tpu.data.loaders import ArrayDataset
from joint_vae_tpu.models.cvnet import CVNetConfig
from joint_vae_tpu.ops.priors import build_prior_config
from joint_vae_tpu.ops.sigma import SigmaConfig, sigma_value
from joint_vae_tpu.save_load.jobs import new_job
from joint_vae_tpu.train.optimizers import OptimizerConfig
from joint_vae_tpu.utils.print_log import EpochOutput

torch = pytest.importorskip('torch')

from test_evaluate_vs_reference import _stub_torchvision, _transfer  # noqa: E402

IN_SHAPE = (1, 8, 8)
C, K = 4, 6
N_ALL, N_VALID, N_TEST = 80, 16, 32      # train = 64 = 4 batches of 16
BS, TBS = 16, 16                          # <= the reference's hard-coded
                                          # max_batch_sizes (cvae.py:1147)
EPOCHS = 3
WARMUP = [0, 2]                           # beta ramp active epochs 0..2
WARMUP_G = [1, 2]                         # gamma ramp starts at epoch 1
LR, LR_DECAY = 1e-3, 0.2
L_TRAIN, L_TEST = 2, 3
SIGMA = dict(value=0.5, decay=0.2, reach=1.0)   # decay-to-rmse schedule
PRIOR = dict(num_priors=C, init_mean=1.0, learned_means=True)


def _raw_eps(shape):
    """Deterministic shape-keyed noise; BOTH sides consume these values."""
    seed = zlib.crc32(repr(tuple(shape)).encode()) & 0xffffffff
    return np.random.default_rng(seed).standard_normal(shape).astype(
        np.float32)


def _data(n, seed):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, C, n).astype(np.int64)
    base = np.linspace(0.2, 0.8, C)[y][:, None, None, None]
    x = np.clip(base + 0.08 * rng.standard_normal((n,) + IN_SHAPE),
                0, 1).astype(np.float32)
    return x, y


class _TSet(torch.utils.data.Dataset):
    def __init__(self, x, y, name):
        self.x = torch.tensor(x)
        self.y = torch.tensor(y)
        self.name = name
        self.transformer = 'default'
        self.data = self.x

    def __len__(self):
        return len(self.x)

    def __getitem__(self, i):
        return self.x[i], int(self.y[i])


@pytest.fixture(scope='module')
def ref_mod():
    _stub_torchvision()
    sys.path.insert(0, '/root/reference')
    try:
        import cvae as ref_cvae
    finally:
        sys.path.remove('/root/reference')
    return ref_cvae


def _run_reference(ref_mod, monkeypatch):
    ref = ref_mod.ClassificationVariationalNetwork(
        IN_SHAPE, C, type='cvae', features=None,
        encoder=[16], latent_dim=K, decoder=[16], classifier=[8],
        latent_sampling=L_TRAIN, test_latent_sampling=L_TEST,
        beta=1e-3, gamma=10.0, sigma=dict(SIGMA),
        output_activation='sigmoid',
        prior=dict(PRIOR, distribution='gaussian'),
        optimizer=dict(optim_type='adam', lr=LR, lr_decay=LR_DECAY))
    ref.eval()                      # the x_fake sanity pass must not
                                    # update sigma (cvae.py:769 gate)
    sd0 = copy.deepcopy(ref.state_dict())

    xt, yt = _data(N_ALL, 11)
    xe, ye = _data(N_TEST, 12)
    trainset = _TSet(xt, yt, 'blobs')
    testset = _TSet(xe, ye, 'blobs')

    real_randn = torch.randn

    def fake_randn(*size, **kw):
        if size and not isinstance(size[0], int):
            size = tuple(size[0])
        return torch.tensor(_raw_eps(tuple(size)))

    real_tdl = torch.utils.data.DataLoader
    real_subset = torch.utils.data.Subset

    def no_shuffle_tdl(*a, **kw):
        kw['shuffle'] = False
        return real_tdl(*a, **kw)

    def first_k_split(ds, lengths, generator=None):
        v = lengths[0]
        a = real_subset(ds, list(range(v)))
        b = real_subset(ds, list(range(v, v + lengths[1])))
        return a, b

    def fake_available(model, testset='trained', **kw):
        epoch = kw.get('wanted_epoch', 'last')
        if epoch in ('last', 'min-loss'):
            epoch = model.trained
        return {epoch: {testset: {
            'where': {'json': False, 'recorders': False, 'compute': True},
            'json': {}}}}

    monkeypatch.setattr(torch, 'randn', fake_randn)
    monkeypatch.setattr(torch.utils.data, 'DataLoader', no_shuffle_tdl)
    monkeypatch.setattr(torch.utils.data, 'random_split', first_k_split)
    monkeypatch.setattr(ref_mod, 'available_results', fake_available)
    monkeypatch.setattr(ref_mod.torchdl, 'get_dataset',
                        lambda *a, **kw: (trainset, testset))

    try:
        ref.train_model(trainset=trainset, testset=testset, oodsets=[],
                        epochs=EPOCHS, batch_size=BS, test_batch_size=TBS,
                        validation=N_VALID,
                        warmup=list(WARMUP), warmup_gamma=list(WARMUP_G),
                        full_test_every=100, ood_detection_every=100,
                        save_dir=None)
    finally:
        monkeypatch.setattr(torch, 'randn', real_randn)
    return ref, sd0


def _build_our_job(sd0):
    cfg = CVNetConfig(
        input_shape=IN_SHAPE, num_labels=C, type='cvae',
        encoder=(16,), latent_dim=K, decoder=(16,), classifier=(8,),
        latent_sampling=L_TRAIN, test_latent_sampling=L_TEST,
        beta=1e-3, gamma=10.0, sigma=SigmaConfig(**SIGMA),
        output_activation='sigmoid',
        prior=build_prior_config(K, 'gaussian', **PRIOR))
    job = new_job(cfg, OptimizerConfig(optim_type='adam', lr=LR,
                                       lr_decay=LR_DECAY),
                  key=jax.random.PRNGKey(0))
    params = dict(job.state.params)
    params.update(_transfer(sd0, cfg))
    job.state = job.state.replace(params=params)
    job.training_parameters['set'] = 'blobs'
    return job


def _apply_our_patches(monkeypatch):
    import joint_vae_tpu.models.evaluate as ev
    import joint_vae_tpu.train.trainer as tr

    def fake_reparameterize(key, mu, log_var, L, dist='gaussian',
                            sampled=True):
        e = np.array(_raw_eps((L + 1,) + tuple(mu.shape)))
        e[0] = 0.0                       # ε0 = 0 (ref layers.py:238)
        e = jnp.asarray(e)
        z = mu[None] + jnp.exp(0.5 * log_var)[None] * e * float(sampled)
        return z, e[1:]

    real_dl = tr.DataLoader

    def no_shuffle_dl(ds, bs, **kw):
        kw['shuffle'] = False
        return real_dl(ds, bs, **kw)

    def first_k_split(ds, v, seed):
        if not v:
            return ds, None
        return (ds.subset(np.arange(v, len(ds))),
                ds.subset(np.arange(v)))

    monkeypatch.setattr(ev, 'reparameterize', fake_reparameterize)
    monkeypatch.setattr(tr, 'DataLoader', no_shuffle_dl)
    monkeypatch.setattr(tr, 'split_validation', first_k_split)
    return tr


def _our_train(tr, job, epochs, save_dir=None):
    xt, yt = _data(N_ALL, 11)
    tr.train_model(job, ArrayDataset(xt, yt.astype(np.int32), 'blobs'),
                   None, None, epochs=epochs, batch_size=BS,
                   test_batch_size=TBS, validation=N_VALID,
                   warmup=WARMUP, warmup_gamma=WARMUP_G,
                   full_test_every=100, ood_detection_every=100,
                   final_test=False, final_ood=False, save_dir=save_dir,
                   outputs=EpochOutput(stdout=False))
    return job


def _run_ours(sd0, monkeypatch):
    tr = _apply_our_patches(monkeypatch)
    return _our_train(tr, _build_our_job(sd0), EPOCHS)


@pytest.fixture(scope='module')
def trained_pair(ref_mod):
    # the persistent XLA compile cache serves binaries AOT-compiled for a
    # different machine type in this sandbox (cpu_aot_loader warnings);
    # cache-hit vs fresh-compile runs differ by ulps that compound over 12
    # adam steps to ~1e-2 relative — enough to flip this oracle's
    # tolerances run-to-run.  Compile fresh for the whole module.
    jax.config.update('jax_enable_compilation_cache', False)
    mp = pytest.MonkeyPatch()
    try:
        ref, sd0 = _run_reference(ref_mod, mp)
        job = _run_ours(sd0, mp)
    finally:
        mp.undo()
    yield ref, job, sd0
    jax.config.update('jax_enable_compilation_cache', True)


def test_train_loss_history_matches(trained_pair):
    """Per-epoch per-component train-loss means (the composite of ramps,
    sigma updates, grads, adam, per-epoch LR decay) match the reference
    epoch for epoch (ref history[e] <-> ours history[e+1])."""
    ref, job, _ = trained_pair
    compared = 0
    for e in range(EPOCHS):
        want = ref.train_history[e]['train_loss']
        got = job.train_history[e + 1]['train_loss']
        shared = set(want) & set(got)
        assert {'total', 'kl', 'cross_x', 'cross_y'} <= shared, shared
        for k in sorted(shared):
            # ref train_total_loss['sigma'/'iws'] stay 0 (never in
            # batch_losses during training, cvae.py:2463-2468) while we
            # record the real values — sigma is compared via the
            # train_measures trajectory instead
            if k in ('sigma', 'iws') or not np.isfinite(want[k]):
                continue
            np.testing.assert_allclose(
                got[k], want[k], rtol=1e-2, atol=3e-4,
                err_msg='epoch {} loss {}'.format(e, k))
            compared += 1
    assert compared >= 3 * EPOCHS


def test_validation_loss_history_matches(trained_pair):
    """Validation losses: the reference evaluates label-free and gathers
    at the true label BEFORE each epoch's training (cvae.py:2356-2374);
    ours evaluates with labels AFTER each epoch — ref[e+1] (pre-state of
    epoch e+1 = post-state of epoch e) <-> ours[e+1]."""
    ref, job, _ = trained_pair
    for e in range(1, EPOCHS + 1):
        want = ref.train_history[e]['validation_loss']
        got = job.train_history[e]['validation_loss']
        shared = set(want) & set(got)
        assert {'total', 'kl'} <= shared, shared
        for k in sorted(shared):
            if not np.isfinite(want[k]):
                continue
            np.testing.assert_allclose(
                got[k], want[k], rtol=1e-2, atol=3e-4,
                err_msg='epoch {} validation {}'.format(e, k))


def test_sigma_trajectory_and_final_state(trained_pair):
    """The decay-to-rmse sigma schedule applied inside the composite loop:
    final sigma value + per-epoch recorded sigma measure match."""
    ref, job, _ = trained_pair
    ours = float(sigma_value(job.model_cfg.sigma_cfg,
                             job.state.sigma_state))
    np.testing.assert_allclose(ours, float(ref.sigma.value),
                               rtol=1e-3, err_msg='final sigma')
    # the per-epoch 'sigma' MEASURE is reported one update apart (the
    # reference snapshots the value used by the last batch, ours the value
    # after its update) — the actual sigma trajectory is pinned through
    # the sigma-weighted cross_x loss history above and the final state
    # here; assert only the one-step neighborhood
    for e in range(EPOCHS):
        want = ref.train_history[e].get('train_measures', {}).get('sigma')
        got = job.train_history[e + 1].get('train_measures', {}).get('sigma')
        if want is not None and got is not None:
            assert abs(got - float(want)) <= 0.08 * max(float(want), 0.1), \
                ('epoch {} sigma'.format(e), got, want)


def test_final_prior_and_params_match(trained_pair):
    """End-of-training state parity: the learned prior means (trained
    through the same 12 adam steps) and the encoder head weights."""
    ref, job, _ = trained_pair
    sd = ref.state_dict()
    np.testing.assert_allclose(
        np.asarray(job.state.params['prior']['mean']),
        sd['encoder.prior.mean'].numpy(), rtol=5e-3, atol=1e-4,
        err_msg='prior mean')
    np.testing.assert_allclose(
        np.asarray(job.state.params['encoder']['dense_mean']['kernel']),
        sd['encoder.dense_mean.weight'].numpy().T, rtol=5e-3, atol=5e-4,
        err_msg='encoder mean head')
    # the per-epoch LR decay reached the same final LR
    np.testing.assert_allclose(job.opt_cfg.lr_at_epoch(EPOCHS - 1),
                               LR * (1 - LR_DECAY) ** (EPOCHS - 1),
                               rtol=1e-6)


def test_resume_continues_the_reference_trajectory(trained_pair, tmp_path):
    """Resume parity in the composite: train 2 epochs -> checkpoint ->
    load_job -> train the 3rd epoch.  The per-epoch LR fast-forward
    (lr_at_epoch; ref optimizer.update_scheduler_from_epoch,
    optimizers.py:129), warmup-ramp persistence (training_parameters
    merge) and sigma-state restore must land the resumed run on the SAME
    epoch-3 losses and final state as the reference's continuous 3-epoch
    run."""
    from joint_vae_tpu.save_load.jobs import load_job
    ref, _, sd0 = trained_pair
    mp = pytest.MonkeyPatch()
    try:
        tr = _apply_our_patches(mp)
        d = str(tmp_path / 'job')
        job = _our_train(tr, _build_our_job(sd0), 2, save_dir=d)
        assert job.trained == 2
        job2 = load_job(d)
        assert job2.trained == 2
        assert job2.training_parameters['warmup'] == WARMUP
        _our_train(tr, job2, EPOCHS, save_dir=d)
    finally:
        mp.undo()
    assert job2.trained == EPOCHS
    want = ref.train_history[EPOCHS - 1]['train_loss']
    got = job2.train_history[EPOCHS]['train_loss']
    for k in sorted(set(want) & set(got)):
        if k in ('sigma', 'iws') or not np.isfinite(want[k]):
            continue
        np.testing.assert_allclose(got[k], want[k], rtol=1e-2, atol=3e-4,
                                   err_msg='resumed epoch-3 loss ' + k)
    sd = ref.state_dict()
    np.testing.assert_allclose(
        np.asarray(job2.state.params['prior']['mean']),
        sd['encoder.prior.mean'].numpy(), rtol=5e-3, atol=1e-4,
        err_msg='resumed prior mean')
    np.testing.assert_allclose(
        float(sigma_value(job2.model_cfg.sigma_cfg,
                          job2.state.sigma_state)),
        float(ref.sigma.value), rtol=2e-3, err_msg='resumed sigma')

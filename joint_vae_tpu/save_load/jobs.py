"""Job directories: the filesystem checkpoint/metadata schema.

Mirrors the reference job-dir layout (SURVEY.md 2.4; ref cvae.py:2650-2857):

    <job_dir>/
      params.json        architecture (CVNetConfig.architecture)
      train_params.json  training parameters incl. optimizer
      test.json          accuracy results {epoch: {method: {...}}}
      ood.json           OOD results {epoch: {set: {method: {...}}}}
      history.json       per-epoch training history
      state.npz          model params + batch_stats + sigma state  (.pth -> npz)
      optimizer.npz      optimizer state
      samples/<epoch>/   recorded per-batch loss tensors (recorders.py)
      deleted|derailed   sentinel files
      RESUMED            sentinel: job was resumed into another job number

Loads support a 'ghost' mode that reads only the JSON metadata without
building arrays (ref Shell load, cvae.py:2759-2785) for fast fleet queries.
"""

import dataclasses
import os
import shutil
from typing import Any, Dict, Optional

import jax

from ..models.cvnet import CVNet, CVNetConfig
from ..train.optimizers import OptimizerConfig
from ..train.state import TrainState, create_train_state
from .checkpoint import (save_json, load_json, save_checkpoint,
                         load_checkpoint, unflatten_into)

SENTINELS = ('deleted', 'derailed')


@dataclasses.dataclass
class Job:
    model_cfg: CVNetConfig
    opt_cfg: OptimizerConfig
    state: Optional[TrainState] = None
    training_parameters: Dict[str, Any] = dataclasses.field(default_factory=dict)
    train_history: Dict[str, Any] = dataclasses.field(
        default_factory=lambda: {'epochs': 0})
    testing: Dict[Any, Any] = dataclasses.field(default_factory=dict)
    ood_results: Dict[Any, Any] = dataclasses.field(default_factory=dict)
    job_number: int = 0
    saved_dir: Optional[str] = None

    @property
    def model(self) -> CVNet:
        return CVNet(self.model_cfg)

    @property
    def trained(self) -> int:
        return int(self.train_history.get('epochs', 0))

    def default_training_parameters(self) -> Dict[str, Any]:
        """ref cvae.py:380-391."""
        cfg = self.model_cfg
        return {'sigma': cfg.sigma_cfg.params,
                'beta': cfg.beta, 'gamma': cfg.gamma,
                'latent_sampling': cfg.latent_sampling,
                'set': None, 'data_augmentation': [],
                'pretrained_features': None, 'pretrained_upsampler': None,
                'epochs': 0, 'batch_size': None, 'fine_tuning': [],
                'optimizer': self.opt_cfg.params}


def new_job(model_cfg: CVNetConfig, opt_cfg: OptimizerConfig = None,
            key: Optional[jax.Array] = None, job_number: int = 0,
            batch_size: int = 2) -> Job:
    opt_cfg = opt_cfg or OptimizerConfig()
    job = Job(model_cfg=model_cfg, opt_cfg=opt_cfg, job_number=job_number)
    if key is not None:
        job.state = create_train_state(CVNet(model_cfg), key, opt_cfg,
                                       batch_size=batch_size)
    job.training_parameters = job.default_training_parameters()
    job.testing = {0: {m: {'n': 0, 'epochs': 0, 'accuracy': 0}
                       for m in model_cfg.predict_methods}}
    return job


def save_job(job: Job, job_dir: str, save_state: bool = True,
             sharded: Optional[bool] = None, checkpointer=None):
    """Persist the job directory.

    ``sharded``: write per-process ``state.shards/`` + ``optimizer.shards/``
    instead of gathered npz archives (sharded_checkpoint.py) — the pod-scale
    path; defaults to JVT_SHARDED_CKPT or automatically whenever more than
    one process is running.  ``checkpointer``: an AsyncCheckpointer — array
    serialization overlaps the caller's next epoch (sharded saves only)."""
    os.makedirs(job_dir, exist_ok=True)
    arch = dict(job.model_cfg.architecture)
    arch['job_number'] = job.job_number
    save_json(arch, os.path.join(job_dir, 'params.json'))
    save_json(job.training_parameters, os.path.join(job_dir, 'train_params.json'))
    save_json(job.testing, os.path.join(job_dir, 'test.json'))
    save_json(job.ood_results, os.path.join(job_dir, 'ood.json'))
    save_json(job.train_history, os.path.join(job_dir, 'history.json'))
    if sharded is None:
        sharded = (os.environ.get('JVT_SHARDED_CKPT', '').strip().lower()
                   not in ('', '0', 'off', 'false', 'no', 'none')
                   or jax.process_count() > 1)
    if save_state and job.state is not None:
        st = job.state
        model_tree = {'params': st.params, 'batch_stats': st.batch_stats,
                      'sigma_state': {'data': st.sigma_state.data,
                                      'rmse': st.sigma_state.rmse},
                      'counters': {'epoch': st.epoch, 'step': st.step},
                      'rng': st.rng}
        if sharded:
            from .sharded_checkpoint import save_checkpoint_sharded
            save_checkpoint_sharded(os.path.join(job_dir, 'state.shards'),
                                    model_tree, checkpointer=checkpointer,
                                    sync=checkpointer is None)
            save_checkpoint_sharded(os.path.join(job_dir, 'optimizer.shards'),
                                    st.opt_state, checkpointer=checkpointer,
                                    sync=checkpointer is None)
            # a job switching formats mid-life must not leave the OTHER
            # format's older checkpoint behind (_load_arrays prefers the
            # newest, but a stale twin is still a foot-gun on copies that
            # drop mtimes) — retire it once the new write is durable
            if checkpointer is not None:
                checkpointer.submit(lambda: _drop_stale(job_dir, '.npz'))
            else:
                _drop_stale(job_dir, '.npz')
        else:
            save_checkpoint(os.path.join(job_dir, 'state.npz'), model_tree)
            save_checkpoint(os.path.join(job_dir, 'optimizer.npz'), st.opt_state)
            _drop_stale(job_dir, '.shards')
    job.saved_dir = job_dir


def _drop_stale(job_dir: str, kind: str):
    """Remove the retired checkpoint format after a successful save of the
    other one (host 0 only — shard files are per-process but the npz and
    the manifest belong to the write process)."""
    from .checkpoint import is_write_process
    if not is_write_process():
        return
    for stem in ('state', 'optimizer'):
        p = os.path.join(job_dir, stem + kind)
        try:
            if kind == '.shards':
                if os.path.isdir(p):
                    shutil.rmtree(p)
            elif os.path.exists(p):
                os.unlink(p)
        except OSError:
            pass


def _load_arrays(job_dir: str, stem: str):
    """Checkpoint arrays for ``stem`` — the gathered npz or the per-process
    shard directory (sharded_checkpoint.py), stitched back to global arrays
    (restores onto any mesh shape).  When BOTH formats exist (a job that
    switched formats mid-life before the stale twin was retired), the newer
    one wins — loading the older would silently resurrect pre-switch
    weights."""
    npz = os.path.join(job_dir, stem + '.npz')
    from .sharded_checkpoint import (load_checkpoint_sharded, MANIFEST,
                                     is_sharded_checkpoint)
    shards = os.path.join(job_dir, stem + '.shards')
    have_npz = os.path.exists(npz)
    have_shards = is_sharded_checkpoint(shards)
    if have_npz and have_shards:
        if os.path.getmtime(npz) >= os.path.getmtime(
                os.path.join(shards, MANIFEST)):
            return load_checkpoint(npz)
        return load_checkpoint_sharded(shards)
    if have_npz:
        return load_checkpoint(npz)
    return load_checkpoint_sharded(shards)


def load_job(job_dir: str, load_state: bool = True, ghost: bool = False,
             key: Optional[jax.Array] = None, strict: bool = True) -> Job:
    """Load a job.  ghost=True skips all array state (fast queries).

    strict=False tolerates missing state keys (the WIM transfer path,
    ref ft/job.py:121-169) — missing leaves keep freshly initialized values.
    """
    arch = load_json(os.path.join(job_dir, 'params.json'))
    job_number = arch.pop('job_number', 0)
    tp_path = os.path.join(job_dir, 'train_params.json')
    training_parameters = load_json(tp_path) if os.path.exists(tp_path) else {}
    opt_params = dict(training_parameters.get('optimizer', {}) or {})
    known = {f.name for f in dataclasses.fields(OptimizerConfig)}
    opt_cfg = OptimizerConfig(**{k: v for k, v in opt_params.items()
                                 if k in known and v is not None})
    # beta / gamma / latent_sampling / sigma live in train_params.json, not
    # the architecture (ref training_parameters, cvae.py:380-391); they must
    # be merged before construction since they shape the module tree.
    merged = dict(arch)
    for k in ('beta', 'gamma', 'latent_sampling', 'sigma'):
        if training_parameters.get(k) is not None:
            merged[k] = training_parameters[k]
    model_cfg = CVNetConfig.from_dict(merged)

    job = Job(model_cfg=model_cfg, opt_cfg=opt_cfg, job_number=job_number,
              training_parameters=training_parameters, saved_dir=job_dir)
    for name, attr in (('test.json', 'testing'), ('ood.json', 'ood_results'),
                       ('history.json', 'train_history')):
        p = os.path.join(job_dir, name)
        if os.path.exists(p):
            setattr(job, attr, load_json(p))

    if ghost:
        return job

    key = key if key is not None else jax.random.PRNGKey(0)
    state = create_train_state(CVNet(model_cfg), key, opt_cfg)
    if load_state:
        arrays = _load_arrays(job_dir, 'state')
        params, missing, extra = unflatten_into(
            state.params, {k[len('params/'):]: v for k, v in arrays.items()
                           if k.startswith('params/')})
        if strict and missing:
            raise KeyError('missing state keys: {}'.format(missing))
        bs = state.batch_stats
        if state.batch_stats is not None:
            bs, _, _ = unflatten_into(
                state.batch_stats,
                {k[len('batch_stats/'):]: v for k, v in arrays.items()
                 if k.startswith('batch_stats/')})
        sigma_state = state.sigma_state.replace(
            data=jax.numpy.asarray(arrays.get('sigma_state/data',
                                              state.sigma_state.data)),
            rmse=jax.numpy.asarray(arrays.get('sigma_state/rmse',
                                              state.sigma_state.rmse)))
        state = state.replace(
            params=params, batch_stats=bs, sigma_state=sigma_state,
            epoch=jax.numpy.asarray(arrays.get('counters/epoch', 0),
                                    jax.numpy.int32),
            step=jax.numpy.asarray(arrays.get('counters/step', 0),
                                   jax.numpy.int32))
        if 'rng' in arrays:
            # resume continues the saved sampling-noise stream instead of
            # restarting from the fresh init key
            saved_rng = jax.numpy.asarray(arrays['rng'], jax.numpy.uint32)
            state = state.replace(rng=saved_rng.reshape(state.rng.shape))
        if (os.path.exists(os.path.join(job_dir, 'optimizer.npz'))
                or os.path.isdir(os.path.join(job_dir, 'optimizer.shards'))):
            oarrays = _load_arrays(job_dir, 'optimizer')
            opt_state, _, _ = unflatten_into(state.opt_state, oarrays)
            state = state.replace(opt_state=opt_state)
        job.state = state
        return job

    job.state = state
    return job


def is_derailed(job_dir: str) -> bool:
    return any(os.path.exists(os.path.join(job_dir, s)) for s in SENTINELS)


def mark(job_dir: str, sentinel: str):
    assert sentinel in SENTINELS + ('RESUMED',)
    with open(os.path.join(job_dir, sentinel), 'w') as f:
        f.write('')

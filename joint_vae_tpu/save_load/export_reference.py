"""Export a native job directory into a reference-loadable job.

The inverse of :mod:`.import_reference`: a native job (save_load/jobs.py)
becomes a directory the reference's own ``CVNet.load`` consumes
(ref cvae.py:2677-2857) —

    params.json         sanitized against the reference ctor signature
    train_params.json   filtered to the keys its load() tolerates
                        (ref cvae.py:2788-2801 keys_out + ctor kwargs)
    test.json / ood.json / history.json   verbatim (schemas match by design)
    state.pth           torch state_dict (weights mapped back, see below)
    optimizer.pth       torch optimizer state (adam moments / sgd momentum
                        transplanted so a reference resume continues them)
    samples/<epoch>/record-<set>.pth     reference LossRecorder dumps
                        (written by the reference's own save,
                        ref utils/save_load/recorders.py:107-138)

The reference package itself must be importable (it *defines* the torch
checkpoint format): pass ``reference_path`` or set ``JVT_REFERENCE``.  The
exporter builds the reference network from the exported JSONs with the
reference's own ``load(build_module=True, load_state=False)`` — so a
successful export proves the JSONs reconstruct on the reference side — and
uses its ``state_dict()`` as the key/shape template.

Weight mapping reuses the importer as its own oracle: the template
state_dict is re-keyed with per-tensor integer tags and pushed through
:func:`..save_load.import_reference.map_reference_state`, which yields the
exact (reference key <-> native key) correspondence the importer applies;
each native leaf is then written back through the *inverse* of the
importer's transpose for its kind (Linear W.T, conv HWIO->OIHW, deconv
flip+transpose, identities for BN/prior/sigma).  Export therefore inverts
import bit-for-bit; tests/test_export_reference.py round-trips both ways
and oracles ``evaluate`` losses through the reference network.

Not exportable (clear error): from-scratch flax trunk variants
(densenet-small/-tiny, non-default growth) — the reference only knows
torchvision parameterizations.  Torchvision-faithful trunks
(resnet18/34/50/101/152, densenet121/161/169/201) export; NOTE that a
stock reference checkout needs its densenet routing bug fixed to load a
densenet-trunk job (tv_resnet.route_densenet docstring, docs/PARITY.md).
"""

import logging
import os
import re
import shutil
import sys
import types
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from .checkpoint import load_json, save_json, flatten_pytree
from .import_reference import (map_reference_state, ImportError_,
                               _BUFFER_SUFFIXES)
from .jobs import Job, load_job
from .recorders import LossRecorder

#: train_params.json keys the reference's load() pops before calling the
#: ctor (ref cvae.py:2788-2801); everything else must be a ctor kwarg.
REF_TRAIN_KEYS_OUT = frozenset((
    'set', 'epochs', 'data_augmentation', 'batch_size', 'fine_tuning',
    'warmup', 'warmup_gamma', 'full_test_every', 'validation_split_seed',
    'max_batch_sizes', 'pretrained_features', 'pretrained_upsampler',
    'transformer', 'validation'))


class ExportError_(RuntimeError):
    pass


# -- reference package loading ------------------------------------------------

def default_reference_path() -> Optional[str]:
    p = os.environ.get('JVT_REFERENCE')
    if p:
        return p
    return '/root/reference' if os.path.isdir('/root/reference') else None


def _stub_torchvision():
    """Satisfy the reference's torchvision imports when the real package is
    absent.  resnet18/34/50/101/152 and densenet121/161/169/201 get
    faithful plain-torch implementations (tv_resnet.py) so trunk-featured
    templates build for real; everything else is a dummy."""
    if 'torchvision' not in sys.modules:
        try:
            import torchvision                           # noqa: F401
        except ImportError:
            class _Dummy:
                def __init__(self, *a, **k):
                    pass

            def _ga(name):
                if name.startswith('__'):
                    raise AttributeError(name)
                return _Dummy

            tv = types.ModuleType('torchvision')
            for sub in ('models', 'transforms', 'datasets', 'utils'):
                m = types.ModuleType('torchvision.' + sub)
                m.__getattr__ = _ga
                setattr(tv, sub, m)
                sys.modules['torchvision.' + sub] = m
            tv.utils.save_image = lambda *a, **k: None
            tv.__path__ = []
            sys.modules['torchvision'] = tv
    from . import tv_resnet
    tv_resnet.install()


_REF_CACHE: Dict[str, Tuple[Any, Any]] = {}


def reference_modules(reference_path: Optional[str] = None):
    """(RefNet class, reference recorders module) from the reference tree."""
    path = reference_path or default_reference_path()
    if not path:
        raise ExportError_(
            'the reference package is required to write its torch formats: '
            'pass reference_path or set JVT_REFERENCE')
    path = os.path.abspath(path)
    if path in _REF_CACHE:
        return _REF_CACHE[path]
    _stub_torchvision()
    sys.path.insert(0, path)
    try:
        import cvae as ref_cvae
        from utils.save_load import recorders as ref_recorders
    finally:
        sys.path.remove(path)
    # the reference's own densenet trunk routing is bit-rotted (conv.py:138
    # routes only resnet*); fix it in-process so densenet-trunk templates
    # build (tv_resnet.route_densenet docstring + docs/PARITY.md)
    from .tv_resnet import route_densenet
    route_densenet(ref_cvae)
    pair = (ref_cvae.ClassificationVariationalNetwork, ref_recorders)
    _REF_CACHE[path] = pair
    return pair


# -- JSON sanitization --------------------------------------------------------

def _ctor_params(ref_net_cls) -> frozenset:
    import inspect
    sig = inspect.signature(ref_net_cls.__init__)
    return frozenset(p for p, v in sig.parameters.items()
                     if p != 'self'
                     and v.kind not in (v.VAR_POSITIONAL, v.VAR_KEYWORD))


def export_architecture(arch: Dict[str, Any], ref_net_cls) -> Dict[str, Any]:
    """Native params.json -> reference-ctor-safe params.json."""
    allowed = _ctor_params(ref_net_cls) | {'job_number', 'version'}
    out, dropped = {}, []
    for k, v in arch.items():
        if k in allowed:
            out[k] = v
        else:
            dropped.append(k)
    if dropped:
        logging.warning('params.json keys not in the reference ctor, '
                        'dropped on export: %s', ', '.join(sorted(dropped)))
    return out


def export_train_params(tp: Dict[str, Any], ref_net_cls) -> Dict[str, Any]:
    """Native train_params.json -> keys the reference load() tolerates."""
    allowed = _ctor_params(ref_net_cls)
    out, dropped = {}, []
    for k, v in tp.items():
        if k in REF_TRAIN_KEYS_OUT or k.startswith('early-') or k in allowed:
            out[k] = v
        else:
            dropped.append(k)
    if dropped:
        logging.warning('train_params.json keys the reference load() would '
                        'reject, dropped on export: %s',
                        ', '.join(sorted(dropped)))
    return out


# -- weight mapping -----------------------------------------------------------

def _inv_linear(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).T)


def _inv_conv(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).transpose(3, 2, 0, 1))


def _inv_deconv(w: np.ndarray) -> np.ndarray:
    w = np.asarray(w).transpose(2, 3, 0, 1)          # (kH,kW,I,O)->(I,O,kH,kW)
    return np.ascontiguousarray(w[:, :, ::-1, ::-1])


def _inverse_transform(our_key: str, value: np.ndarray) -> np.ndarray:
    """Invert the importer's per-kind transpose (import_reference.py:118-128)."""
    v = np.asarray(value)
    if our_key.endswith('/kernel'):
        if v.ndim == 4:
            layer = our_key.split('/')[-2]
            return (_inv_deconv if layer.startswith('deconv')
                    else _inv_conv)(v)
        return _inv_linear(v)
    # NOT ascontiguousarray: it promotes 0-d arrays (scalar var_param) to (1,)
    return np.asarray(v)


def state_correspondence(template_sd: Dict[str, np.ndarray], params,
                         batch_stats) -> Dict[str, str]:
    """{reference key: native flat key} derived by running the importer on a
    tagged copy of the reference template (so export inverts import exactly)."""
    keys = list(template_sd)
    tagged = {k: np.full(np.shape(template_sd[k]), i, np.float32)
              for i, k in enumerate(keys)}
    mapped, stats, sigma = map_reference_state(tagged, params, batch_stats)

    corr: Dict[str, str] = {}

    def _claim(our_key, arr):
        arr = np.asarray(arr)
        tag = int(round(float(arr.reshape(-1)[0]))) if arr.size else -1
        if 0 <= tag < len(keys):
            corr[keys[tag]] = our_key

    # claim order: later claims win, and the params/ spelling must win over
    # the bare sigma one (a learned sigma appears as both 'sigma' state and
    # the sigma_param parameter; the optimizer export needs the params/ key)
    if sigma is not None:
        _claim('sigma', np.asarray(sigma))
    for our_key, arr in stats.items():
        _claim('batch_stats/' + our_key, arr)
    for our_key, arr in mapped.items():
        _claim('params/' + our_key, arr)
    return corr


def export_state_dict(job: Job, template_sd) -> Tuple[Dict[str, Any],
                                                      List[str]]:
    """Native TrainState -> torch state_dict tensors.

    Returns (state_dict of torch tensors, reference parameter keys left at
    their fresh-init template values)."""
    import torch

    np_template = {k: v.detach().cpu().numpy() for k, v in template_sd.items()}
    corr = state_correspondence(np_template, job.state.params,
                                job.state.batch_stats)

    flat = {'params/' + k: v
            for k, v in flatten_pytree(job.state.params).items()}
    if job.state.batch_stats is not None:
        flat.update({'batch_stats/' + k: v for k, v in
                     flatten_pytree(job.state.batch_stats).items()})
    flat['sigma'] = job.state.sigma_state.data

    out, missing = {}, []
    for ref_key, tmpl in np_template.items():
        our_key = corr.get(ref_key)
        if our_key is None:
            out[ref_key] = torch.as_tensor(tmpl)
            if not ref_key.endswith('num_batches_tracked'):
                missing.append(ref_key)
            continue
        v = _inverse_transform(our_key.split('/', 1)[1]
                               if '/' in our_key else our_key,
                               flat[our_key])
        if tuple(v.shape) != tuple(np.shape(tmpl)):
            raise ExportError_('shape mismatch exporting {} from {}: '
                               '{} vs template {}'.format(
                                   ref_key, our_key, v.shape,
                                   np.shape(tmpl)))
        # copy: jax arrays expose read-only buffers torch refuses to wrap
        out[ref_key] = torch.as_tensor(
            np.array(v, dtype=np_template[ref_key].dtype))
    if missing:
        logging.warning('reference parameters kept at fresh-init values '
                        '(no native counterpart): %s', ', '.join(missing))
    return out, missing


# -- optimizer state ----------------------------------------------------------

def _find_moments(opt_state):
    """Locate adam mu/nu/count or sgd momentum trace inside our optax tree."""
    import optax
    found: Dict[str, Any] = {}

    def walk(s):
        if isinstance(s, optax.ScaleByAdamState):
            found['exp_avg'] = s.mu
            found['exp_avg_sq'] = s.nu
            found['count'] = int(np.asarray(s.count))
        elif isinstance(s, optax.TraceState):
            found['momentum_buffer'] = s.trace
        elif hasattr(s, 'inner_state'):
            walk(s.inner_state)
        elif isinstance(s, tuple):
            for c in s:
                walk(c)
    walk(opt_state)
    return found


def export_optimizer_state(job: Job, ref_model,
                           state_dict) -> Optional[Dict[str, Any]]:
    """Native optax state -> torch Optimizer.state_dict(), or None when
    there are no moments to carry (fresh adam / stateless sgd).

    torch keys optimizer state by parameter index into ``parameters()``
    (state_dict order restricted to parameters — the same rule the importer
    inverts, import_reference.py map_reference_optimizer)."""
    import torch

    moments = _find_moments(job.state.opt_state)
    fields = [f for f in ('exp_avg', 'exp_avg_sq', 'momentum_buffer')
              if f in moments]
    if not fields or ('count' in moments and moments['count'] == 0):
        return None

    flat_moments = {f: flatten_pytree(moments[f])
                    for f in fields if f != 'count'}

    np_template = {k: v.detach().cpu().numpy()
                   for k, v in state_dict.items()}
    corr = state_correspondence(np_template, job.state.params,
                                job.state.batch_stats)

    pnames = [k for k in state_dict if not k.endswith(_BUFFER_SUFFIXES)]
    template = ref_model.optimizer.state_dict()
    groups = template.get('param_groups') or []
    idx_order = [i for g in groups for i in g.get('params', [])]
    if len(idx_order) != len(pnames):
        logging.warning('optimizer not exported: %d torch params vs %d '
                        'state_dict parameters', len(idx_order), len(pnames))
        return None

    state: Dict[int, Dict[str, Any]] = {}
    count = moments.get('count', 0)
    for idx, pname in zip(idx_order, pnames):
        our_key = corr.get(pname)
        if our_key is None or not our_key.startswith('params/'):
            continue                       # sigma / untracked on our side
        leaf_key = our_key[len('params/'):]
        entry: Dict[str, Any] = {}
        for f, flat in flat_moments.items():
            if leaf_key not in flat:
                continue
            entry[f] = torch.as_tensor(
                np.array(_inverse_transform(leaf_key, flat[leaf_key]),
                         dtype=np.float32))
        if not entry:
            continue
        if 'exp_avg' in entry:
            entry['step'] = torch.tensor(float(count))
        state[idx] = entry
    if not state:
        return None
    return {'state': state, 'param_groups': groups}


# -- recorders ----------------------------------------------------------------

def export_recorder(native_path: str, dst_path: str, ref_recorders) -> bool:
    """Native .jvr/.npz recorder -> reference record-<set>.pth (written with
    the reference's own LossRecorder.save, recorders.py:107-138)."""
    import torch

    rec = LossRecorder.load(native_path)
    if len(rec) == 0:
        logging.debug('%s empty, not exported', native_path)
        return False
    # copy: .jvr recorders mmap read-only buffers torch refuses to wrap
    tensors = {k: torch.as_tensor(np.array(v))
               for k, v in rec._tensors.items()}
    r = ref_recorders.LossRecorder(rec.batch_size, rec.num_batch,
                                   device='cpu', **tensors)
    r._tensors = tensors
    r._recorded_batches = rec._recorded_batches
    r.last_batch_size = rec.last_batch_size
    if rec._seed is not None:
        r._seed = int(rec._seed)
    os.makedirs(os.path.dirname(dst_path), exist_ok=True)
    r.save(dst_path, cut=True)
    return True


def export_sample_recorder(npz_path: str, dst_path: str,
                           ref_recorders) -> bool:
    """Native sample-<set>.npz -> reference samples-<set>.pth.

    The native SampleRecorder is a flat keyed store; the reference splits
    sample-axis tensors from auxiliaries (recorders.py:372-399).  Keys whose
    leading dim matches the modal sample count become ``_tensors``; the rest
    (prior centroids etc.) ride as ``_aux``."""
    import torch
    from .recorders import SampleRecorder

    rec = SampleRecorder.load(npz_path)
    arrays = {k: np.array(rec.get(k)) for k in rec.keys()}
    if not arrays:
        return False
    # deterministic split: the sample count is the most common leading dim,
    # largest on a tie (samples usually outnumber aux rows).  A collision
    # (an aux array whose length equals the sample count) is not decidable
    # from the flat store and lands in _tensors.
    lengths = [v.shape[0] for v in arrays.values() if v.ndim]
    n = (max(sorted(set(lengths)), key=lambda L: (lengths.count(L), L))
         if lengths else 0)
    tensors = {k: torch.as_tensor(v) for k, v in arrays.items()
               if v.ndim and v.shape[0] == n}
    aux = {k: torch.as_tensor(v) for k, v in arrays.items()
           if k not in tensors}
    if not tensors:
        return False
    r = ref_recorders.SampleRecorder(n, 1, device='cpu', **tensors)
    r._tensors = tensors
    r._recorded_batches = 1
    r.last_batch_size = n
    if aux:
        r.add_auxiliary(**aux)
    os.makedirs(os.path.dirname(dst_path), exist_ok=True)
    r.save(dst_path, cut=True)
    return True


def _export_sample_dirs(src: str, dst: str, ref_recorders) -> int:
    """samples/<0-padded epoch>/record-*.jvr -> samples/<bare int>/*.pth,
    with the newest epoch duplicated into samples/last (the dir the
    reference's dictify reads first, ref dictify.py:750)."""
    samples = os.path.join(src, 'samples')
    if not os.path.isdir(samples):
        return 0
    n = 0
    numbered = []
    for sub in sorted(os.listdir(samples)):
        sub_path = os.path.join(samples, sub)
        if not os.path.isdir(sub_path):
            continue
        sub_out = str(int(sub)) if sub.isdigit() else sub
        if sub.isdigit():
            numbered.append((int(sub), sub_path))
        out_dir = os.path.join(dst, 'samples', sub_out)
        n += _export_record_files(sub_path, out_dir, ref_recorders)
        # one nesting level: WIM pre-tuning snapshots live under
        # samples/<epoch>/init/ (ref ft/job.py:302-313)
        for nested in sorted(os.listdir(sub_path)):
            nested_path = os.path.join(sub_path, nested)
            if os.path.isdir(nested_path):
                n += _export_record_files(
                    nested_path, os.path.join(out_dir, nested),
                    ref_recorders)
    if numbered:
        _, newest = max(numbered)
        _export_record_files(newest, os.path.join(dst, 'samples', 'last'),
                             ref_recorders)
    return n


def _export_record_files(src_dir: str, out_dir: str, ref_recorders) -> int:
    n = 0
    for f in sorted(os.listdir(src_dir)):
        m = re.match(r'record-(?P<set>.+)\.(jvr|npz)\Z', f)
        if m:
            dst_file = os.path.join(out_dir,
                                    'record-{}.pth'.format(m.group('set')))
            try:
                n += export_recorder(os.path.join(src_dir, f), dst_file,
                                     ref_recorders)
            except Exception as e:
                logging.warning('recorder %s not exported: %s', f, e)
            continue
        m = re.match(r'sample-(?P<set>.+)\.npz\Z', f)
        if m:
            dst_file = os.path.join(out_dir,
                                    'samples-{}.pth'.format(m.group('set')))
            try:
                n += export_sample_recorder(os.path.join(src_dir, f),
                                            dst_file, ref_recorders)
            except Exception as e:
                logging.warning('sample recorder %s not exported: %s', f, e)
    return n


# -- the exporter -------------------------------------------------------------

def export_to_reference_job(src: str, dst: str,
                            reference_path: Optional[str] = None,
                            export_recorders: bool = True,
                            export_optimizer: bool = True) -> str:
    """Convert a native job directory into a reference-loadable one.

    Returns the destination directory.  Raises :class:`ExportError_` (with
    the reason) rather than writing a directory the reference cannot load.
    """
    if not os.path.exists(os.path.join(src, 'params.json')):
        raise FileNotFoundError('{} is not a job dir (no params.json)'
                                .format(src))
    job = load_job(src, ghost=True)
    # gate unexportable archs BEFORE touching the reference checkout — a
    # clear rejection must not depend on the reference being importable
    features = job.model_cfg.features or ''
    if features.startswith(('resnet', 'densenet')):
        from ..models.resnet import DENSENET_TV, RESNET_LAYERS
        # -small/-tiny and width/growth-suffixed variants ('resnet18:16',
        # 'densenet121:12', cvnet.py:347-352) are from-scratch-only
        ok = (features in RESNET_LAYERS if features.startswith('resnet')
              else features in DENSENET_TV)
        if not ok:
            raise ExportError_(
                'from-scratch flax {} features have no torchvision '
                'counterpart and cannot be exported (docs/PARITY.md); '
                'torchvision-faithful trunks (resnet18/34/50/101/152, '
                'densenet121/161/169/201) export fine'.format(features))
    ref_net_cls, ref_recorders = reference_modules(reference_path)

    arch = load_json(os.path.join(src, 'params.json'))
    os.makedirs(dst, exist_ok=True)
    save_json(export_architecture(arch, ref_net_cls),
              os.path.join(dst, 'params.json'))
    tp = {k: (dict(v) if isinstance(v, dict) else v)
          for k, v in job.training_parameters.items()}
    if job.opt_cfg.momentum and isinstance(tp.get('optimizer'), dict):
        # OptimizerConfig.params omits momentum (the ref summary schema,
        # module/optimizers.py:25-34) but the reference Optimizer accepts
        # it as a passthrough torch kwarg — carry it so an exported SGD
        # job resumes with its momentum buffers live
        tp['optimizer'].setdefault('momentum', job.opt_cfg.momentum)
    if (tuple(job.opt_cfg.betas) != (0.9, 0.999)
            and isinstance(tp.get('optimizer'), dict)):
        tp['optimizer'].setdefault('betas', list(job.opt_cfg.betas))
    save_json(export_train_params(tp, ref_net_cls),
              os.path.join(dst, 'train_params.json'))
    wim_tp = job.training_parameters.get('wim')
    is_wim = isinstance(wim_tp, dict) and wim_tp.get('distribution')
    if is_wim:
        # reference WIM jobs keep ft params in wim.json, fed to build_prior
        # on reload after its load_post_hook pops the moving-set metadata
        # (ref ft/wim.py:208-213, ft/job.py:142-145) — keep the prior keys
        # (PriorConfig fields; build_prior itself discards tau-for-gaussian
        # etc., priors.py:41-52) plus exactly the keys that hook pops.
        # Deviation: the reference re-derives the prior ARRAYS from the
        # torch seed (priors.py:66-71), so '@' scores after a reference
        # reload use its own seeded prior, not this job's exact arrays.
        import dataclasses as _dc
        from ..ops.priors import PriorConfig
        allowed = ({f.name for f in _dc.fields(PriorConfig)}
                   | {'sets', 'alpha', 'train_size', 'moving_size',
                      'padding', 'mix_padding', 'padding_sets', 'from',
                      'mix', 'hash', 'array_size'})
        save_json({k: v for k, v in wim_tp.items()
                   if k in allowed and v is not None},
                  os.path.join(dst, 'wim.json'))
    poscod_tp = job.training_parameters.get('poscod')
    if isinstance(poscod_tp, dict):
        if os.path.exists(os.path.join(src, 'poscod_head.npz')):
            # marks the dir as a poscod job (ref PoscodJob.is_poscod,
            # ft/poscod.py:48); the llr head itself rides in state.pth below
            save_json(poscod_tp, os.path.join(dst, 'poscod.json'))
        else:
            # without the head tensors a poscod.json dir cannot load on
            # the reference side — export as a plain job instead
            logging.warning('poscod params present but no poscod_head.npz: '
                            'exported as a plain job (no poscod.json)')
    for name in ('test.json', 'ood.json'):
        p = os.path.join(src, name)
        if os.path.exists(p):
            save_json(load_json(p), os.path.join(dst, name))

    history = dict(job.train_history)
    has_state = os.path.exists(os.path.join(src, 'state.npz'))
    if has_state:
        job = load_job(src, load_state=True)
        trained = max(int(history.get('epochs', 0) or 0),
                      int(np.asarray(job.state.epoch)))
        history['epochs'] = trained
    save_json(history, os.path.join(dst, 'history.json'))

    # build the reference network from the exported JSONs with its own
    # loader — proves the sanitized params reconstruct on its side
    try:
        ref_model = ref_net_cls.load(dst, load_state=False)
    except Exception as e:
        raise ExportError_('the reference cannot rebuild the exported '
                           'architecture: {}: {}'.format(type(e).__name__, e))

    if has_state:
        import torch
        template = ref_model.state_dict()
        try:
            sd, missing = export_state_dict(job, template)
        except ImportError_ as e:
            raise ExportError_('weight mapping failed: {}'.format(e))
        head_path = os.path.join(src, 'poscod_head.npz')
        if os.path.exists(head_path):
            # reference PoscodJob keeps the llr head inside state.pth
            # (ood_head.1.*; param_a is a vestigial learned scalar,
            # ref ft/poscod.py:38-43) — include them so its strict
            # load_state_dict succeeds with the trained head
            with np.load(head_path) as z:
                sd['ood_head.1.weight'] = torch.as_tensor(
                    np.array(z['w'], np.float32).reshape(1, -1))
                sd['ood_head.1.bias'] = torch.as_tensor(
                    np.array(z['b'], np.float32).reshape(1))
            sd.setdefault('param_a', torch.tensor([0.5]))
        if is_wim:
            # the reference WIMJob registers the original prior under
            # _original_prior (an alias of encoder.prior, ft/wim.py:28),
            # so its state_dict carries both spellings — without them its
            # load raises MissingKeys and the fallback path WIPES the
            # job's ood_results (ref ft/job.py:126-138)
            for field in ('mean', '_var_parameter'):
                enc = sd.get('encoder.prior.' + field)
                if enc is not None:
                    sd.setdefault('_original_prior.' + field, enc.clone())
        torch.save(sd, os.path.join(dst, 'state.pth'))
        logging.info('state.npz exported: %d tensors (%d left at init)',
                     len(sd), len(missing))

        if export_optimizer:
            opt_sd = export_optimizer_state(job, ref_model, template)
            if opt_sd is not None:
                torch.save(opt_sd, os.path.join(dst, 'optimizer.pth'))
                logging.info('optimizer.npz exported: moments continue on '
                             'a reference resume')

    if export_recorders:
        _export_sample_dirs(src, dst, ref_recorders)

    for sentinel in ('deleted', 'derailed', 'RESUMED'):
        p = os.path.join(src, sentinel)
        if os.path.exists(p):
            shutil.copy(p, os.path.join(dst, sentinel))
    return dst

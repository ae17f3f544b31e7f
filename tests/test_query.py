"""Filters grammar, model dicts, available-results planner, registry cache."""

import os
import tempfile

import numpy as np
import jax

from joint_vae_tpu.models.cvnet import CVNetConfig
from joint_vae_tpu.ops.sigma import SigmaConfig
from joint_vae_tpu.save_load.dictify import (make_dict_from_model,
                                             available_results,
                                             needed_components)
from joint_vae_tpu.save_load.fetch import (fetch_models, find_by_job_number,
                                           collect_models)
from joint_vae_tpu.save_load.jobs import new_job, save_job, mark
from joint_vae_tpu.utils.filters import (ParamFilter, filters_from_dict,
                                         DictOfListsOfParamFilters)


def test_param_filter_grammar():
    f = ParamFilter.from_string('100...200', type=int)
    assert f(150) and not f(99) and f(100) and f(200)
    f = ParamFilter.from_string('100...', type=int)
    assert f(1e9) and not f(99)
    f = ParamFilter.from_string('cvae vae', type=str)
    assert f('cvae') and not f('vib')
    f = ParamFilter.from_string('not cvae', type=str)
    assert not f('cvae') and f('vae')
    f = ParamFilter.from_string('', type=float)
    assert f(1.0) and not f('x')
    f = ParamFilter.from_string(None)
    assert f('anything')
    f = ParamFilter.from_string('true', type=bool)
    assert f(True) and not f(False)
    # list values: any matches (neg: all must fail)
    f = ParamFilter.from_string('3', type=int)
    assert f([1, 3]) and not f([1, 2])


def test_filters_from_dict():
    fs = filters_from_dict({'type': 'cvae', 'done': '10...', 'K': '64 128'})
    assert isinstance(fs, DictOfListsOfParamFilters)
    # flat model dicts carry the canonical keys ('K' aliases 'latent_dim')
    good = {'type': 'cvae', 'done': 50, 'latent_dim': 128}
    assert fs(good)
    assert not fs({**good, 'type': 'vae'})
    assert not fs({**good, 'done': 5})
    # alias mapping: 'done' -> epochs key? our dicts carry 'done' directly
    fs2 = filters_from_dict({'dataset': 'cifar10'})
    assert 'set' in fs2


def test_needed_components():
    assert needed_components('elbo') == ['total']
    assert needed_components('elbo-2s') == ['total']
    assert needed_components('iws-a-4-1') == ['iws']
    assert 'kl' in needed_components('softkl-10')
    assert needed_components('baseline-100') == ['logits']
    assert needed_components('odin-1-0.0020') == ['odin-1-0.0020', 'logits']
    assert set(needed_components('zdist~@')) >= {'zdist', 'zdist@'}


def _job(jn=7):
    cfg = CVNetConfig(input_shape=(1, 6, 6), num_labels=3, type='cvae',
                      encoder=(16,), decoder=(16,), classifier=(8,),
                      latent_dim=4, latent_sampling=1, gamma=10.0,
                      sigma=SigmaConfig(value=0.3))
    job = new_job(cfg, key=jax.random.PRNGKey(0), job_number=jn)
    job.training_parameters['set'] = 'mnist'
    job.training_parameters['epochs'] = 5
    job.train_history['epochs'] = 5
    job.testing = {5: {'iws': {'n': 100, 'epochs': 5, 'accuracy': 0.9}}}
    job.ood_results = {5: {'fashion': {'iws': {
        'n': 100, 'auc': 0.8, 'tpr': [0.9 + i / 100 for i in range(10)],
        'fpr': [0.5] * 10, 'epochs': 5}}}}
    return job


def test_make_dict_from_model():
    d = make_dict_from_model(_job())
    assert d['job'] == 7 and d['type'] == 'cvae' and d['set'] == 'mnist'
    assert d['done'] == 5 and d['finished']
    assert d['accuracy_iws'] == 0.9 and d['accuracy'] == 0.9
    assert d['ood_fashion_auc'] == 0.8
    assert abs(d['ood_fashion_fpr95'] - 0.5) < 1e-9
    assert d['K'] == 4 and d['prior'] == 'gaussian'


def test_available_results_planner():
    with tempfile.TemporaryDirectory() as tmp:
        job = _job()
        save_job(job, tmp)
        job.saved_dir = tmp
        froms = available_results(job, testset='mnist', oodsets=['fashion'],
                                  ood_methods=['iws', 'elbo'],
                                  predict_methods=['iws'],
                                  misclass_methods=[],
                                  wanted_epoch=5)
        assert 5 in froms
        a = froms[5]['fashion']
        assert a['json']['iws'] == 100
        assert a['json']['elbo'] == 0
        assert a['where']['compute']  # epoch == trained
        # write a recorder and re-plan
        from joint_vae_tpu.save_load.recorders import LossRecorder
        rec = LossRecorder(10)
        rec.append_batch(total=np.random.rand(3, 10).astype(np.float32),
                         iws=np.random.rand(3, 10).astype(np.float32))
        sd = os.path.join(tmp, 'samples', '0005')
        rec.save(os.path.join(sd, 'record-fashion.npz'))
        froms = available_results(job, testset='mnist', oodsets=['fashion'],
                                  ood_methods=['iws', 'elbo'],
                                  predict_methods=[], misclass_methods=[],
                                  wanted_epoch=5)
        assert froms[5]['fashion']['recorders']['iws'] == 10
        assert froms[5]['fashion']['recorders']['elbo'] == 10


def test_fetch_models_and_cache():
    with tempfile.TemporaryDirectory() as tmp:
        for jn in (1, 2, 3):
            job = _job(jn)
            save_job(job, os.path.join(tmp, 'mnist', 'arch', str(jn)))
        assert len(collect_models(tmp)) == 3
        models = fetch_models(tmp)
        assert len(models) == 3
        assert os.path.exists([p for p in os.listdir(tmp)
                               if p.startswith('models-')] and
                              os.path.join(tmp, [p for p in os.listdir(tmp)
                                                 if p.startswith('models-')][0]))
        # cached second fetch
        models2 = fetch_models(tmp)
        assert {m['job'] for m in models2} == {1, 2, 3}
        # filtered
        fs = filters_from_dict({'job': '2'})
        assert [m['job'] for m in fetch_models(tmp, filter=fs)] == [2]
        # derailed jobs are skipped
        mark(os.path.join(tmp, 'mnist', 'arch', '3'), 'derailed')
        assert {m['job'] for m in fetch_models(tmp)} == {1, 2}
        # job-number lookup
        j = find_by_job_number(tmp, 2, load_state=False)
        assert j is not None and j.job_number == 2

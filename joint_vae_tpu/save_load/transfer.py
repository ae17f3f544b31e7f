"""Pretrained sub-module transfer + freezing.

Ref behavior: ``pretrained_features`` / ``pretrained_upsampler`` load conv
stacks from another job's checkpoint and freeze them
(ref cvae.py:241-247,311-317; conv.py:237-243 sets requires_grad False).

Here: copy the donor's ``features_stack`` / ``imager`` params into a fresh
TrainState and register the frozen paths in training_parameters; the train
step's grad mask zeroes them.
"""

import logging
import os
from typing import Optional

from .checkpoint import load_checkpoint, unflatten_into
from .jobs import Job


def _subtree_arrays(job_dir: str, prefix: str):
    arrays = load_checkpoint(os.path.join(job_dir, 'state.npz'))
    key = 'params/{}/'.format(prefix)
    return {k[len(key):]: v for k, v in arrays.items() if k.startswith(key)}


def transfer_pretrained(job: Job, features_from: Optional[str] = None,
                        upsampler_from: Optional[str] = None) -> Job:
    """Copy donor conv-stack params into job.state and mark them frozen."""
    frozen = list(job.training_parameters.get('frozen_modules') or [])
    params = dict(job.state.params)
    for src, name in ((features_from, 'features_stack'),
                      (upsampler_from, 'imager')):
        if not src:
            continue
        donor = _subtree_arrays(src, name)
        if not donor:
            raise ValueError('{} has no {} params'.format(src, name))
        sub, missing, extra = unflatten_into(params[name], donor)
        if missing:
            raise ValueError('pretrained {} missing keys: {}'.format(
                name, missing[:5]))
        params[name] = sub
        frozen.append(name)
        logging.info('transferred %s from %s (frozen)', name, src)
    job.state = job.state.replace(params=params)
    job.training_parameters['frozen_modules'] = frozen
    job.training_parameters['pretrained_features'] = features_from
    job.training_parameters['pretrained_upsampler'] = upsampler_from
    return job


def frozen_modules_mask_filter(job: Job):
    """Names of top-level param subtrees that must not receive gradients."""
    return set(job.training_parameters.get('frozen_modules') or [])

"""Persistence: job directories, JSON+npz checkpoints, recorders, registry."""

from .checkpoint import (save_json, load_json, flatten_pytree, unflatten_into,  # noqa: F401
                         save_checkpoint, load_checkpoint)
from .jobs import Job, save_job, load_job  # noqa: F401

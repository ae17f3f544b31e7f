"""Parallelism: device meshes, sharding rules, distributed init.

The reference scales out by SLURM job arrays + rsync (SURVEY.md section 2,
parallelism statement); the TPU-native equivalent here is SPMD over a
``jax.sharding.Mesh``: data parallelism over the batch axis + a 'model' axis
sharding the class-conditional prior dictionary and classifier head, with
XLA emitting the ICI collectives."""

from .mesh import (make_mesh, batch_sharding, replicated,  # noqa: F401
                   state_shardings, distributed_init)

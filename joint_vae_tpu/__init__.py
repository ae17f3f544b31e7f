"""joint_vae_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for joint/conditional
variational autoencoders with misclassification and OOD detection.

Re-designed from scratch with the capabilities of the PyTorch reference
``moxime/joint-vae`` (see SURVEY.md): five model types (vae / cvae / jvae / xvae /
vib), three latent prior families (gaussian / tilted / uniform-with-gaussian-tail,
optionally class-conditional with learned means), multi-sample IWAE-style
evaluation, a device-resident OOD / misclassification scoring + ROC pipeline, the
WIM alternate-prior fine-tuning flow, and a job-store / results layer.

The compute path is functional JAX: the model is a flax module over pytrees, the
(L, C) latent-sample and class axes are broadcast/vmapped dims (never Python
loops), and the hot reductions are fused by XLA (with Pallas kernels where XLA
fusion is insufficient).  Scale-out is data parallelism over a
``jax.sharding.Mesh`` (pjit/shard_map, ICI collectives), not file-based job
arrays.
"""

__version__ = '0.1.0'

from . import ops  # noqa: F401

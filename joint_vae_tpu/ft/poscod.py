"""Poscod: post-hoc OOD head on the frozen latent space
(ref ft/poscod.py:11-207).

The whole net is frozen; a single-logit linear head on z (the encoder mean)
is trained to discriminate in-distribution inputs from the moving set.  The
resulting score is the log-likelihood ratio head output ('llr' method).
"""

import dataclasses
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.loaders import ArrayDataset, DataLoader
from ..models.evaluate import evaluate
from ..save_load.jobs import Job, load_job

OOD_METHODS = ['llr']

#: trained head weights next to state.npz — without them a reloaded poscod
#: job could not re-score 'llr' on new data (ref keeps the head inside
#: state.pth as ood_head.1.*, ft/poscod.py:38-42)
POSCOD_HEAD_FILE = 'poscod_head.npz'


def save_poscod_head(pc: 'PoscodJob', job_dir: str):
    from ..save_load.checkpoint import is_write_process
    if pc.head is None or not is_write_process():
        return
    from ..parallel.mesh import host_get
    head = host_get(pc.head)
    np.savez(os.path.join(job_dir, POSCOD_HEAD_FILE),
             w=np.asarray(head['w']), b=np.asarray(head['b']))


def load_poscod_job(job_dir: str, key=None) -> 'PoscodJob':
    """Reload a poscod job: the llr head comes back from poscod_head.npz
    when present (ref PoscodJob.load reloads ood_head from state.pth)."""
    pc = PoscodJob(job=load_job(job_dir, key=key))
    path = os.path.join(job_dir, POSCOD_HEAD_FILE)
    if os.path.exists(path):
        with np.load(path) as z:
            pc.head = {'w': jnp.asarray(z['w']), 'b': jnp.asarray(z['b'])}
    return pc


@dataclasses.dataclass
class PoscodJob:
    job: Job
    head: Optional[Dict[str, jax.Array]] = None
    _mu_jit: Optional[object] = None
    _placed: bool = False

    def _mu(self, x, key):
        if self._mu_jit is None:
            model = self.job.model
            sigma_state = self.job.state.sigma_state

            @jax.jit
            def mu_fn(variables, x, key):
                out = evaluate(model, variables, x, None, rng=key,
                               sigma_state=sigma_state, train=False, L=1,
                               compute_iws=False)
                mu = out.mu
                return (mu.reshape((-1, mu.shape[-1]))
                        if mu.ndim > 2 else mu)
            self._mu_jit = mu_fn
        return self._mu_jit(self.job.state.variables, x, key)

    def _putter(self, dataset: ArrayDataset, mesh):
        """Mesh-aware batch feed + frozen-state placement (same contract
        as ft/job.py::finetune: multi-process runs every loader on every
        process, only addressable slices ship)."""
        if mesh is None:
            return jnp.asarray
        from ..parallel.mesh import ensure_placed, eval_batch_putters
        if not self._placed:
            self.job.state = ensure_placed(self.job.state, mesh)
            self._placed = True
            self._mu_jit = None        # re-trace against the placed state
        put_x, _ = eval_batch_putters(mesh, 1 + len(dataset.shape))
        return put_x

    def finetune(self, ind: ArrayDataset, moving: ArrayDataset,
                 epochs: int = 5, batch_size: int = 128, lr: float = 1e-3,
                 seed: int = 0, mesh=None):
        """Train the 1-logit head with BCE (ind=1, moving=0).

        ``mesh``: the frozen net's forwards feed mesh-sharded batches; the
        head (K+1 scalars) stays replicated, its grads all-reduced by GSPMD.
        Multi-process: every process runs the same loaders (aligned global
        batches), so the trajectory is bit-comparable to single-process."""
        if jax.process_count() > 1 and mesh is None:
            raise ValueError('multi-process poscod needs an explicit mesh')
        put_x = self._putter(ind, mesh)
        K = self.job.model_cfg.latent_dim
        head = {'w': jnp.zeros((K,)), 'b': jnp.zeros(())}
        tx = optax.adam(lr)
        opt_state = tx.init(head)
        if mesh is not None and jax.process_count() > 1:
            # jit inputs must be global arrays cross-process — replicate
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ..parallel.mesh import put_global
            rep = NamedSharding(mesh, P())
            head, opt_state = jax.tree_util.tree_map(
                lambda l: put_global(np.asarray(l), rep), (head, opt_state))
        key = jax.random.PRNGKey(seed)

        @jax.jit
        def step(head, opt_state, mu_i, mu_m):
            # concat + labels INSIDE jit: eager concatenate is rejected on
            # cross-process global arrays (spmd_mode=allow_jit)
            mu = jnp.concatenate([mu_i, mu_m])
            labels = jnp.concatenate([jnp.ones(mu_i.shape[0]),
                                      jnp.zeros(mu_m.shape[0])])

            def loss_fn(h):
                logit = mu @ h['w'] + h['b']
                return jnp.mean(optax.sigmoid_binary_cross_entropy(
                    logit, labels))
            loss, grads = jax.value_and_grad(loss_fn)(head)
            updates, opt_state = tx.update(grads, opt_state, head)
            return optax.apply_updates(head, updates), opt_state, loss

        for epoch in range(epochs):
            li = DataLoader(ind, batch_size, seed=seed + epoch)
            lm = DataLoader(moving, batch_size, seed=seed + epoch + 1)
            for i, ((xi, _), (xm, _)) in enumerate(zip(li, lm)):
                k = jax.random.fold_in(key, epoch * 10000 + i)
                mu_i = self._mu(put_x(xi), k)
                mu_m = self._mu(put_x(xm), jax.random.fold_in(k, 1))
                head, opt_state, loss = step(head, opt_state, mu_i, mu_m)
        self.head = head
        return self

    def llr_scores(self, dataset: ArrayDataset, batch_size: int = 256,
                   seed: int = 0, mesh=None) -> np.ndarray:
        assert self.head is not None, 'finetune first'
        from ..parallel.mesh import host_get
        put_x = self._putter(dataset, mesh)

        @jax.jit
        def score(head, mu):
            return mu @ head['w'] + head['b']

        out = []
        key = jax.random.PRNGKey(seed)
        for i, (x, _) in enumerate(DataLoader(dataset, batch_size,
                                              shuffle=False)):
            mu = self._mu(put_x(x), jax.random.fold_in(key, i))
            out.append(score(self.head, mu))
        return np.concatenate([np.asarray(a) for a in host_get(out)])

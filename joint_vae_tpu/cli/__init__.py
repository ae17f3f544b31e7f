"""Command-line drivers: train / test / sample / ft (WIM)."""


def add_platform_arg(parser):
    """Attach --platform to a CLI parser (ref --device/--force-cpu,
    utils/parameters.py:96-99).  Every driver takes it: the sandbox's
    sitecustomize initializes jax on the tunneled TPU, so CPU smoke runs
    need an in-process override."""
    parser.add_argument('--platform', choices=['cpu', 'tpu', 'gpu'],
                        default=None,
                        help='force the jax backend (ref --device)')
    parser.add_argument('--device', dest='platform_device', default=None,
                        help="reference spelling: 'cuda'/'tpu' map to the "
                             "accelerator backend, 'cpu' to cpu")
    parser.add_argument('--force-cpu', action='store_true',
                        help='force the cpu backend (ref --force-cpu)')
    return parser


def apply_platform(args):
    """Force the jax backend chosen by --platform/--device/--force-cpu,
    before first dispatch."""
    platform = getattr(args, 'platform', None)
    if getattr(args, 'force_cpu', False):
        platform = 'cpu'
    elif not platform and getattr(args, 'platform_device', None):
        dev = args.platform_device
        platform = {'cuda': 'tpu', 'gpu': 'gpu'}.get(dev, dev)
        if platform not in ('cpu', 'tpu', 'gpu'):
            platform = None
    if platform:
        import jax
        jax.config.update('jax_platforms', platform)
    # persistent XLA compile cache: repeat CLI runs skip the first-compile
    # wait (JVT_COMPILE_CACHE=0 disables; utils/device.py)
    from ..utils.device import enable_compilation_cache
    enable_compilation_cache()


def add_mesh_args(parser):
    """Mesh/multi-host flags shared by the train and ft CLIs.  The
    reference scaled out by SLURM job arrays (SURVEY section 2); the
    TPU-native equivalent is one jax.sharding.Mesh over every chip of
    every host, fed by the trainer's ``mesh=`` path."""
    parser.add_argument('--mesh', nargs='?', const='all', default=None,
                        metavar='N',
                        help="run over a ('data','model') device mesh of N "
                             'devices (default: all); implied by '
                             '--distributed')
    parser.add_argument('--model-axis', type=int, default=1,
                        help="size of the mesh 'model' axis (prior "
                             'dictionary / classifier head sharding)')
    parser.add_argument('--sample-axis', type=int, default=1,
                        help="size of the mesh 'sample' axis (shards the "
                             'latent-sample dim L during eval)')
    parser.add_argument('--distributed', action='store_true',
                        help='initialize jax.distributed (multi-host pod); '
                             'run this same command on every host')
    return parser


def mesh_from_args(args):
    """-> jax.sharding.Mesh or None from add_mesh_args flags.  Multi-host
    contexts (--distributed or an auto-detected pod) always get a mesh —
    train_model/finetune refuse process_count>1 without one."""
    import jax
    distributed = getattr(args, 'distributed', False)
    if distributed:
        from ..parallel.mesh import distributed_init
        distributed_init()
    # --distributed implies a mesh even when the launch resolves to one
    # process (single-host pod rehearsal must behave like the pod)
    if args.mesh is None and jax.process_count() == 1 and not distributed:
        if args.model_axis > 1 or args.sample_axis > 1:
            raise SystemExit('--model-axis/--sample-axis need --mesh')
        return None
    from ..parallel.mesh import make_mesh
    n = None if args.mesh in (None, 'all') else int(args.mesh)
    return make_mesh(n, model_axis=args.model_axis,
                     sample_axis=args.sample_axis)


def find_job_dirs(root):
    """Every directory under root holding a params.json (a job dir) —
    shared by the import/export --scan walkers."""
    import os
    for dirpath, dirnames, filenames in os.walk(root):
        if 'params.json' in filenames:
            dirnames[:] = []                # job dirs don't nest
            yield dirpath


def convert_job_batch(sources, rel_root, out_root, convert, dry_run):
    """Shared --scan batch loop for the import/export CLIs: relative-layout
    preservation, basename-collision uniquification, per-job error
    isolation (a corrupt job must not abort the rest of the batch).

    ``convert(src, dst)`` does the work; returns (done, failed)."""
    import logging
    import os
    done, failed = 0, 0
    taken = set()
    for src in sources:
        src = os.path.abspath(src)
        if rel_root and src.startswith(rel_root + os.sep):
            rel = os.path.relpath(src, rel_root)
        else:
            rel = os.path.basename(src.rstrip(os.sep))
        # two explicit sources may share a basename (e.g. .../mnist/.../7
        # and .../cifar/.../7) — never let the second overwrite the first
        base, n = rel, 1
        while rel in taken:
            rel = '{}-{}'.format(base, n)
            n += 1
        taken.add(rel)
        dst = os.path.join(out_root, rel)
        if dry_run:
            print('{} -> {}'.format(src, dst))
            continue
        try:
            convert(src, dst)
            done += 1
        except Exception as e:
            logging.error('%s not converted: %s: %s',
                          src, type(e).__name__, e)
            failed += 1
    return done, failed

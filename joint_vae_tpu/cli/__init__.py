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

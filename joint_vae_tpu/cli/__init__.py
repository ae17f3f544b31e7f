"""Command-line drivers: train / test / sample / ft (WIM)."""


def add_platform_arg(parser):
    """Attach --platform to a CLI parser (ref --device/--force-cpu,
    utils/parameters.py:96-99).  Every driver takes it: the sandbox's
    sitecustomize initializes jax on the tunneled TPU, so CPU smoke runs
    need an in-process override."""
    parser.add_argument('--platform', choices=['cpu', 'tpu', 'gpu'],
                        default=None,
                        help='force the jax backend (ref --device)')
    return parser


def apply_platform(args):
    """Force the jax backend chosen by --platform, before first dispatch."""
    if getattr(args, 'platform', None):
        import jax
        jax.config.update('jax_platforms', args.platform)

"""Test harness config.

Two jobs, both of which must happen before the first JAX dispatch:

1. Route tests to the CPU backend.  The sandbox bakes a ``sitecustomize``
   (PYTHONPATH=/root/.axon_site) that imports jax at interpreter start and
   registers the remote-TPU 'axon' backend with JAX_PLATFORMS=axon; its relay
   handshake intermittently stalls the first dispatch for ~90s.  Because jax
   is already imported before this conftest runs, setting the env var is too
   late — we must update jax.config directly.

2. Force an 8-device virtual CPU mesh so multi-chip sharding tests run
   without TPU hardware (SURVEY.md section 4 implication d).
"""

import os

_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (_flags + ' --xla_force_host_platform_device_count=8').strip()

# Persistent compilation cache across pytest runs — fingerprinted per
# host CPU type: the repo volume is shared across rounds that may run on
# different machine instances, and XLA:CPU executing a foreign AOT entry
# can SIGILL (it only warns via cpu_aot_loader; observed killing an mp
# worker).  Same policy as utils/device.enable_compilation_cache.
if 'JAX_COMPILATION_CACHE_DIR' not in os.environ:
    import hashlib
    import platform
    try:
        with open('/proc/cpuinfo') as _f:
            _flags = next((' '.join(sorted(l.split(':', 1)[1].split()))
                           for l in _f if l.startswith(('flags', 'Features'))),
                          '')
    except OSError:
        _flags = ''
    _fp = hashlib.sha1('|'.join((platform.machine(),
                                 platform.processor() or '',
                                 _flags)).encode()).hexdigest()[:12]
    os.environ['JAX_COMPILATION_CACHE_DIR'] = \
        '/root/repo/.jax_cache-' + _fp
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES', '-1')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '0.1')

os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption('--runslow', action='store_true', default=False,
                     help='also run slow tests (oracle campaigns, e2e '
                          'trainers) — the full ~30 min suite')


def pytest_collection_modifyitems(config, items):
    """Two tiers: the default run is the fast (<10 min) edit-verify loop;
    `--runslow` runs everything; `-m slow` runs only the slow tier."""
    if config.getoption('--runslow') or config.getoption('-m'):
        return
    skip = pytest.mark.skip(reason='slow tier: pass --runslow or -m slow')
    for item in items:
        if 'slow' in item.keywords:
            item.add_marker(skip)

"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding is validated the TPU way — without a pod — by asking XLA
for 8 virtual host devices and building a real ``jax.sharding.Mesh`` over
them (SURVEY.md §4d).

The session environment pins ``JAX_PLATFORMS=axon`` (real-TPU tunnel) and a
sitecustomize pre-imports jax, so env vars alone are too late here; the
platform must be overridden through ``jax.config`` before the first backend
resolution.
"""

import os

# Opt-in suites that must run on the REAL TPU (platform left as the
# environment provides, i.e. axon):
#   GLOWTTS_RUN_CONVERGENCE=1 → tests/test_convergence.py (trains for real)
#   GLOWTTS_RUN_DEVICE=1      → tests/test_device_parity.py (drives the
#                               Pallas kernels on hardware)
# Every other pytest invocation gets the virtual CPU mesh below.  A
# collection-time guard (bottom of this file) errors out if the rest of
# the suite is collected while one of these flags is set — the 8-device
# mesh tests cannot run on the single axon chip.
_DEVICE_ONLY_MODULES = {
    'GLOWTTS_RUN_CONVERGENCE': 'test_convergence.py',
    'GLOWTTS_RUN_DEVICE': 'test_device_parity.py',
}
_active_device_flags = [flag for flag in _DEVICE_ONLY_MODULES
                        if os.environ.get(flag) == '1']
_keep_platform = bool(_active_device_flags)

flags = os.environ.get('XLA_FLAGS', '')
if not _keep_platform and \
        '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

if not _keep_platform:
    os.environ['JAX_PLATFORMS'] = 'cpu'
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_default_matmul_precision', 'highest')

# Persistent compilation cache: the test box has one CPU core and XLA
# compiles dominate the suite runtime; cache across runs.
_cache_dir = os.path.join(os.path.dirname(__file__), '.jax_cache')
jax.config.update('jax_compilation_cache_dir', _cache_dir)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)

if not _keep_platform:
    assert jax.devices()[0].platform == 'cpu' and len(jax.devices()) == 8, (
        'tests require the 8-device virtual CPU platform')


def pytest_collection_modifyitems(config, items):
    """With a device flag set, refuse to run anything but that flag's own
    module: the platform override above was skipped for the whole
    process, so the CPU-mesh tests would all land on the single TPU."""
    if not _keep_platform:
        return
    allowed = {_DEVICE_ONLY_MODULES[flag] for flag in _active_device_flags}
    stray = sorted({os.path.basename(str(item.fspath)) for item in items}
                   - allowed)
    if stray:
        import pytest
        raise pytest.UsageError(
            f'{"/".join(_active_device_flags)} is set: run only '
            f'{sorted(allowed)} in this invocation (collected {stray}); '
            f'the virtual CPU mesh override is disabled process-wide')

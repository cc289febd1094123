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

# The opt-in convergence regression (tests/test_convergence.py) trains for
# real and must run on the TPU — invoke it ALONE with
# GLOWTTS_RUN_CONVERGENCE=1 and the platform is left as the environment
# provides (axon).  Every other pytest invocation gets the virtual CPU
# mesh below.
_keep_platform = os.environ.get('GLOWTTS_RUN_CONVERGENCE') == '1'

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

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

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_default_matmul_precision', 'highest')

assert jax.devices()[0].platform == 'cpu' and len(jax.devices()) == 8, (
    'tests require the 8-device virtual CPU platform')

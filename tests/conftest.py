import os
import sys

# Tests run on CPU with 8 virtual devices so multi-chip sharding logic is exercised without
# TPU hardware (SURVEY.md section 4 item (d)). Must be set before jax is imported.
# Force CPU even if the surrounding environment points at a TPU: tests need deterministic
# fp32 math (TPU default matmul precision is bf16) and 8 virtual devices. A sitecustomize
# in this image may have registered a TPU PJRT plugin at interpreter start, so the env var
# alone is not enough; jax.config must be updated too (before any backend use).
os.environ['JAX_PLATFORMS'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (_flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
assert jax.default_backend() == 'cpu'
assert jax.device_count() == 8, jax.devices()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_ROOT = '/root/reference'


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_ROOT)

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
    _flags = (_flags + ' --xla_force_host_platform_device_count=8').strip()
# The XLA:CPU in-process communicator aborts the whole process when a collective
# rendezvous takes >40 s to assemble (hardcoded default). On a 1-core host, 8 virtual
# device threads timeshare one core, so a heavily-sharded step (seq=4 halo exchanges)
# can legitimately take minutes to line all 8 threads up at a collective-permute.
# Raise the warn/terminate thresholds so slow scheduling is not treated as deadlock.
if 'collective_call_terminate' not in _flags:
    _flags += (' --xla_cpu_collective_call_warn_stuck_timeout_seconds=120'
               ' --xla_cpu_collective_call_terminate_timeout_seconds=1200')
os.environ['XLA_FLAGS'] = _flags

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


# ---------------------------------------------------------------------------
# Fast/slow split: `pytest -m "not slow"` is the quick iteration loop (~2 min on a 1-core
# host); the full suite runs everything. Tests are marked here centrally by measured
# duration (>= ~10 s on the CI host) rather than decorating each file.
# ---------------------------------------------------------------------------

_SLOW_EXACT = {
    'test_golden_parity_vs_reference[0-divided_space_time]',
    'test_golden_parity_vs_reference[1-divided_space_time]',
    'test_temporal_causality[1]',
    'test_temporal_causality[2]',
    'test_temporal_causality[3]',
    'test_non_causal_has_future_gradients[0]',
    'test_non_causal_has_future_gradients[-1]',
    'test_golden_parity_vs_reference[3-divided_space_time]',
}

_SLOW_BASE = {
    'test_train_bootstrap_from_pth',
    'test_pth_loads_and_matches_torch_backbone',
    'test_seeker_shapes_and_coarsening',
    'test_remat_group_gradient_equivalence',
    'test_backbone_shapes_divided',
    'test_compact_batch_matches_legacy_and_shards',
    'test_data_parallel_matches_single_device',
    'test_train_step_nan_skip',
    'test_train_step_runs_and_learns',
    'test_full_seeker_parity_vs_torch',
    'test_seq4_sequence_parallel_train_step_small',
    'test_streaming_prefix_invariance',
    'test_windowed_matches_unbounded_before_wrap',
    'test_driver_trains_and_resumes',
    'test_multihost_smoke',
    'test_resnet_shapes_and_channel_swap',
    'test_eval_cli_with_pth_resume',
    'test_backbone_shapes_joint',
    'test_param_count_matches_reference_scale',
}


def pytest_collection_modifyitems(config, items):
    import pytest
    for item in items:
        if item.name in _SLOW_EXACT or item.name.split('[')[0] in _SLOW_BASE:
            item.add_marker(pytest.mark.slow)

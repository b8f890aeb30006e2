'''
Gradient accumulation (--grad_accum): microbatched forward+backward under lax.scan with
one optimizer update — the single-chip substitute for batches past HBM (VERDICT round 2,
task 5; reference regime: batch 2 on 48 GB GPUs, /root/reference/README.md:42-49).

Exactness caveat under test: each microbatch's losses are their own batch-global masked
means (selection-count normalizers, class balancing — objectives/losses.py), so the
averaged gradient matches a true large batch only up to those normalizers. The trajectory
test bounds the deviation over several optimizer steps.
'''

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import conftest  # noqa: F401
from tcow_tpu.data.synthetic import synthetic_device_batch
from tcow_tpu.models.mask_tracker import SeekerConfig
from tcow_tpu.objectives.losses import LossConfig
from tcow_tpu.train import optim, step as step_lib


@pytest.fixture(scope='module')
def small_model():
    from tcow_tpu.models import timesformer as tsf
    old = dict(tsf.DEPTH_PRESETS)
    tsf.DEPTH_PRESETS[2] = (32, 4)
    yield
    tsf.DEPTH_PRESETS.clear()
    tsf.DEPTH_PRESETS.update(old)


def _cfg_state():
    seeker = SeekerConfig(num_total_frames=4, frame_height=32, frame_width=32,
                          causal_attention=1, drop_path_rate=0.0, network_depth=2)
    cfg = step_lib.StepConfig(seeker=seeker, loss=LossConfig(), num_queries=2)
    tx = optim.make_optimizer('adamw', learn_rate=1e-3, num_epochs=10, steps_per_epoch=5)
    state = step_lib.init_train_state(jax.random.key(0), cfg, tx)
    return cfg, tx, state


@pytest.mark.parametrize('accum', [2, 4])
def test_grad_accum_tracks_true_batch(small_model, accum):
    '''3 AdamW steps at B=4 with grad_accum vs the true B=4 step: losses and updated
    params must track closely (not bit-exact — per-microbatch loss normalizers).'''
    cfg, tx, state = _cfg_state()
    step_true = jax.jit(step_lib.make_train_step(cfg, tx))
    step_acc = jax.jit(step_lib.make_train_step(cfg, tx, grad_accum=accum))

    s1, s2 = state, state
    for i in range(3):
        batch = {k: jnp.asarray(v)
                 for k, v in synthetic_device_batch(10 + i, B=4, Q=2, T=4, H=32, W=32,
                                                    M=6, K=3).items()}
        s1, a1 = step_true(s1, batch, jnp.float32(i / 100))
        s2, a2 = step_acc(s2, batch, jnp.float32(i / 100))
        np.testing.assert_allclose(float(a2['total_seeker']), float(a1['total_seeker']),
                                   rtol=0.05, err_msg=f'step {i}')
        assert float(a2['skipped_nonfinite']) == 0.0
    # Updated parameters stay close after 3 steps: the per-microbatch normalizer drift is
    # bounded by ~1 AdamW lr-step per step (3 x lr=1e-3 applied). Smaller microbatches
    # diverge more (B=1 microbatches have the most different class-balance/top-k
    # normalizers): measured max |delta| ~9e-4 at accum=2, ~3e-3 at accum=4, on <0.1% of
    # elements.
    atol = {2: 2e-3, 4: 5e-3}[accum]
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol)


def test_grad_accum_metric_sums_are_sums(small_model):
    '''metric_sums are masked COUNTS over the whole batch: accumulation must sum them
    across microbatches, not average them.'''
    cfg, tx, state = _cfg_state()
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_device_batch(3, B=4, Q=2, T=4, H=32, W=32,
                                                M=6, K=3).items()}
    _, a1 = jax.jit(step_lib.make_train_step(cfg, tx))(state, batch, jnp.float32(0.0))
    _, a2 = jax.jit(step_lib.make_train_step(cfg, tx, grad_accum=2))(
        state, batch, jnp.float32(0.0))
    np.testing.assert_allclose(float(a2['metric_sums']['count_snitch_iou']),
                               float(a1['metric_sums']['count_snitch_iou']), rtol=1e-6)


def test_grad_accum_nan_microbatch_skips_update(small_model):
    '''A NaN in ANY microbatch poisons the averaged loss -> the whole update is skipped
    (same lax-select skip as the unaccumulated step).'''
    cfg, tx, state = _cfg_state()
    batch_np = synthetic_device_batch(4, B=4, Q=2, T=4, H=32, W=32, M=6, K=3)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    batch['rgb'] = batch['rgb'].at[3, 0, 0, 0, 0].set(jnp.nan)  # last microbatch only
    step_acc = jax.jit(step_lib.make_train_step(cfg, tx, grad_accum=2))
    s2, aux = step_acc(state, batch, jnp.float32(0.0))
    assert float(aux['skipped_nonfinite']) == 1.0
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_driver_validates_grad_accum():
    from tcow_tpu import config as config_lib
    from tcow_tpu.train import driver as driver_lib
    args = config_lib.train_args(['--name', 'ga', '--data_path', '/tmp/nonexistent',
                                  '--batch_size', '3', '--grad_accum', '2'])
    assert args.grad_accum == 2
    # The divisibility check lives in the driver body; replicate its guard logic here
    # (running the full driver needs a dataset).
    assert args.batch_size % args.grad_accum != 0

'''
Stretch configuration (BASELINE.json config 5 / SURVEY.md section 5.7): ViT-L-depth
backbone with sequence-parallel sharding of the divided attention over the mesh's seq axis.
Spatial dims are scaled down for the 8-CPU-device harness; the sharding topology (data=2 x
seq=4) is the real thing.
'''

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import conftest  # noqa: F401
from tcow_tpu.data.synthetic import synthetic_device_batch
from tcow_tpu.models.mask_tracker import SeekerConfig
from tcow_tpu.objectives.losses import LossConfig
from tcow_tpu.parallel import mesh as mesh_lib
from tcow_tpu.train import optim, step as step_lib


def test_seq4_sequence_parallel_train_step_small():
    '''Fast default variant: same data=2 x seq=4 topology on a small backbone.'''
    from tcow_tpu.models import timesformer as tsf
    old = dict(tsf.DEPTH_PRESETS)
    tsf.DEPTH_PRESETS[2] = (32, 4)
    try:
        mesh = mesh_lib.make_mesh(seq=4)
        seeker = SeekerConfig(num_total_frames=8, frame_height=32, frame_width=64,
                              causal_attention=1, drop_path_rate=0.0, network_depth=2,
                              batch_axis=mesh_lib.DATA_AXIS, seq_axis=mesh_lib.SEQ_AXIS)
        cfg = step_lib.StepConfig(seeker=seeker, loss=LossConfig(), num_queries=1)
        tx = optim.make_optimizer('adamw', 1e-4, num_epochs=10, steps_per_epoch=10)
        state = step_lib.init_train_state(jax.random.key(0), cfg, tx)
        batch_np = synthetic_device_batch(0, B=2, Q=1, T=8, H=32, W=64, M=6, K=3)
        train_step = jax.jit(step_lib.make_train_step(cfg, tx))
        with jax.set_mesh(mesh):
            state_r = mesh_lib.replicate_tree(state, mesh)
            batch = mesh_lib.shard_batch(batch_np, mesh)
            _, aux = train_step(state_r, batch, jnp.float32(0.0))
            assert np.isfinite(float(aux['total_seeker']))
    finally:
        tsf.DEPTH_PRESETS.clear()
        tsf.DEPTH_PRESETS.update(old)


def test_sequence_parallel_matches_unsharded():
    '''Sequence sharding is an execution-layout hint: outputs must match the unsharded
    forward bit-for-float.'''
    import dataclasses
    from tcow_tpu.models import timesformer as tsf
    cfg = tsf.TimeSformerConfig(frame_height=32, frame_width=64, patch_size=16,
                                in_channels=4, num_frames=8, depth=2, embed_dim=32,
                                num_heads=4, causal_attention=1, drop_path_rate=0.0)
    params = tsf.init_params(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (2, 4, 8, 32, 64))
    feats_ref, cls_ref = jax.jit(lambda p, x: tsf.forward(p, cfg, x))(params, x)

    cfg_sp = dataclasses.replace(cfg, batch_axis=mesh_lib.DATA_AXIS,
                                 seq_axis=mesh_lib.SEQ_AXIS)
    mesh = mesh_lib.make_mesh(seq=4)
    with jax.set_mesh(mesh):
        params_r = mesh_lib.replicate_tree(params, mesh)
        x_sh = jax.device_put(x, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(mesh_lib.DATA_AXIS)))
        feats_sp, cls_sp = jax.jit(lambda p, x: tsf.forward(p, cfg_sp, x))(params_r, x_sh)
    np.testing.assert_allclose(np.asarray(feats_sp), np.asarray(feats_ref),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cls_sp), np.asarray(cls_ref),
                               rtol=2e-5, atol=1e-6)


@pytest.mark.skipif(os.environ.get('TCOW_RUN_SLOW', '') != '1',
                    reason='~20 min on the 1-core CI host; set TCOW_RUN_SLOW=1')
def test_vit_l_sequence_parallel_train_step():
    mesh = mesh_lib.make_mesh(seq=4)
    assert dict(mesh.shape) == {'data': 2, 'seq': 4, 'model': 1, 'pipe': 1}

    seeker = SeekerConfig(
        num_total_frames=8, frame_height=32, frame_width=64, causal_attention=1,
        drop_path_rate=0.0, network_depth=24,  # ViT-L preset: D=1024, 16 heads
        remat=True, batch_axis=mesh_lib.DATA_AXIS, seq_axis=mesh_lib.SEQ_AXIS)
    cfg = step_lib.StepConfig(seeker=seeker, loss=LossConfig(), num_queries=1)
    tx = optim.make_optimizer('adamw', 1e-4, num_epochs=10, steps_per_epoch=10)
    state = step_lib.init_train_state(jax.random.key(0), cfg, tx)

    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(state.params))
    assert n_params > 250e6  # genuinely the large model

    batch_np = synthetic_device_batch(0, B=2, Q=1, T=8, H=32, W=64, M=6, K=3)
    train_step = jax.jit(step_lib.make_train_step(cfg, tx))
    with jax.set_mesh(mesh):
        state_r = mesh_lib.replicate_tree(state, mesh)
        batch = mesh_lib.shard_batch(batch_np, mesh)
        state_r, aux = train_step(state_r, batch, jnp.float32(0.0))
        loss = float(aux['total_seeker'])
    assert np.isfinite(loss), loss

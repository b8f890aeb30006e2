'''
Pipeline-parallelism tests (timesformer._gpipe_scan + parallel/mesh.py block_pspec).

A capability the reference does not have (its only parallelism is torch DataParallel,
/root/reference/train.py:222-223): the stacked block scan is split into contiguous stages
over the 'pipe' mesh axis and microbatches stream through them GPipe-style. The schedule
is gradient-exact vs the sequential scan, so these tests assert numerical equivalence with
single-device execution — forward, gradients, and the full jitted train step — plus the
stage-sharded parameter placement.
'''

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import conftest  # noqa: F401
from tcow_tpu.data.synthetic import synthetic_device_batch
from tcow_tpu.models.mask_tracker import SeekerConfig
from tcow_tpu.models import timesformer as tsf
from tcow_tpu.objectives.losses import LossConfig
from tcow_tpu.parallel import mesh as mesh_lib
from tcow_tpu.train import optim, step as step_lib


@pytest.fixture(scope='module')
def small_presets():
    old = dict(tsf.DEPTH_PRESETS)
    tsf.DEPTH_PRESETS[2] = (32, 4)
    tsf.DEPTH_PRESETS[4] = (32, 4)
    yield
    tsf.DEPTH_PRESETS.clear()
    tsf.DEPTH_PRESETS.update(old)


def _backbone_cfg(**kw):
    base = dict(frame_height=32, frame_width=32, patch_size=16, in_channels=4,
                num_frames=4, depth=4, embed_dim=32, num_heads=4, causal_attention=1,
                drop_path_rate=0.0)
    base.update(kw)
    return tsf.TimeSformerConfig(**base)


def test_gpipe_forward_and_grads_match_sequential(small_presets):
    '''Mesh-free microbatched schedule (pipe_axis=None): same math as the sequential
    scan up to GEMM-shape float reassociation, including under remat and remat_group.'''
    cfg = _backbone_cfg()
    params = tsf.init_params(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (4, 4, 4, 32, 32), jnp.float32)

    def grads(c):
        def f(p, x):
            a, cls = tsf.forward(p, c, x)
            return jnp.mean(a ** 2) + jnp.mean(cls ** 2)
        return jax.jit(jax.grad(f))(params, x)

    a1, c1 = jax.jit(lambda p, x: tsf.forward(p, cfg, x))(params, x)
    for pp_kw in (dict(pp_stages=2, pp_microbatches=2),
                  dict(pp_stages=4, pp_microbatches=2),
                  dict(pp_stages=2, pp_microbatches=4),
                  dict(pp_stages=2, pp_microbatches=0),  # dynamic default -> M=4 (B=4)
                  dict(pp_stages=2, pp_microbatches=2, remat=True,
                       remat_policy='dots_nb'),
                  dict(pp_stages=2, pp_microbatches=4, remat=True, remat_group=2)):
        cfg_pp = dataclasses.replace(cfg, **pp_kw)
        a2, c2 = jax.jit(lambda p, x: tsf.forward(p, cfg_pp, x))(params, x)
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=2e-6,
                                   err_msg=str(pp_kw))
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=2e-6,
                                   err_msg=str(pp_kw))
        g1 = grads(dataclasses.replace(cfg, remat=cfg_pp.remat,
                                       remat_policy=cfg_pp.remat_policy,
                                       remat_group=cfg_pp.remat_group))
        g2 = grads(cfg_pp)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)


def test_resolve_pp_microbatches_default():
    '''--pp_microbatches 0 picks the largest of (4S, 2S, S) dividing the folded rows —
    amortizing the GPipe bubble (S-1)/(M+S-1) — and honors explicit requests verbatim.'''
    assert tsf.resolve_pp_microbatches(0, 2, 8) == 8    # 4S divides
    assert tsf.resolve_pp_microbatches(0, 2, 12) == 4   # 4S=8 doesn't, 2S=4 does
    assert tsf.resolve_pp_microbatches(0, 2, 6) == 2    # 8>6 and 6%4!=0 -> S
    assert tsf.resolve_pp_microbatches(0, 2, 2) == 2    # only S fits
    assert tsf.resolve_pp_microbatches(0, 4, 64) == 16  # 4S
    assert tsf.resolve_pp_microbatches(0, 2, 3) == 2    # nothing divides -> S (asserted
    assert tsf.resolve_pp_microbatches(3, 2, 8) == 3    # downstream); explicit wins


def test_gpipe_droppath_runs_and_decorrelates(small_presets):
    '''Drop-path under PP folds the microbatch index into the per-block key: output stays
    finite and differs across microbatches fed identical rows (independent masks).'''
    cfg = _backbone_cfg(drop_path_rate=0.5, pp_stages=2, pp_microbatches=2)
    params = tsf.init_params(jax.random.key(0), cfg)
    row = jax.random.normal(jax.random.key(1), (1, 4, 4, 32, 32), jnp.float32)
    x = jnp.concatenate([row, row], axis=0)  # microbatch 0 and 1 see the same row
    a, c = jax.jit(lambda p, x, r: tsf.forward(p, cfg, x, train=True, rng=r))(
        params, x, jax.random.key(3))
    assert bool(jnp.isfinite(a).all() and jnp.isfinite(c).all())
    # With rate 0.5 and independent per-(b, n) masks the two copies virtually never agree.
    assert float(jnp.max(jnp.abs(a[0] - a[1]))) > 0


def _cfg_state_batch(seed=0):
    seeker = SeekerConfig(num_total_frames=4, frame_height=32, frame_width=32,
                          causal_attention=1, drop_path_rate=0.0, network_depth=2)
    cfg = step_lib.StepConfig(seeker=seeker, loss=LossConfig(), num_queries=2)
    tx = optim.make_optimizer('adamw', learn_rate=1e-3, num_epochs=10, steps_per_epoch=5)
    state = step_lib.init_train_state(jax.random.key(seed), cfg, tx)
    batch_np = synthetic_device_batch(3, B=4, Q=2, T=4, H=32, W=32, M=6, K=3)
    return cfg, tx, state, batch_np


def test_pipeline_parallel_matches_single_device(small_presets):
    '''(data=4, pipe=2) mesh: stage-sharded block params (leading axis over 'pipe'),
    CollectivePermute stage handoff, loss and updated params == single-device.'''
    cfg, tx, state, batch_np = _cfg_state_batch()
    train_step = jax.jit(step_lib.make_train_step(cfg, tx))
    state1, aux1 = train_step(state, {k: jnp.asarray(v) for k, v in batch_np.items()},
                              jnp.float32(0.0))

    mesh = mesh_lib.make_mesh(pipe=2)
    assert dict(mesh.shape) == {'data': 4, 'seq': 1, 'model': 1, 'pipe': 2}
    seeker_pp = dataclasses.replace(cfg.seeker, batch_axis=mesh_lib.DATA_AXIS,
                                    pipe_axis=mesh_lib.PIPE_AXIS, pp_stages=2,
                                    pp_microbatches=2)
    cfg_pp = dataclasses.replace(cfg, seeker=seeker_pp)
    step_pp = jax.jit(step_lib.make_train_step(cfg_pp, tx))
    P = jax.sharding.PartitionSpec
    with jax.set_mesh(mesh):
        state_s = mesh_lib.shard_state(state, mesh, pipeline=True)
        blocks = state_s.params['backbone']['blocks']
        # Every stacked block leaf leads with the pipe axis; non-block leaves replicate.
        assert blocks['mlp']['fc1']['w'].sharding.spec == P('pipe', None, None)
        assert blocks['attn']['qkv']['w'].sharding.spec == P('pipe', None, None)
        assert state_s.params['backbone']['pos_embed'].sharding.spec == P()
        batch_sh = mesh_lib.shard_batch(batch_np, mesh)
        state_pp, aux_pp = step_pp(state_s, batch_sh, jnp.float32(0.0))
        loss_pp = float(aux_pp['total_seeker'])
    np.testing.assert_allclose(loss_pp, float(aux1['total_seeker']), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state1.params), jax.tree.leaves(state_pp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)


def test_pipeline_with_tp_and_dp(small_presets):
    '''Full (data=2, model=2, pipe=2) mesh: DP x TP x PP composed in one jitted step —
    Megatron-sharded stage chunks (P('pipe', 'model', ...)) + GPipe schedule.'''
    cfg, tx, state, batch_np = _cfg_state_batch()
    train_step = jax.jit(step_lib.make_train_step(cfg, tx))
    _, aux1 = train_step(state, {k: jnp.asarray(v) for k, v in batch_np.items()},
                         jnp.float32(0.0))

    mesh = mesh_lib.make_mesh(model=2, pipe=2)
    seeker3 = dataclasses.replace(cfg.seeker, batch_axis=mesh_lib.DATA_AXIS,
                                  model_axis=mesh_lib.MODEL_AXIS,
                                  pipe_axis=mesh_lib.PIPE_AXIS, pp_stages=2,
                                  pp_microbatches=2)
    cfg3 = dataclasses.replace(cfg, seeker=seeker3)
    step3 = jax.jit(step_lib.make_train_step(cfg3, tx))
    P = jax.sharding.PartitionSpec
    with jax.set_mesh(mesh):
        state_s = mesh_lib.shard_state(state, mesh, tensor_parallel=True, pipeline=True)
        blocks = state_s.params['backbone']['blocks']
        assert blocks['attn']['qkv']['w'].sharding.spec == P('pipe', 'model', None)
        assert blocks['mlp']['fc1']['w'].sharding.spec == P('pipe', None, 'model')
        batch_sh = mesh_lib.shard_batch(batch_np, mesh)
        _, aux3 = step3(state_s, batch_sh, jnp.float32(0.0))
        loss3 = float(aux3['total_seeker'])
    np.testing.assert_allclose(loss3, float(aux1['total_seeker']), rtol=1e-5)


def test_driver_validates_pp_divisibility(tmp_path):
    '''The train driver rejects indivisible pp configs up front.'''
    from tcow_tpu import config as config_lib
    from tcow_tpu.train import driver as driver_lib

    dp = ['--data_path', '/tmp/nonexistent',
          '--checkpoint_root', str(tmp_path / 'ckpt'),
          '--log_root', str(tmp_path / 'logs')]
    args = config_lib.train_args(['--name', 'ppbad', '--pp_stages', '5'] + dp)
    with pytest.raises(ValueError, match='pp_stages'):
        driver_lib.validate_pp_args(args)
    args2 = config_lib.train_args(['--name', 'ppbad2', '--pp_stages', '2',
                                   '--pp_microbatches', '7'] + dp)
    with pytest.raises(ValueError, match='pp_microbatches'):
        driver_lib.validate_pp_args(args2)
    # depth % remat_group != 0 passed the old floor-division check (12 // 5 = 2) and then
    # died on a bare shape assert deep inside jit (advisor finding, round 2).
    args3 = config_lib.train_args(['--name', 'ppbad3', '--pp_stages', '2',
                                   '--remat_group', '5', '--batch_size', '2',
                                   '--num_queries', '2'] + dp)
    with pytest.raises(ValueError, match='remat_group'):
        driver_lib.validate_pp_args(args3)
    ok = config_lib.train_args(['--name', 'ppok', '--pp_stages', '2', '--batch_size',
                                '2', '--num_queries', '2'] + dp)
    assert driver_lib.validate_pp_args(ok) == 2


def test_vis_step_under_pipeline_parallel(small_presets):
    '''make_vis_step must run under a PP config whose microbatch count does not divide the
    example-0 sliced batch (1 * num_queries): the vis forward drops to the sequential scan
    (same math), so overlays render instead of tripping _gpipe_scan's divisibility assert
    on every interval (advisor finding, round 2 — num_queries=1, pp_stages=2 reproduced).'''
    seeker = SeekerConfig(num_total_frames=4, frame_height=32, frame_width=32,
                          causal_attention=1, drop_path_rate=0.0, network_depth=2,
                          pp_stages=2, pp_microbatches=2)
    cfg = step_lib.StepConfig(seeker=seeker, loss=LossConfig(), num_queries=1)
    tx = optim.make_optimizer('adamw', learn_rate=1e-3, num_epochs=10, steps_per_epoch=5)
    state = step_lib.init_train_state(jax.random.key(0), cfg, tx)
    batch_np = synthetic_device_batch(3, B=2, Q=1, T=4, H=32, W=32, M=6, K=3)
    vis_step = jax.jit(step_lib.make_vis_step(cfg))
    out = vis_step(state.params, {k: jnp.asarray(v) for k, v in batch_np.items()},
                   jnp.float32(0.0))
    assert np.isfinite(float(out['total_seeker']))
    assert out['output_mask'].shape[0] == 1

'''
Train-step tests: single-device smoke + overfit trend, NaN skip, data-parallel execution over
the 8-device CPU mesh (equivalence with single-device), checkpoint roundtrip, LR schedule.
'''

import os

import numpy as np
import pytest
import jax
import optax
import jax.numpy as jnp

import conftest  # noqa: F401
from tcow_tpu.data.synthetic import synthetic_device_batch
from tcow_tpu.models.mask_tracker import SeekerConfig
from tcow_tpu.objectives.losses import LossConfig
from tcow_tpu.parallel import mesh as mesh_lib
from tcow_tpu.train import checkpoint as ckpt_lib
from tcow_tpu.train import optim, step as step_lib


def tiny_step_config(**kw):
    seeker = SeekerConfig(num_total_frames=4, frame_height=32, frame_width=32,
                          causal_attention=1, drop_path_rate=0.0, network_depth=12,
                          **kw.pop('seeker_kw', {}))
    # Shrink the backbone via a custom config path: patch depth fields through replace.
    import dataclasses
    return step_lib.StepConfig(seeker=seeker, loss=LossConfig(), num_queries=2)


def tiny_batch(B=2, seed=0):
    return synthetic_device_batch(seed, B=B, Q=2, T=4, H=32, W=32, M=6, K=3)


@pytest.fixture(scope='module')
def small_model():
    '''A genuinely small model: monkeypatch DEPTH_PRESETS for a 2-block, 32-dim backbone.'''
    from tcow_tpu.models import timesformer as tsf
    old = dict(tsf.DEPTH_PRESETS)
    tsf.DEPTH_PRESETS[2] = (32, 4)
    yield
    tsf.DEPTH_PRESETS.clear()
    tsf.DEPTH_PRESETS.update(old)


def make_cfg_and_state(small=True, seed=0):
    seeker = SeekerConfig(num_total_frames=4, frame_height=32, frame_width=32,
                          causal_attention=1, drop_path_rate=0.0, network_depth=2)
    cfg = step_lib.StepConfig(seeker=seeker, loss=LossConfig(), num_queries=2)
    tx = optim.make_optimizer('adamw', learn_rate=1e-3, num_epochs=10, steps_per_epoch=5)
    state = step_lib.init_train_state(jax.random.key(seed), cfg, tx)
    return cfg, tx, state


def test_train_step_runs_and_learns(small_model):
    cfg, tx, state = make_cfg_and_state()
    train_step = jax.jit(step_lib.make_train_step(cfg, tx))
    batch = {k: jnp.asarray(v) for k, v in tiny_batch().items()}
    losses = []
    for i in range(8):
        state, aux = train_step(state, batch, jnp.float32(i / 100))
        losses.append(float(aux['total_seeker']))
        assert float(aux['skipped_nonfinite']) == 0.0
    assert np.isfinite(losses).all()
    # Overfitting a single batch must reduce the loss.
    assert losses[-1] < losses[0], losses


def test_train_step_nan_skip(small_model):
    cfg, tx, state = make_cfg_and_state()
    train_step = jax.jit(step_lib.make_train_step(cfg, tx))
    batch = {k: jnp.asarray(v) for k, v in tiny_batch().items()}
    bad = dict(batch)
    bad['rgb'] = batch['rgb'].at[0, 0, 0, 0, 0].set(jnp.nan)
    params_before = jax.tree_util.tree_leaves(state.params)
    state2, aux = train_step(state, bad, jnp.float32(0.0))
    assert float(aux['skipped_nonfinite']) == 1.0
    for a, b in zip(params_before, jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(state2.step) == int(state.step) + 1  # step still advances


def test_data_parallel_matches_single_device(small_model):
    cfg, tx, state = make_cfg_and_state()
    batch_np = tiny_batch(B=8, seed=3)

    # Single device.
    train_step = jax.jit(step_lib.make_train_step(cfg, tx))
    state1, aux1 = train_step(state, {k: jnp.asarray(v) for k, v in batch_np.items()},
                              jnp.float32(0.0))

    # 8-device data parallel: params replicated, batch sharded; XLA inserts the collectives.
    mesh = mesh_lib.make_mesh()
    assert mesh.devices.size == 8
    state_r = mesh_lib.replicate_tree(state, mesh)
    batch_sh = mesh_lib.shard_batch(batch_np, mesh)
    state8, aux8 = train_step(state_r, batch_sh, jnp.float32(0.0))

    np.testing.assert_allclose(float(aux8['total_seeker']), float(aux1['total_seeker']),
                               rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(state1.params)
    l8 = jax.tree_util.tree_leaves(state8.params)
    for a, b in zip(l1, l8):
        # Reduction order differs across devices -> small float noise is expected.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)


def test_eval_step_metrics(small_model):
    cfg, tx, state = make_cfg_and_state()
    eval_step = jax.jit(step_lib.make_eval_step(cfg))
    batch = {k: jnp.asarray(v) for k, v in tiny_batch().items()}
    aux = eval_step(state.params, batch, jnp.float32(0.5))
    assert 'metric_sums' in aux
    assert float(aux['metric_sums']['count_snitch_iou']) > 0


def test_checkpoint_roundtrip(small_model, tmp_path):
    cfg, tx, state = make_cfg_and_state()
    d = str(tmp_path / 'ckpt')
    ckpt_lib.save_checkpoint(d, epoch=4, name='unit', params=state.params,
                             opt_state=state.opt_state, rng=state.rng, step=state.step,
                             seeker_args={'network_depth': 2}, train_args={'seed': 900})
    # Fresh template, then restore.
    _, _, template = make_cfg_and_state(seed=99)
    loaded = ckpt_lib.load_checkpoint(
        ckpt_lib.resolve_resume_path(str(tmp_path), 'ckpt'), state_template=template)
    assert loaded['epoch'] == 4
    assert loaded['seeker_args']['network_depth'] == 2
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(loaded['state'].params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                    jax.tree_util.tree_leaves(loaded['state'].opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Sidecars + snapshot file exist (epoch 4 % checkpoint_every 2 == 0).
    import os
    assert os.path.exists(os.path.join(d, 'checkpoint_epoch.txt'))
    assert os.path.exists(os.path.join(d, 'model_4.npz'))
    assert ckpt_lib.get_checkpoint_epoch(os.path.join(d, 'checkpoint.npz')) == 4


def test_checkpoint_light_roundtrip(small_model, tmp_path):
    '''--checkpoint_light saves params only; loading restores params into the template and
    keeps the template's (fresh) optimizer state, flagged via opt_restored=False.'''
    cfg, tx, state = make_cfg_and_state()
    d = str(tmp_path / 'ckpt')
    ckpt_lib.save_checkpoint(d, epoch=3, name='unit-light', params=state.params,
                             opt_state=None, rng=None, step=None,
                             seeker_args={'network_depth': 2})
    _, _, template = make_cfg_and_state(seed=99)
    loaded = ckpt_lib.load_checkpoint(
        ckpt_lib.resolve_resume_path(str(tmp_path), 'ckpt'), state_template=template)
    assert loaded['epoch'] == 3
    assert loaded['light'] is True
    assert loaded['opt_restored'] is False
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(loaded['state'].params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(template.opt_state),
                    jax.tree_util.tree_leaves(loaded['state'].opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # A full save reports opt_restored=True (the normal path is unchanged).
    ckpt_lib.save_checkpoint(d, epoch=4, name='unit-light', params=state.params,
                             opt_state=state.opt_state, rng=state.rng, step=state.step)
    loaded2 = ckpt_lib.load_checkpoint(os.path.join(d, 'checkpoint.npz'),
                                       state_template=template)
    assert loaded2['opt_restored'] is True and loaded2['light'] is False


def test_peek_meta_and_full_snapshot_fallback(small_model, tmp_path):
    '''peek_meta reads only the embedded meta (cheap, lazy zip member); find_full_snapshot
    returns the newest model_{e}.npz that carries optimizer state, skipping light ones —
    the driver's wedge-proof resume fallback (VERDICT r4 task 3).'''
    cfg, tx, state = make_cfg_and_state()
    d = str(tmp_path / 'ckpt')
    # Full save at epoch 2 -> model_2.npz snapshot with opt state.
    ckpt_lib.save_checkpoint(d, epoch=2, name='u', params=state.params,
                             opt_state=state.opt_state, rng=state.rng, step=state.step)
    # LIGHT save at epoch 4 -> light checkpoint.npz AND a light model_4.npz snapshot.
    ckpt_lib.save_checkpoint(d, epoch=4, name='u', params=state.params,
                             opt_state=None, rng=None, step=None)
    main = os.path.join(d, 'checkpoint.npz')
    meta = ckpt_lib.peek_meta(main)
    assert meta['light'] is True and meta['opt_restored'] is False and meta['epoch'] == 4
    assert ckpt_lib.peek_meta(os.path.join(d, 'model_2.npz'))['opt_restored'] is True
    # Fallback must pick model_2 (full), not the newer but light model_4.
    assert ckpt_lib.find_full_snapshot(main) == os.path.join(d, 'model_2.npz')
    os.remove(os.path.join(d, 'model_2.npz'))
    assert ckpt_lib.find_full_snapshot(main) is None


def test_shard_state_staged_matches_shard_state(small_model):
    '''Staged (slab + probe paced) placement produces the same tree/values/shardings as
    the single-shot shard_state; tiny slab_bytes forces multiple probe boundaries.'''
    from tcow_tpu.parallel import mesh as mesh_lib
    cfg, tx, state = make_cfg_and_state()
    host_state = jax.device_get(state)   # checkpoint-loaded states are host numpy
    mesh = mesh_lib.make_mesh()
    ref = mesh_lib.shard_state(state, mesh)
    staged = mesh_lib.shard_state_staged(host_state, mesh, slab_bytes=1 << 12)
    for a, b in zip(jax.tree_util.tree_leaves(ref, is_leaf=lambda x: x is None),
                    jax.tree_util.tree_leaves(staged, is_leaf=lambda x: x is None)):
        if a is None:
            assert b is None
            continue
        if jax.dtypes.issubdtype(a.dtype, jax.dtypes.prng_key):
            np.testing.assert_array_equal(np.asarray(jax.random.key_data(a)),
                                          np.asarray(jax.random.key_data(b)))
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            assert b.sharding == a.sharding, (a.sharding, b.sharding)


def test_multistep_schedule():
    sched = optim.multistep_schedule(1e-4, 0.3, num_epochs=70, steps_per_epoch=10)
    assert np.isclose(sched(0), 1e-4)
    assert np.isclose(sched(27 * 10), 1e-4)          # before 2/5 * 70 = 28
    assert np.isclose(sched(28 * 10), 1e-4 * 0.3)    # at milestone
    assert np.isclose(sched(42 * 10), 1e-4 * 0.09)   # after 3/5
    assert np.isclose(sched(56 * 10), 1e-4 * 0.027)  # after 4/5


@pytest.mark.parametrize('name', ['sgd', 'adam', 'adamw', 'lamb'])
def test_all_optimizer_types_step(name):
    '''Every reference optimizer choice (args.py --optimizer) must build and take a
    finite step that changes the params.'''
    from tcow_tpu.train import optim
    tx = optim.make_optimizer(name, learn_rate=1e-3, num_epochs=10, steps_per_epoch=5)
    params = {'w': jnp.ones((4, 4)), 'b': jnp.zeros((4,))}
    opt_state = tx.init(params)
    grads = {'w': jnp.full((4, 4), 0.5), 'b': jnp.full((4,), -0.25)}
    updates, _ = tx.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    for k in params:
        assert np.isfinite(np.asarray(new_params[k])).all()
        assert np.abs(np.asarray(new_params[k]) - np.asarray(params[k])).max() > 0


def _to_compact(batch_np):
    '''Reproduces collate_kubric's compact transfer forms from a legacy-schema batch.'''
    b = dict(batch_np)
    b['rgb_u8'] = np.clip(b.pop('rgb') * 255.0, 0, 255).astype(np.uint8)
    b['div_segm_packed'] = np.packbits(b.pop('div_segm'), axis=-1)
    b['segm_u8'] = b.pop('segm').astype(np.uint8)
    return b


def test_compact_batch_matches_legacy_and_shards(small_model):
    '''The compact transfer schema (uint8 rgb + packed masks) must produce the same step
    as the legacy float schema — both single-device and sharded over the 8-device mesh.
    uint8 quantization of rgb is the one intended difference, so quantize the legacy rgb
    identically before comparing.'''
    cfg, tx, state = make_cfg_and_state()
    batch_np = tiny_batch(B=8, seed=5)
    compact = _to_compact(batch_np)
    legacy = dict(batch_np)
    legacy['rgb'] = compact['rgb_u8'].astype(np.float32) / 255.0

    train_step = jax.jit(step_lib.make_train_step(cfg, tx))
    s_leg, a_leg = train_step(state, {k: jnp.asarray(v) for k, v in legacy.items()},
                              jnp.float32(0.0))
    s_cmp, a_cmp = train_step(state, {k: jnp.asarray(v) for k, v in compact.items()},
                              jnp.float32(0.0))
    np.testing.assert_allclose(float(a_cmp['total_seeker']), float(a_leg['total_seeker']),
                               rtol=1e-6)

    mesh = mesh_lib.make_mesh()
    state_r = mesh_lib.replicate_tree(state, mesh)
    s8, a8 = train_step(state_r, mesh_lib.shard_batch(compact, mesh), jnp.float32(0.0))
    np.testing.assert_allclose(float(a8['total_seeker']), float(a_leg['total_seeker']),
                               rtol=1e-5)


def test_tensor_parallel_matches_single_device(small_model):
    '''Tensor parallelism (model axis): Megatron-style sharded block weights +
    head-parallel attention must reproduce single-device math. New capability over the
    reference (whose only parallelism is DataParallel, train.py:222-223).'''
    import dataclasses
    cfg, tx, state = make_cfg_and_state()
    batch_np = tiny_batch(B=2, seed=5)

    train_step = jax.jit(step_lib.make_train_step(cfg, tx))
    state1, aux1 = train_step(state, {k: jnp.asarray(v) for k, v in batch_np.items()},
                              jnp.float32(0.0))

    # (data=2, model=4) mesh: 4 heads -> 1 per model shard; AdamW moments follow the
    # param specs by path suffix; the partitioner inserts the row-parallel psums.
    mesh = mesh_lib.make_mesh(model=4)
    assert dict(mesh.shape) == {'data': 2, 'seq': 1, 'model': 4, 'pipe': 1}
    seeker_tp = dataclasses.replace(cfg.seeker, batch_axis=mesh_lib.DATA_AXIS,
                                    model_axis=mesh_lib.MODEL_AXIS)
    cfg_tp = dataclasses.replace(cfg, seeker=seeker_tp)
    step_tp = jax.jit(step_lib.make_train_step(cfg_tp, tx))
    with jax.set_mesh(mesh):
        state_s = mesh_lib.shard_state(state, mesh, tensor_parallel=True)
        # The sharding rules actually landed: fc1 column-parallel, qkv row-parallel,
        # embeddings replicated — for params AND optimizer moments.
        blocks = state_s.params['backbone']['blocks']
        P = jax.sharding.PartitionSpec
        assert blocks['mlp']['fc1']['w'].sharding.spec == P(None, None, 'model')
        assert blocks['attn']['qkv']['w'].sharding.spec == P(None, 'model', None)
        assert state_s.params['backbone']['pos_embed'].sharding.spec == P()
        mu = state_s.opt_state
        mu_leaves = [s for s in jax.tree_util.tree_leaves_with_path(mu)
                     if any(isinstance(k, jax.tree_util.DictKey) and k.key == 'fc1'
                            for k in s[0]) and s[0][-1].key == 'w']
        assert mu_leaves and all(l.sharding.spec == P(None, None, 'model')
                                 for _, l in mu_leaves)

        batch_sh = mesh_lib.shard_batch(batch_np, mesh)
        state_tp, aux_tp = step_tp(state_s, batch_sh, jnp.float32(0.0))
        loss_tp = float(aux_tp['total_seeker'])

    np.testing.assert_allclose(loss_tp, float(aux1['total_seeker']), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state1.params),
                    jax.tree_util.tree_leaves(state_tp.params)):
        # Psum/reduction order differs across shards -> small float noise is expected.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)


@pytest.mark.parametrize('mesh_kw, bwd', [({'seq': 4}, 'kernel_x'),
                                          ({'model': 4}, 'kernel_x'),
                                          ({'seq': 2, 'model': 2}, 'kernel_x'),
                                          ({'seq': 2, 'model': 2}, 'kernel_x_wg')])
def test_pallas_kernel_path_on_sharded_mesh(mesh_kw, bwd):
    '''The FULL train step with the fused Pallas attention (in-kernel 'kernel_x' backward
    + 'dots_nb_out' remat — the measured-fastest single-chip config) must reproduce the
    single-device XLA-attention step on sharded meshes: the kernel runs under the
    fused_attention_rows shard_map wrap (interpret mode on CPU). Covers (data x seq),
    (data x model), and the 3-D mesh — VERDICT round 2, task 1 — plus the in-kernel
    weight-grad accumulation mode ('kernel_x_wg': per-shard f32 VMEM accumulators whose
    outputs ride the shard_map transpose psum).

    Runs in a FRESH subprocess (tests/pallas_sharded_worker.py): inside a long-lived
    pytest process this 8-virtual-device interpret-mode program can die with a bare
    SIGABRT in the result fetch (XLA CPU, no CHECK message) depending on accumulated
    in-process state, while a fresh process passes deterministically (measured round 5,
    NEXT.md OPERATIONAL note). Process isolation makes the equivalence check itself the
    only thing under test.'''
    import json
    import subprocess
    import sys
    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          'pallas_sharded_worker.py')
    env = dict(os.environ)
    env.pop('TCOW_DRYRUN_CHILD', None)
    out = subprocess.run([sys.executable, worker, json.dumps(mesh_kw), bwd],
                         env=env, capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, f'rc={out.returncode}\n{out.stdout}\n{out.stderr}'
    assert 'PALLAS_SHARDED_OK' in out.stdout, (out.stdout, out.stderr)


def test_tensor_parallel_with_seq_and_data(small_model):
    '''Full 3-D mesh (data=2, seq=2, model=2): DP x SP x TP composed in one step.'''
    import dataclasses
    cfg, tx, state = make_cfg_and_state()
    batch_np = tiny_batch(B=2, seed=7)
    train_step = jax.jit(step_lib.make_train_step(cfg, tx))
    _, aux1 = train_step(state, {k: jnp.asarray(v) for k, v in batch_np.items()},
                         jnp.float32(0.0))

    mesh = mesh_lib.make_mesh(seq=2, model=2)
    seeker3 = dataclasses.replace(cfg.seeker, batch_axis=mesh_lib.DATA_AXIS,
                                  seq_axis=mesh_lib.SEQ_AXIS,
                                  model_axis=mesh_lib.MODEL_AXIS)
    cfg3 = dataclasses.replace(cfg, seeker=seeker3)
    step3 = jax.jit(step_lib.make_train_step(cfg3, tx))
    with jax.set_mesh(mesh):
        state_s = mesh_lib.shard_state(state, mesh, tensor_parallel=True)
        batch_sh = mesh_lib.shard_batch(batch_np, mesh)
        _, aux3 = step3(state_s, batch_sh, jnp.float32(0.0))
        loss3 = float(aux3['total_seeker'])
    np.testing.assert_allclose(loss3, float(aux1['total_seeker']), rtol=1e-5)

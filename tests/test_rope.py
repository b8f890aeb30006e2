'''
Rotary temporal encoding (temporal_rope — new capability over the reference):
rotation math, XLA-vs-Pallas equivalence incl. all custom backwards, streaming
equivalence, horizon extrapolation, and train-step integration.
'''

import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import conftest  # noqa: F401
from tcow_tpu.ops import pallas_attention as pa
from tcow_tpu.ops import rope as rope_lib


def test_rope_relative_shift_invariance():
    '''R_p q . R_s k must depend only on (s - p): shifting ALL positions by a constant
    leaves every pairwise score unchanged — the property that lets streaming run past the
    trained horizon without clamping.'''
    rng = np.random.RandomState(0)
    S, dh = 7, 16
    q = jnp.asarray(rng.randn(S, dh), jnp.float32)
    k = jnp.asarray(rng.randn(S, dh), jnp.float32)

    def scores(offset):
        cos, sin = rope_lib.rope_tables(jnp.arange(S) + offset, dh)
        qr = rope_lib.apply_rope(q, cos, sin)
        kr = rope_lib.apply_rope(k, cos, sin)
        return np.asarray(qr @ kr.T)

    np.testing.assert_allclose(scores(0), scores(137), rtol=1e-4, atol=1e-4)
    # ... and a shift of only the keys DOES change scores (the rotation is not a no-op).
    cos, sin = rope_lib.rope_tables(jnp.arange(S), dh)
    cos2, sin2 = rope_lib.rope_tables(jnp.arange(S) + 3, dh)
    qr = rope_lib.apply_rope(q, cos, sin)
    kr2 = rope_lib.apply_rope(k, cos2, sin2)
    assert np.abs(np.asarray(qr @ kr2.T) - scores(0)).max() > 1e-2


def test_rope_inverse_roundtrip():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(5, 32), jnp.float32)
    cos, sin = rope_lib.rope_tables(jnp.arange(5) * 11.0, 32)
    back = rope_lib.apply_rope(rope_lib.apply_rope(x, cos, sin), cos, sin, inverse=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('ca', [0, 1])
def test_fused_rope_matches_reference(ca):
    from test_pallas_attention import make_inputs
    x, qkv_w, qkv_b, proj_w, proj_b = make_inputs(S=13)
    args = (x, qkv_w * 8.0, qkv_b, proj_w, proj_b)  # O(1) logits: rotation visibly matters
    want = pa.attention_ref(*args, num_heads=4, causal_attention=ca, rope=True)
    got = pa._fused_attention_fwd_impl(*args, 4, ca, interpret=True, rope=True)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)
    # rope must actually change the output vs the non-rope kernel.
    plain = pa._fused_attention_fwd_impl(*args, 4, ca, interpret=True)[0]
    assert np.abs(np.asarray(got) - np.asarray(plain)).max() > 1e-3, \
        'rotation had no visible effect'


def test_xla_model_attention_rope_matches_reference():
    from tcow_tpu.models import timesformer as tsf
    from test_pallas_attention import make_inputs
    args = make_inputs(B=3, S=10, D=32)
    p = {'qkv': {'w': args[1], 'b': args[2]}, 'proj': {'w': args[3], 'b': args[4]}}
    want = pa.attention_ref(*args, num_heads=4, causal_attention=1, rope=True)
    got = tsf.attention(p, args[0], 4, causal_attention=1, rope=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize('mode', ['res', 'kernel_qkv', 'kernel_x', 'kernel_x_wg'])
def test_rope_gradients_match_reference(mode):
    '''All three custom backwards must invert the rotation correctly (dq = R^T dq_rot).
    Padded shape (S=13 -> 16) exercises the padding rows too.'''
    from test_pallas_attention import make_inputs
    args = make_inputs(B=7, S=13, D=32, seed=3)

    def loss_fused(*a):
        return jnp.sum(pa.fused_attention(*a, None, 4, 1, mode, True) ** 2)

    def loss_ref(*a):
        return jnp.sum(pa.attention_ref(*a, 4, 1, rope=True) ** 2)

    orig_f, orig_b = pa._fused_attention_fwd_impl, pa._fused_attention_bwd_impl
    pa._fused_attention_fwd_impl = functools.partial(orig_f, interpret=True)
    pa._fused_attention_bwd_impl = functools.partial(orig_b, interpret=True)
    try:
        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(*args)
    finally:
        pa._fused_attention_fwd_impl = orig_f
        pa._fused_attention_bwd_impl = orig_b
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-5)


@pytest.fixture(scope='module')
def rope_setup():
    from tcow_tpu.models import mask_tracker as mt
    from tcow_tpu.models import timesformer as tsf
    old = dict(tsf.DEPTH_PRESETS)
    tsf.DEPTH_PRESETS[3] = (48, 4)
    cfg = mt.SeekerConfig(num_total_frames=6, frame_height=32, frame_width=48,
                          causal_attention=1, drop_path_rate=0.0, network_depth=3,
                          temporal_rope=True)
    params = mt.init_params(jax.random.key(0), cfg)
    params['backbone']['blocks']['temporal_fc']['w'] = jax.random.normal(
        jax.random.key(7), params['backbone']['blocks']['temporal_fc']['w'].shape) * 0.05
    # Boost the temporal attention weights so its logits are O(1): with the default
    # 0.02-trunc-normal init the softmax is near-uniform and position rotations have
    # ~1e-6 effect on outputs, which would make the behavioural assertions vacuous.
    ta = params['backbone']['blocks']['temporal_attn']
    ta['qkv']['w'] = ta['qkv']['w'] * 20.0
    ta['proj']['w'] = ta['proj']['w'] * 4.0
    yield cfg, params
    tsf.DEPTH_PRESETS.clear()
    tsf.DEPTH_PRESETS.update(old)


def test_streaming_rope_matches_batch(rope_setup):
    '''The KV-cached stream (rotated keys cached, query rotated by its absolute index)
    reproduces the batch causal forward with temporal_rope on.'''
    from tcow_tpu.models import mask_tracker as mt
    from tcow_tpu.models import streaming
    cfg, params = rope_setup
    B, T, H, W = 2, 6, 32, 48
    rng = np.random.RandomState(1)
    rgb = jnp.asarray(rng.rand(B, 3, T, H, W), jnp.float32)
    query = jnp.zeros((B, 1, T, H, W)).at[:, :, 1, 8:16, 8:24].set(1.0)

    batch_mask, batch_flags = mt.forward(params, cfg, rgb, query)
    state = streaming.init_stream(params, cfg, batch_size=B, max_frames=T)
    step = jax.jit(lambda s, f, q: streaming.stream_step(params, cfg, s, f, q))
    for t in range(T):
        state, mask_t, flags_t = step(state, rgb[:, :, t], query[:, :, t])
        np.testing.assert_allclose(np.asarray(mask_t), np.asarray(batch_mask[:, :, t]),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(flags_t), np.asarray(batch_flags[:, t]),
                                   rtol=2e-4, atol=2e-5)


def test_streaming_rope_runs_past_horizon(rope_setup):
    '''Windowed stream with rope runs far past num_frames with finite outputs, and the
    temporal attention genuinely uses unclamped relative offsets: outputs at t >> horizon
    differ between rope and clamp modes (the clamp collapses all late frames to one
    time embedding index).'''
    import dataclasses
    from tcow_tpu.models import streaming
    cfg, params = rope_setup
    B, H, W, S = 1, 32, 48, 4
    T_total = 15  # >> num_frames = 6
    rng = np.random.RandomState(2)
    rgb = rng.rand(B, 3, T_total, H, W).astype(np.float32)
    qq = jnp.zeros((B, 1, H, W)).at[:, :, 4:12, 8:24].set(1.0)
    q0 = jnp.zeros((B, 1, H, W))

    def run(c):
        step = jax.jit(lambda s, f, qm: streaming.stream_step(params, c, s, f, qm,
                                                              window=S))
        state = streaming.init_stream(params, c, B, window=S)
        for t in range(T_total):
            state, m, _ = step(state, jnp.asarray(rgb[:, :, t]), qq if t == 0 else q0)
        return np.asarray(m)

    m_rope = run(cfg)
    assert np.isfinite(m_rope).all()
    m_clamp = run(dataclasses.replace(cfg, temporal_rope=False))
    assert np.abs(m_rope - m_clamp).max() > 1e-3


def test_train_step_with_rope(rope_setup):
    '''One optimizer step at a tiny config with temporal_rope: finite loss + grads.'''
    from tcow_tpu.data.synthetic import synthetic_device_batch
    from tcow_tpu.objectives.losses import LossConfig
    from tcow_tpu.train import optim, step as step_lib
    cfg, _ = rope_setup
    import dataclasses
    seeker = dataclasses.replace(cfg, drop_path_rate=0.1)
    step_cfg = step_lib.StepConfig(seeker=seeker, loss=LossConfig(), num_queries=2)
    tx = optim.make_optimizer('adamw', learn_rate=1e-4)
    state = step_lib.init_train_state(jax.random.key(1), step_cfg, tx)
    train_step = jax.jit(step_lib.make_train_step(step_cfg, tx))
    batch = synthetic_device_batch(0, B=1, Q=2, T=6, H=32, W=48, M=6, K=3)
    state, aux = train_step(state, {k: jnp.asarray(v) for k, v in batch.items()},
                            jnp.float32(0.1))
    assert np.isfinite(float(aux['total_seeker']))
    assert np.isfinite(float(aux['grad_norm'])) and float(aux['grad_norm']) > 0


def test_seeker_args_roundtrip_rope():
    from tcow_tpu.models.mask_tracker import seeker_config_from_args
    cfg = seeker_config_from_args({'temporal_rope': 1, 'network_depth': 12})
    assert cfg.temporal_rope is True
    assert seeker_config_from_args({'network_depth': 12}).temporal_rope is False


# ---------------------------------------------------------------------------
# Time-calibrated rope: per-sequence TRUE source-frame positions in the rotary tables.
# ---------------------------------------------------------------------------

def _random_positions(rng, B, S, max_stride=7):
    '''Monotonic but non-uniform per-sequence times (like strided/subsampled clips).'''
    steps = rng.randint(1, max_stride, size=(B, S)).astype(np.float32)
    return jnp.asarray(np.cumsum(steps, axis=1) - steps[:, :1])


@pytest.mark.parametrize('ca', [0, 1])
def test_fused_rope_positions_match_reference(ca):
    from test_pallas_attention import make_inputs
    x, qkv_w, qkv_b, proj_w, proj_b = make_inputs(B=5, S=13)
    args = (x, qkv_w * 8.0, qkv_b, proj_w, proj_b)
    rng = np.random.RandomState(4)
    pos = _random_positions(rng, 5, 13)
    want = pa.attention_ref(*args, num_heads=4, causal_attention=ca, rope=True, pos=pos)
    got = pa._fused_attention_fwd_impl(*args, 4, ca, interpret=True, rope=True,
                                       pos=pos)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)
    # Non-trivial positions must change the output vs row-index positions.
    row = pa._fused_attention_fwd_impl(*args, 4, ca, interpret=True, rope=True)[0]
    assert np.abs(np.asarray(got) - np.asarray(row)).max() > 1e-3


def test_fused_rope_positions_default_is_row_index():
    '''pos=arange must reproduce the position-free (compile-time packed tables) path.'''
    from test_pallas_attention import make_inputs
    x, qkv_w, qkv_b, proj_w, proj_b = make_inputs(B=5, S=13)
    args = (x, qkv_w * 8.0, qkv_b, proj_w, proj_b)
    pos = jnp.broadcast_to(jnp.arange(13, dtype=jnp.float32), (5, 13))
    got = pa._fused_attention_fwd_impl(*args, 4, 1, interpret=True, rope=True, pos=pos)[0]
    row = pa._fused_attention_fwd_impl(*args, 4, 1, interpret=True, rope=True)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(row), rtol=1e-5, atol=1e-6)


def test_fused_rope_positions_shift_invariance():
    '''Shifting ALL positions of a sequence by a constant leaves the attention output
    unchanged (relative encoding) — at the level of the full fused call.'''
    from test_pallas_attention import make_inputs
    x, qkv_w, qkv_b, proj_w, proj_b = make_inputs(B=3, S=10)
    args = (x, qkv_w * 8.0, qkv_b, proj_w, proj_b)
    rng = np.random.RandomState(5)
    pos = _random_positions(rng, 3, 10)
    a = pa._fused_attention_fwd_impl(*args, 4, 1, interpret=True, rope=True, pos=pos)[0]
    b = pa._fused_attention_fwd_impl(*args, 4, 1, interpret=True, rope=True,
                                     pos=pos + 211.0)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize('mode', ['res', 'kernel_qkv', 'kernel_x', 'kernel_x_wg'])
def test_rope_positions_gradients_match_reference(mode):
    '''All three custom backwards with per-sequence positions (padded S=13 -> 16).'''
    from test_pallas_attention import make_inputs
    args = make_inputs(B=7, S=13, D=32, seed=3)
    rng = np.random.RandomState(6)
    pos = _random_positions(rng, 7, 13)

    def loss_fused(*a):
        return jnp.sum(pa.fused_attention(*a, pos, 4, 1, mode, True) ** 2)

    def loss_ref(*a):
        return jnp.sum(pa.attention_ref(*a, 4, 1, rope=True, pos=pos) ** 2)

    orig_f, orig_b = pa._fused_attention_fwd_impl, pa._fused_attention_bwd_impl
    pa._fused_attention_fwd_impl = functools.partial(orig_f, interpret=True)
    pa._fused_attention_bwd_impl = functools.partial(orig_b, interpret=True)
    try:
        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(*args)
    finally:
        pa._fused_attention_fwd_impl = orig_f
        pa._fused_attention_bwd_impl = orig_b
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-5)


def test_backbone_frame_times(rope_setup):
    '''frame_times=arange reproduces the default; stride-2 times change the output and
    match the XLA reference path fed the same times.'''
    from tcow_tpu.models import mask_tracker as mt
    cfg, params = rope_setup
    B, T, H, W = 2, 6, 32, 48
    rng = np.random.RandomState(3)
    rgb = jnp.asarray(rng.rand(B, 3, T, H, W), jnp.float32)
    query = jnp.zeros((B, 1, T, H, W)).at[:, :, 1, 8:16, 8:24].set(1.0)

    base_m, base_f = mt.forward(params, cfg, rgb, query)
    times = jnp.broadcast_to(jnp.arange(T, dtype=jnp.float32), (B, T))
    same_m, same_f = mt.forward(params, cfg, rgb, query, frame_times=times)
    np.testing.assert_allclose(np.asarray(same_m), np.asarray(base_m),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(same_f), np.asarray(base_f),
                               rtol=1e-5, atol=1e-5)

    strided_m, _ = mt.forward(params, cfg, rgb, query, frame_times=times * 2.0)
    assert np.abs(np.asarray(strided_m) - np.asarray(base_m)).max() > 1e-4

    # Ignored without temporal_rope (positions only feed the rotation).
    import dataclasses
    cfg_off = dataclasses.replace(cfg, temporal_rope=False)
    off_a, _ = mt.forward(params, cfg_off, rgb, query)
    off_b, _ = mt.forward(params, cfg_off, rgb, query, frame_times=times * 5.0)
    np.testing.assert_allclose(np.asarray(off_a), np.asarray(off_b), rtol=0, atol=0)


def test_augs_frame_times_reflect_temporal_augs():
    '''frame_times = load indices (carrying the base frame_stride) composed with the
    temporal-aug clip order, times the stretch factor.'''
    from tcow_tpu.data import augs as augs_lib
    pipe = augs_lib.AugmentationPipeline(
        num_frames_load=10, num_frames_clip=8, frame_height=24, frame_width=32,
        frame_stride=2, do_random_augs=False, augs_2d=False, reverse_prob=0.0,
        palindrome_prob=0.0, center_crop=False)
    p = pipe.sample_augs_params(np.random.default_rng(0))
    np.testing.assert_allclose(pipe.frame_times(p),
                               np.arange(8, dtype=np.float32) * 2.0)  # base stride 2
    # Reversal: decreasing true times; stride doubling: doubled gaps.
    p2 = dict(p, frame_inds_clip=np.asarray(p['frame_inds_clip'])[::-1])
    np.testing.assert_allclose(pipe.frame_times(p2), pipe.frame_times(p)[::-1])
    p3 = dict(p, time_stretch=4.0)
    np.testing.assert_allclose(pipe.frame_times(p3), pipe.frame_times(p) * 4.0)


def test_augs_time_stretch_sampling():
    from tcow_tpu.data import augs as augs_lib
    pipe = augs_lib.AugmentationPipeline(
        num_frames_load=10, num_frames_clip=8, frame_height=24, frame_width=32,
        frame_stride=1, do_random_augs=True, augs_2d=False, reverse_prob=0.1,
        palindrome_prob=0.1, center_crop=False, time_stretch_max=8.0)
    vals = [pipe.sample_augs_params(np.random.default_rng(i))['time_stretch']
            for i in range(200)]
    assert all(1.0 <= v <= 8.0 for v in vals)
    assert min(vals) < 2.0 < max(vals)  # spans the range
    # Deterministic given the seed.
    assert (pipe.sample_augs_params(np.random.default_rng(7))['time_stretch']
            == pipe.sample_augs_params(np.random.default_rng(7))['time_stretch'])
    # Off by default: no draw, factor 1.
    pipe0 = augs_lib.AugmentationPipeline(
        num_frames_load=10, num_frames_clip=8, frame_height=24, frame_width=32,
        frame_stride=1, do_random_augs=True, augs_2d=False, reverse_prob=0.1,
        palindrome_prob=0.1, center_crop=False)
    assert pipe0.sample_augs_params(np.random.default_rng(3))['time_stretch'] == 1.0


def test_step_threads_frame_times(rope_setup, monkeypatch):
    '''The train/eval step broadcasts the batch's (B, T) frame_times to every query and
    hands them to the model — only when the config opts into rope_time_coords.'''
    import dataclasses
    from tcow_tpu.data.synthetic import synthetic_device_batch
    from tcow_tpu.models import mask_tracker as mt
    from tcow_tpu.objectives.losses import LossConfig
    from tcow_tpu.train import step as step_lib
    cfg, params = rope_setup
    batch = synthetic_device_batch(0, B=1, Q=2, T=6, H=32, W=48, M=6, K=3)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    batch['frame_times'] = jnp.arange(6, dtype=jnp.float32)[None] * 3.0

    captured = {}
    orig = mt.forward

    def spy(params_, cfg_, rgb, q, **kw):
        captured['ft'] = kw.get('frame_times')
        return orig(params_, cfg_, rgb, q, **kw)

    monkeypatch.setattr(mt, 'forward', spy)
    monkeypatch.setattr(step_lib.mask_tracker, 'forward', spy)

    seeker_on = dataclasses.replace(cfg, rope_time_coords=True)
    on_cfg = step_lib.StepConfig(seeker=seeker_on, loss=LossConfig(), num_queries=2)
    step_lib.make_eval_step(on_cfg)(params, batch, jnp.float32(0.5))
    assert captured['ft'] is not None and captured['ft'].shape == (2, 6)
    np.testing.assert_allclose(np.asarray(captured['ft'][1]),
                               np.arange(6, dtype=np.float32) * 3.0)

    off_cfg = step_lib.StepConfig(seeker=cfg, loss=LossConfig(), num_queries=2)
    step_lib.make_eval_step(off_cfg)(params, batch, jnp.float32(0.5))
    assert captured['ft'] is None


def test_plugin_engine_threads_frame_times(rope_setup, monkeypatch):
    '''run_plugin forwards each usage mode's true source-frame indices to the model when
    the checkpoint config has rope_time_coords.'''
    import dataclasses
    from tcow_tpu.evaluation.inference import InferenceEngine
    from tcow_tpu.models import mask_tracker as mt
    from tcow_tpu.objectives.losses import LossConfig
    cfg, params = rope_setup
    seen = {}
    orig = mt.forward

    def spy(params_, cfg_, rgb, q, **kw):
        seen['ft'] = kw.get('frame_times')
        return orig(params_, cfg_, rgb, q, **kw)

    monkeypatch.setattr(mt, 'forward', spy)
    import tcow_tpu.evaluation.inference as inf_mod
    monkeypatch.setattr(inf_mod.mask_tracker, 'forward', spy)

    engine = InferenceEngine(params, dataclasses.replace(cfg, rope_time_coords=True),
                             LossConfig(), num_queries=1)
    B, T, H, W = 2, 6, 32, 48
    rgb = np.random.RandomState(0).rand(B, 3, T, H, W).astype(np.float32)
    query = np.zeros((B, 1, T, H, W), np.float32)
    query[:, :, 0, 8:16, 8:24] = 1.0
    target = -np.ones((B, 3, T, H, W), np.float32)
    times = (np.arange(T, dtype=np.float32) * 5.0)[None].repeat(B, 0)
    engine.run_plugin(rgb, query, target, frame_times=times)
    assert seen['ft'] is not None and seen['ft'].shape == (B, T)

    engine_off = InferenceEngine(params, cfg, LossConfig(), num_queries=1)
    engine_off.run_plugin(rgb, query, target, frame_times=times)
    assert seen['ft'] is None


def test_rope_time_coords_requires_rope():
    from tcow_tpu.models.mask_tracker import seeker_config_from_args
    cfg = seeker_config_from_args({'rope_time_coords': 1, 'network_depth': 12})
    with pytest.raises(ValueError, match='rope_time_coords'):
        cfg.backbone_config()
    ok = seeker_config_from_args({'temporal_rope': 1, 'rope_time_coords': 1,
                                  'network_depth': 12})
    assert ok.rope_time_coords is True and ok.backbone_config() is not None

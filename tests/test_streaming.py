'''
Streaming inference must reproduce the batch causal forward EXACTLY, frame by frame
(causal_attention == 1 makes frame t independent of frames > t).
'''

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import conftest  # noqa: F401
from tcow_tpu.models import mask_tracker as mt
from tcow_tpu.models import streaming


@pytest.fixture(scope='module')
def setup():
    from tcow_tpu.models import timesformer as tsf
    old = dict(tsf.DEPTH_PRESETS)
    tsf.DEPTH_PRESETS[3] = (48, 4)
    cfg = mt.SeekerConfig(num_total_frames=6, frame_height=32, frame_width=48,
                          causal_attention=1, drop_path_rate=0.0, network_depth=3)
    params = mt.init_params(jax.random.key(0), cfg)
    # Non-zero temporal_fc everywhere so temporal mixing is real.
    params['backbone']['blocks']['temporal_fc']['w'] = jax.random.normal(
        jax.random.key(7), params['backbone']['blocks']['temporal_fc']['w'].shape) * 0.05
    yield cfg, params
    tsf.DEPTH_PRESETS.clear()
    tsf.DEPTH_PRESETS.update(old)


def test_streaming_matches_batch_causal(setup):
    cfg, params = setup
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
    assert int(state.t) == T


def test_streaming_prefix_invariance(setup):
    '''Feeding extra (future) frames must not change earlier outputs — the online guarantee.'''
    cfg, params = setup
    B, T, H, W = 1, 6, 32, 48
    rng = np.random.RandomState(2)
    rgb = jnp.asarray(rng.rand(B, 3, T, H, W), jnp.float32)
    q = jnp.zeros((B, 1, H, W))
    qq = q.at[:, :, 4:10, 4:10].set(1.0)

    def run(frames):
        state = streaming.init_stream(params, cfg, B, max_frames=T)
        outs = []
        for t in range(frames):
            state, m, _ = streaming.stream_step(params, cfg, state, rgb[:, :, t],
                                                qq if t == 0 else q)
            outs.append(np.asarray(m))
        return outs

    out3 = run(3)
    out6 = run(6)
    for t in range(3):
        np.testing.assert_allclose(out3[t], out6[t], rtol=1e-6)


def test_windowed_matches_unbounded_before_wrap(setup):
    '''With window=S, outputs are identical to the unbounded cache while t < S (the ring
    has not evicted anything yet; slot order differences are softmax-invariant).'''
    cfg, params = setup
    B, T, H, W = 1, 6, 32, 48
    S = 4
    rng = np.random.RandomState(3)
    rgb = jnp.asarray(rng.rand(B, 3, T, H, W), jnp.float32)
    q = jnp.zeros((B, 1, H, W))
    qq = q.at[:, :, 4:12, 8:24].set(1.0)

    full = streaming.init_stream(params, cfg, B, max_frames=T)
    ring = streaming.init_stream(params, cfg, B, window=S, pinned_frames=1)
    for t in range(S):
        qt = qq if t == 0 else q
        full, m_full, f_full = streaming.stream_step(params, cfg, full, rgb[:, :, t], qt)
        ring, m_ring, f_ring = streaming.stream_step(params, cfg, ring, rgb[:, :, t], qt,
                                                     window=S, pinned_frames=1)
        np.testing.assert_allclose(np.asarray(m_ring), np.asarray(m_full),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(f_ring), np.asarray(f_full),
                                   rtol=2e-4, atol=2e-5)


def test_windowed_long_video_depends_only_on_receptive_field(setup):
    '''Beyond the window, the output depends only on the pinned frames + a bounded recent
    receptive field: block l's cached KVs are computed from frames in THEIR window, so
    information reaches back at most depth * (ring - 1) frames (dilated-conv style). Two
    videos agreeing on frame 0 and on frames > t_final - depth*(ring-1) must produce the
    same final output. Also exercises length >> num_frames (time-embed clamp).'''
    cfg, params = setup
    B, H, W = 1, 32, 48
    T_total, S, P = 14, 4, 1  # 14 frames >> num_frames=6 and >> window=4
    L, R = 3, S - P  # network_depth=3 blocks
    horizon = (T_total - 1) - L * (R - 1)  # = 7: earliest frame reaching output 13
    rng = np.random.RandomState(4)
    rgb_a = rng.rand(B, 3, T_total, H, W).astype(np.float32)
    rgb_b = rgb_a.copy()
    # Perturb only frames strictly before the receptive-field horizon (and not pinned).
    rgb_b[:, :, 2:horizon] = rng.rand(B, 3, horizon - 2, H, W).astype(np.float32)
    q = jnp.zeros((B, 1, H, W))
    qq = q.at[:, :, 4:12, 8:24].set(1.0)

    step = jax.jit(
        lambda s, f, qm: streaming.stream_step(params, cfg, s, f, qm, window=S,
                                               pinned_frames=P))

    def run(rgb):
        state = streaming.init_stream(params, cfg, B, window=S, pinned_frames=P)
        for t in range(T_total):
            state, m, f = step(state, jnp.asarray(rgb[:, :, t]), qq if t == 0 else q)
        return np.asarray(m), np.asarray(f)

    m_a, f_a = run(rgb_a)
    m_b, f_b = run(rgb_b)
    assert np.isfinite(m_a).all() and np.isfinite(f_a).all()
    np.testing.assert_allclose(m_a, m_b, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(f_a, f_b, rtol=1e-5, atol=1e-6)
    # Sanity: a video differing INSIDE the window does change the output.
    rgb_c = rgb_a.copy()
    rgb_c[:, :, T_total - 1] = rng.rand(B, 3, H, W).astype(np.float32)
    m_c, _ = run(rgb_c)
    assert np.abs(m_c - m_a).max() > 1e-4


def _multi_vs_single(cfg, params, window, rope=False):
    '''3 sessions at staggered start times through one multi-session state must match
    per-session single streams frame for frame; inactive/recycled slots must not leak.'''
    import dataclasses
    if rope:
        cfg = dataclasses.replace(cfg, temporal_rope=True)
    K, T, H, W = 3, 5, cfg.frame_height, cfg.frame_width
    rng = np.random.RandomState(11 + int(bool(window)) + 2 * rope)
    rgb = [jnp.asarray(rng.rand(1, 3, T, H, W), jnp.float32) for _ in range(K)]
    q0 = jnp.zeros((1, 1, H, W)).at[:, :, 4:12, 8:20].set(1.0)
    qz = jnp.zeros((1, 1, H, W))

    # Per-session single-stream references.
    step1 = jax.jit(lambda s, f, q: streaming.stream_step(params, cfg, s, f, q,
                                                          window=window))
    refs = []
    for k in range(K):
        s = streaming.init_stream(params, cfg, 1, max_frames=None if window else T,
                                  window=window)
        outs = []
        for t in range(T):
            s, m, fl = step1(s, rgb[k][:, :, t], q0 if t == 0 else qz)
            outs.append((np.asarray(m[0]), None if fl is None else np.asarray(fl[0])))
        refs.append(outs)

    # Multi-session: session k starts at global tick k (staggered), so every step mixes
    # sessions at different stream positions and some inactive slots.
    stepK = jax.jit(lambda s, f, q, a: streaming.stream_step_multi(
        params, cfg, s, f, q, a, window=window))
    state = streaming.init_stream_multi(params, cfg, K,
                                        max_frames=None if window else T, window=window)
    # Dirty slot 2's cache + t to prove reset_stream_slot recycling is clean.
    state = stepK(state, jnp.concatenate([rgb[0][:, :, 0]] * K),
                  jnp.concatenate([q0] * K),
                  jnp.asarray([False, False, True]))[0]
    state = streaming.reset_stream_slot(state, 2)

    pos = [0] * K   # per-session next frame index
    for tick in range(T + K - 1):
        act = np.zeros(K, bool)
        frames = np.zeros((K, 3, H, W), np.float32)
        queries = np.zeros((K, 1, H, W), np.float32)
        for k in range(K):
            if k <= tick and pos[k] < T:
                act[k] = True
                frames[k] = np.asarray(rgb[k][0, :, pos[k]])
                if pos[k] == 0:
                    queries[k] = np.asarray(q0[0])
        if not act.any():
            continue
        state, masks, flags = stepK(state, jnp.asarray(frames), jnp.asarray(queries),
                                    jnp.asarray(act))
        for k in range(K):
            if act[k]:
                m_ref, f_ref = refs[k][pos[k]]
                np.testing.assert_allclose(np.asarray(masks[k]), m_ref,
                                           rtol=2e-4, atol=2e-5)
                if f_ref is not None:
                    np.testing.assert_allclose(np.asarray(flags[k]), f_ref,
                                               rtol=2e-4, atol=2e-5)
                pos[k] += 1
    assert [int(x) for x in np.asarray(state.t)] == [T] * K


def test_multi_session_unbounded_matches_single(setup):
    cfg, params = setup
    _multi_vs_single(cfg, params, window=None)


def test_multi_session_windowed_matches_single(setup):
    cfg, params = setup
    _multi_vs_single(cfg, params, window=4)


def test_multi_session_windowed_rope_matches_single(setup):
    cfg, params = setup
    _multi_vs_single(cfg, params, window=4, rope=True)

'''
The serving layer must hand back EXACTLY what the streaming model computes: a client
session's per-frame mask logits (float16 on the wire) and flags must match a direct
stream_step run on the same inputs, with concurrent sessions fully isolated.
'''

import threading
import time

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import conftest  # noqa: F401
from tcow_tpu.models import mask_tracker as mt
from tcow_tpu.models import streaming
from tcow_tpu import serving


@pytest.fixture(scope='module')
def setup():
    from tcow_tpu.models import timesformer as tsf
    old = dict(tsf.DEPTH_PRESETS)
    tsf.DEPTH_PRESETS[3] = (48, 4)
    cfg = mt.SeekerConfig(num_total_frames=6, frame_height=32, frame_width=48,
                          causal_attention=1, drop_path_rate=0.0, network_depth=3)
    params = mt.init_params(jax.random.key(0), cfg)
    params['backbone']['blocks']['temporal_fc']['w'] = jax.random.normal(
        jax.random.key(7), params['backbone']['blocks']['temporal_fc']['w'].shape) * 0.05
    server = serving.TrackerServer(params, cfg, port=0)
    host, port = server.start()
    yield cfg, params, host, port
    server.stop()
    tsf.DEPTH_PRESETS.clear()
    tsf.DEPTH_PRESETS.update(old)


def _frames(seed, T, H, W):
    rng = np.random.RandomState(seed)
    rgb = rng.randint(0, 256, size=(T, H, W, 3), dtype=np.uint8)
    q = np.zeros((H, W), np.uint8)
    q[8:16, 8:24] = 255
    return rgb, q


def _reference_stream(params, cfg, rgb_u8, qmask, window=None):
    state = streaming.init_stream(params, cfg, batch_size=1,
                                  max_frames=None if window else rgb_u8.shape[0],
                                  window=window)
    # Jitted exactly like the server's step so outputs are bit-identical.
    step = jax.jit(lambda p, s, f, q: streaming.stream_step(p, cfg, s, f, q,
                                                            window=window))
    masks, flags = [], []
    for t in range(rgb_u8.shape[0]):
        f = jnp.asarray(rgb_u8[t].transpose(2, 0, 1)[None].astype(np.float32) / 255.0)
        q = (qmask > 127).astype(np.float32)[None, None] if t == 0 else \
            np.zeros((1, 1) + qmask.shape, np.float32)
        state, m, fl = step(params, state, f, jnp.asarray(q))
        masks.append(np.asarray(m[0], np.float16))   # server replies in float16
        flags.append(None if fl is None else np.asarray(fl[0], np.float32))
    return masks, flags


def test_two_interleaved_sessions_match_direct_streaming(setup):
    cfg, params, host, port = setup
    T, H, W = 5, cfg.frame_height, cfg.frame_width
    rgb_a, q_a = _frames(1, T, H, W)
    rgb_b, q_b = _frames(2, T, H, W)
    ref_a = _reference_stream(params, cfg, rgb_a, q_a, window=4)
    ref_b = _reference_stream(params, cfg, rgb_b, q_b, window=None)

    ca = serving.TrackerClient(host, port)
    cb = serving.TrackerClient(host, port)
    meta = ca.open(window=4)
    assert (meta['height'], meta['width']) == (H, W)
    assert meta['mask_channels'] == cfg.output_channels
    cb.open(window=0, max_frames=T)

    # Interleave the two sessions frame by frame: states must not cross-contaminate.
    for t in range(T):
        ma, fa, ta = ca.track(rgb_a[t], query_mask=q_a if t == 0 else None)
        mb, fb, tb = cb.track(rgb_b[t], query_mask=q_b if t == 0 else None)
        assert ta == t and tb == t
        np.testing.assert_array_equal(ma, ref_a[0][t])
        np.testing.assert_array_equal(mb, ref_b[0][t])
        if ref_a[1][t] is not None:
            np.testing.assert_allclose(np.asarray(fa, np.float32), ref_a[1][t],
                                       rtol=1e-5, atol=1e-6)

    stats = ca.stats()
    assert stats['active_sessions'] == 2
    assert stats['frames_served'] >= 2 * T
    assert stats['ms_per_frame_ema'] > 0
    ca.close()
    cb.close()


def test_unbounded_session_rejects_overflow_and_stays_alive(setup):
    cfg, params, host, port = setup
    H, W = cfg.frame_height, cfg.frame_width
    rgb, q = _frames(3, 3, H, W)
    c = serving.TrackerClient(host, port)
    c.open(window=0, max_frames=2)
    c.track(rgb[0], query_mask=q)
    c.track(rgb[1])
    with pytest.raises(RuntimeError, match='full at 2 frames'):
        c.track(rgb[2])
    # Application errors must not kill the connection.
    assert c.stats()['frames_served'] >= 2
    c.close()


def test_protocol_errors_are_reported(setup):
    cfg, params, host, port = setup
    c = serving.TrackerClient(host, port)
    with pytest.raises(RuntimeError, match='open a session first'):
        c.track(np.zeros((cfg.frame_height, cfg.frame_width, 3), np.uint8))
    c.open(window=4)
    with pytest.raises(RuntimeError, match='already open'):
        c.open(window=4)
    # Bad payload size.
    serving.send_msg(c._sock, {'cmd': 'frame', 'has_query': False}, b'abc')
    reply, _ = serving.recv_msg(c._sock)
    assert not reply['ok'] and 'payload' in reply['error']
    c.close()


@pytest.fixture(scope='module')
def batched_setup(setup):
    cfg, params, _, _ = setup
    server = serving.TrackerServer(params, cfg, port=0, batch_slots=3)
    host, port = server.start()
    yield cfg, params, host, port, server
    server.stop()


def test_batched_server_matches_direct_streaming(batched_setup):
    '''Continuous batching must be transparent: concurrent staggered sessions through one
    batched device step produce the same per-frame outputs as direct per-session streams
    (same math batched, so allclose rather than the dedicated path's bit-equality).'''
    cfg, params, host, port, server = batched_setup
    T, H, W = 5, cfg.frame_height, cfg.frame_width
    vids = [_frames(10 + k, T, H, W) for k in range(3)]
    refs = [_reference_stream(params, cfg, rgb, q, window=4) for rgb, q in vids]

    clients = [serving.TrackerClient(host, port) for _ in range(3)]
    results = [[] for _ in range(3)]
    errors = []

    def run(k):
        try:
            clients[k].open(window=4)
            rgb, q = vids[k]
            time.sleep(0.05 * k)   # staggered starts: sessions at different positions
            for t in range(T):
                m, fl, tt = clients[k].track(rgb[t], query_mask=q if t == 0 else None)
                assert tt == t
                results[k].append((m, fl))
        except BaseException as e:   # noqa: BLE001
            errors.append((k, e))

    threads = [threading.Thread(target=run, args=(k,)) for k in range(3)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=120)
    assert not errors, errors

    for k in range(3):
        for t in range(T):
            m, fl = results[k][t]
            np.testing.assert_allclose(np.asarray(m, np.float32),
                                       np.asarray(refs[k][0][t], np.float32),
                                       rtol=2e-3, atol=2e-3)
            if refs[k][1][t] is not None:
                np.testing.assert_allclose(np.asarray(fl, np.float32), refs[k][1][t],
                                           rtol=1e-3, atol=1e-4)
    # All three sessions shared ONE batch group (same geometry), visible in stats.
    assert len(server._groups) == 1
    stats = clients[0].stats()
    (g,) = stats['batch_groups']
    assert g['window'] == 4 and g['live_sessions'] == 3
    assert g['frames'] >= 3 * T and g['steps'] >= 1
    for c in clients:
        c.close()


def test_batched_slot_recycling_and_capacity(batched_setup):
    '''A 4th same-geometry session must be rejected while 3 are live, and a recycled slot
    must serve a fresh session correctly (stale cache from the previous occupant masked).'''
    cfg, params, host, port, server = batched_setup
    T, H, W = 3, cfg.frame_height, cfg.frame_width
    rgb, q = _frames(42, T, H, W)
    ref = _reference_stream(params, cfg, rgb, q, window=4)

    holders = [serving.TrackerClient(host, port) for _ in range(3)]
    for c in holders:
        c.open(window=4)
    extra = serving.TrackerClient(host, port)
    with pytest.raises(RuntimeError, match='batch group full'):
        extra.open(window=4)
    holders[1].close()
    time.sleep(0.3)   # let the server release the slot

    fresh = serving.TrackerClient(host, port)
    fresh.open(window=4)
    for t in range(T):
        m, _, _ = fresh.track(rgb[t], query_mask=q if t == 0 else None)
        np.testing.assert_allclose(np.asarray(m, np.float32),
                                   np.asarray(ref[0][t], np.float32),
                                   rtol=2e-3, atol=2e-3)
    fresh.close()
    for c in (holders[0], holders[2]):
        c.close()


def test_group_eviction_and_capacity(setup):
    '''Idle same-geometry groups are evicted to honor max_groups; non-idle ones refuse new
    geometries with a clean error instead of accumulating device memory.'''
    cfg, params, _, _ = setup
    server = serving.TrackerServer(params, cfg, port=0, batch_slots=2, max_groups=1)
    host, port = server.start()
    try:
        a = serving.TrackerClient(host, port)
        a.open(window=4)
        # Group A is live (non-idle): a different geometry must be rejected.
        b = serving.TrackerClient(host, port)
        with pytest.raises(RuntimeError, match='at capacity'):
            b.open(window=5)
        a.close()
        deadline = time.time() + 10
        while time.time() < deadline:   # poll: the conn thread releases the slot async
            if all(g.idle() for g in server._groups.values()):
                break
            time.sleep(0.02)
        # Group A is now idle: geometry B evicts it and works.
        b2 = serving.TrackerClient(host, port)
        b2.open(window=5)
        rgb, q = _frames(5, 1, cfg.frame_height, cfg.frame_width)
        m, _, t = b2.track(rgb[0], query_mask=q)
        assert t == 0 and m.shape[0] == cfg.output_channels
        assert len(server._groups) == 1
        b2.close()
    finally:
        server.stop()


def test_failed_step_recycles_group_instead_of_bricking(batched_setup):
    '''After a device-step failure the group rebuilds its state and bumps the epoch:
    the stale session gets a clean "reopen" error (connection alive), and a NEW session
    on the recycled group works and matches direct streaming.'''
    cfg, params, host, port, server = batched_setup
    H, W = cfg.frame_height, cfg.frame_width
    rgb, q = _frames(6, 3, H, W)
    ref = _reference_stream(params, cfg, rgb, q, window=4)

    c = serving.TrackerClient(host, port)
    c.open(window=4)
    c.track(rgb[0], query_mask=q)
    # Simulate the aftermath of a failed (state-donating) device step: the dispatcher
    # rebuilds the state and bumps the epoch (white-box: exercise the same code path).
    group = next(iter(server._groups.values()))
    with server._device_lock:
        group.state = group._fresh_state()
    with group.cond:
        group.epoch += 1
        group.free = list(range(group.slots))
    with pytest.raises(RuntimeError, match='reopen'):
        c.track(rgb[1])
    # The connection is still alive (stats works) and a fresh session succeeds.
    assert c.stats()['frames_served'] >= 1
    c.close()
    c2 = serving.TrackerClient(host, port)
    c2.open(window=4)
    for t in range(3):
        m, _, _ = c2.track(rgb[t], query_mask=q if t == 0 else None)
        np.testing.assert_allclose(np.asarray(m, np.float32),
                                   np.asarray(ref[0][t], np.float32),
                                   rtol=2e-3, atol=2e-3)
    c2.close()


def test_malformed_headers_do_not_kill_the_thread(setup):
    cfg, params, host, port = setup
    import json as json_mod
    import socket as socket_mod
    import struct as struct_mod
    # Non-dict JSON header: error reply, connection stays alive.
    s = socket_mod.create_connection((host, port), timeout=30)
    h = json_mod.dumps([1, 2]).encode()
    s.sendall(struct_mod.pack('>II', len(h), 0) + h)
    reply, _ = serving.recv_msg(s)
    assert not reply['ok'] and 'JSON object' in reply['error']
    serving.send_msg(s, {'cmd': 'stats'})
    assert serving.recv_msg(s)[0]['ok']
    # Invalid JSON bytes: one protocol-error reply, then the server drops the connection.
    s2 = socket_mod.create_connection((host, port), timeout=30)
    s2.sendall(struct_mod.pack('>II', 3, 0) + b'{{{')
    reply, _ = serving.recv_msg(s2)
    assert not reply['ok'] and 'protocol error' in reply['error']
    assert serving.recv_msg(s2) is None   # clean EOF
    s.close()
    s2.close()


def test_weight_hot_reload(setup):
    '''"reload" swaps weights without restart: stale sessions get a clean reopen error,
    fresh sessions produce the NEW weights' outputs (both dedicated and batched modes).'''
    cfg, params, _, _ = setup
    params_b = mt.init_params(jax.random.key(99), cfg)
    registry = {'ckpt_b': params_b}
    for slots in (1, 2):
        server = serving.TrackerServer(params, cfg, port=0, batch_slots=slots,
                                       params_loader=registry.__getitem__)
        host, port = server.start()
        try:
            T, H, W = 2, cfg.frame_height, cfg.frame_width
            rgb, q = _frames(77, T, H, W)
            ref_b = _reference_stream(params_b, cfg, rgb, q, window=4)

            stale = serving.TrackerClient(host, port)
            stale.open(window=4)
            stale.track(rgb[0], query_mask=q)

            admin = serving.TrackerClient(host, port)
            assert admin.reload('ckpt_b') == 1
            with pytest.raises(RuntimeError, match='reopen'):
                stale.track(rgb[1])
            stale.close()

            fresh = serving.TrackerClient(host, port)
            fresh.open(window=4)
            for t in range(T):
                m, _, _ = fresh.track(rgb[t], query_mask=q if t == 0 else None)
                np.testing.assert_allclose(np.asarray(m, np.float32),
                                           np.asarray(ref_b[0][t], np.float32),
                                           rtol=2e-3, atol=2e-3)
            fresh.close()
            admin.close()
        finally:
            server.stop()


def test_session_migration_across_reload(setup):
    '''migrate_sessions=True: a weight reload no longer kills live sessions — their next
    frame transparently rebuilds the cache by replaying the retained frame ring through
    the NEW weights, so post-reload outputs equal a fresh session under the new weights
    fed the retained subsequence (dedicated and batched modes).'''
    cfg, params, _, _ = setup
    params_b = mt.init_params(jax.random.key(99), cfg)
    registry = {'ckpt_b': params_b}
    T, H, W = 5, cfg.frame_height, cfg.frame_width
    rgb, q = _frames(78, T, H, W)
    k = 3  # frames served before the reload (all retained: window=4 keeps 1 pinned + 3)
    ref_b = _reference_stream(params_b, cfg, rgb, q, window=4)
    for slots in (1, 2):
        server = serving.TrackerServer(params, cfg, port=0, batch_slots=slots,
                                       params_loader=registry.__getitem__,
                                       migrate_sessions=True)
        host, port = server.start()
        try:
            c = serving.TrackerClient(host, port)
            c.open(window=4)
            for t in range(k):
                c.track(rgb[t], query_mask=q if t == 0 else None)
            admin = serving.TrackerClient(host, port)
            assert admin.reload('ckpt_b') == 1
            # The same session keeps streaming; frames k.. match the new-weights stream.
            for t in range(k, T):
                m, _, tt = c.track(rgb[t])
                assert tt == t   # client-visible timeline is continuous
                np.testing.assert_allclose(np.asarray(m, np.float32),
                                           np.asarray(ref_b[0][t], np.float32),
                                           rtol=2e-3, atol=2e-3)
            assert c.stats()['migrations'] == 1
            c.close()
            admin.close()
        finally:
            server.stop()


def test_migration_ring_trim_matches_window_retention(setup):
    '''When more frames streamed than the window holds, migration replays exactly what the
    device cache retains: the pinned prefix + the last (window - pinned) frames.'''
    cfg, params, _, _ = setup
    params_b = mt.init_params(jax.random.key(98), cfg)
    registry = {'ckpt_b': params_b}
    H, W = cfg.frame_height, cfg.frame_width
    window, fed = 4, 6
    rgb, q = _frames(79, fed + 1, H, W)
    # Expected: new weights fed the RETAINED subsequence [0] + [3,4,5], then frame 6.
    keep = [0] + list(range(fed - (window - 1), fed))
    sub = np.stack([rgb[i] for i in keep + [fed]])
    ref_b = _reference_stream(params_b, cfg, sub, q, window=window)
    server = serving.TrackerServer(params, cfg, port=0,
                                   params_loader=registry.__getitem__,
                                   migrate_sessions=True)
    host, port = server.start()
    try:
        c = serving.TrackerClient(host, port)
        c.open(window=window)
        for t in range(fed):
            c.track(rgb[t], query_mask=q if t == 0 else None)
        admin = serving.TrackerClient(host, port)
        admin.reload('ckpt_b')
        m, _, tt = c.track(rgb[fed])
        assert tt == fed
        np.testing.assert_allclose(np.asarray(m, np.float32),
                                   np.asarray(ref_b[0][-1], np.float32),
                                   rtol=2e-3, atol=2e-3)
        c.close()
        admin.close()
    finally:
        server.stop()


def test_recycle_fails_pending_frames_as_stale(setup):
    '''Frames still in `pending` (not yet grabbed by the dispatcher — common when device
    steps are slow) when a recycle lands must fail with _StaleBatch, so a migrating
    server retries them transparently instead of surfacing a hard reopen error. (Found on
    the TPU relay: 3 of 4 sessions got killed through a reload despite migrate_sessions.)'''
    cfg, params, _, _ = setup
    server = serving.TrackerServer(params, cfg, port=0, batch_slots=2,
                                   migrate_sessions=True)
    try:
        group = serving._BatchGroup(server, window=4, pinned=1, tmax=4,
                                    slots=2)
        # Pause the dispatcher by holding the device lock THROUGH a recycle, then inject
        # a pending frame exactly as submit() would.
        H, W = cfg.frame_height, cfg.frame_width
        box = serving._FrameBox(np.zeros((1, 3, H, W), np.uint8),
                                np.zeros((1, 1, H, W), np.uint8))
        with group.cond:
            group.pending[0] = box
        group.recycle()
        assert box.done.is_set()
        assert isinstance(box.error, serving._StaleBatch), box.error
        assert isinstance(box.error, ValueError)  # non-migrating servers: app error
        group.stopped.set()
    finally:
        server.stop()


def test_migrate_pending_group_not_evicted(setup):
    '''After a reload recycles a group (all slots free), open connections awaiting
    migration still reference it: a new-geometry open must NOT evict it out from under
    them (the zero-downtime contract), but closing the session frees it.'''
    cfg, params, _, _ = setup
    registry = {'ckpt_b': mt.init_params(jax.random.key(97), cfg)}
    server = serving.TrackerServer(params, cfg, port=0, batch_slots=2, max_groups=1,
                                   params_loader=registry.__getitem__,
                                   migrate_sessions=True)
    host, port = server.start()
    try:
        H, W = cfg.frame_height, cfg.frame_width
        rgb, q = _frames(80, 2, H, W)
        a = serving.TrackerClient(host, port)
        a.open(window=4)
        a.track(rgb[0], query_mask=q)
        admin = serving.TrackerClient(host, port)
        admin.reload('ckpt_b')   # recycles the group; a awaits migration
        b = serving.TrackerClient(host, port)
        with pytest.raises(RuntimeError, match='at capacity'):
            b.open(window=5)     # would evict a's group under max_groups=1
        m, _, tt = a.track(rgb[1])   # migration still works after the denied open
        assert tt == 1 and m is not None
        a.close()
        deadline = time.time() + 10
        while time.time() < deadline and not all(
                g.idle() for g in server._groups.values()):
            time.sleep(0.02)
        b2 = serving.TrackerClient(host, port)
        b2.open(window=5)        # session closed -> group truly idle -> evictable
        b2.close()
        admin.close()
        b.close()
    finally:
        server.stop()


def test_reload_disabled_without_loader(setup):
    cfg, params, host, port = setup
    c = serving.TrackerClient(host, port)
    with pytest.raises(RuntimeError, match='reload is disabled'):
        c.reload('/nonexistent')
    c.close()


def test_oversized_geometry_rejected_before_allocation(batched_setup):
    '''A hostile/oversized open must be rejected by the memory bound, not OOM the chip.'''
    cfg, params, host, port, server = batched_setup
    c = serving.TrackerClient(host, port)
    with pytest.raises(RuntimeError, match='GiB'):
        c.open(window=10_000_000)
    with pytest.raises(RuntimeError, match='window > pinned_frames'):
        c.open(window=2, pinned_frames=5)
    # The connection survives and a sane open works.
    c.open(window=4)
    c.close()


def test_aggregate_cache_budget_and_pinned_normalization(setup):
    '''The KV budget bounds the SUM over live groups (not each group alone), and
    pinned_frames cannot mint distinct unbounded-mode geometries.'''
    cfg, params, _, _ = setup
    server = serving.TrackerServer(params, cfg, port=0, batch_slots=2, max_groups=8)
    # Budget that fits ONE 5-slot-window group (2 batch slots) but not two.
    server.max_cache_bytes = int(server._cache_bytes(5, 2) * 1.5)
    host, port = server.start()
    try:
        a = serving.TrackerClient(host, port)
        a.open(window=5)
        b = serving.TrackerClient(host, port)
        with pytest.raises(RuntimeError, match='at capacity'):
            b.open(window=4)   # second geometry would exceed the aggregate budget
        a.close()
        deadline = time.time() + 10
        while time.time() < deadline and not all(
                g.idle() for g in server._groups.values()):
            time.sleep(0.02)
        b2 = serving.TrackerClient(host, port)
        b2.open(window=4)      # idle group evicted to fit the byte budget
        assert len(server._groups) == 1
        # Unbounded mode: pinned_frames is dead and must not create new geometries.
        c1 = serving.TrackerClient(host, port)
        c2 = serving.TrackerClient(host, port)
        b2.close()
        time.sleep(0.2)
        c1.open(window=0, max_frames=3, pinned_frames=1)
        c2.open(window=0, max_frames=3, pinned_frames=2)
        assert sum(1 for (w, p, t) in server._groups if w is None) == 1
        c1.close()
        c2.close()
    finally:
        server.stop()

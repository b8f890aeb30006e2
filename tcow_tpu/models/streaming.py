'''
Streaming (online) inference for the causal seeker: process video frame-by-frame with
temporal K/V caches, producing per-frame masks with O(1) latency per frame.

This is a NEW capability over the reference enabled by its temporally-causal attention
(causal_attention == 1, vit.py:90-99): the reference can only run fixed-T clips offline
(SURVEY.md section 5.7), while causal masking makes frame t's output independent of frames
> t, so the identical math factorizes into an incremental recurrence:

  - temporal attention: standard KV caching per block (query = the new frame's tokens,
    keys/values = all cached frames);
  - spatial attention (ca=1): each frame's sequence is [cls_in(block), tokens(frame)], and
    the block's cls update uses ONLY frame 0's spatial attention (vit.py:197-198) — so the
    per-block cls chain is computed once at frame 0 and cached;
  - decode head is per-frame.

Outputs are verified to match the batch causal forward exactly (tests/test_streaming.py).

Windowed mode (`window=`) bounds the cache for arbitrarily long videos: the first
`pinned_frames` frames (which carry the query identity and the frozen cls chain) stay
resident forever, while the remaining `window - pinned_frames` slots form a ring buffer of
the most recent frames. Per-frame latency and memory are then O(window) regardless of video
length; time embeddings clamp to the last trained index for frames beyond the training
horizon. Within the first `window` frames the windowed and unbounded paths are bit-identical
(softmax is permutation-invariant over cache slots). Beyond it, each block's cached KVs were
computed from frames in THEIR window, so the output's receptive field reaches back at most
`depth * (window - pinned - 1)` recent frames plus the pinned prefix (dilated-conv style) —
both properties are covered by tests/test_streaming.py.
'''

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from tcow_tpu.models import timesformer as tsf
from tcow_tpu.models import mask_tracker as mt
from tcow_tpu.ops import rope as rope_lib


class StreamState(NamedTuple):
    # Caches are PER-BLOCK tuples (length L) of (B, N, nh, Tmax, dh) arrays rather than one
    # stacked (L, ...) array: each block's slot update is then a dynamic_update_slice on its
    # own linearly-threaded buffer, which XLA performs in place when the state is a scan
    # carry or donated — the stacked form forced a full cache copy per block per frame.
    k_cache: Tuple[jnp.ndarray, ...]   # temporal attention keys per block (head-major)
    v_cache: Tuple[jnp.ndarray, ...]
    cls_in: jnp.ndarray    # (L, B, D) per-block input cls token (frozen after frame 0)
    t: jnp.ndarray         # () int32 current frame index


def init_stream(params: Dict[str, Any], cfg: mt.SeekerConfig, batch_size: int,
                max_frames: Optional[int] = None, window: Optional[int] = None,
                pinned_frames: int = 1) -> StreamState:
    '''With `window=None`, the cache holds `max_frames or cfg.num_frames` slots and frame t
    writes slot t (exact unbounded attention up to the cache size). With `window=S`, the
    cache holds S slots: `pinned_frames` permanent + an (S - pinned_frames)-slot ring of the
    most recent frames, supporting videos of ANY length at O(S) memory.'''
    bb = cfg.backbone_config()
    assert bb.causal_attention == 1, 'streaming requires causal_attention == 1'
    if window is not None:
        assert window > pinned_frames >= 1, (window, pinned_frames)
        Tmax = window
    else:
        Tmax = max_frames or bb.num_frames
    L, B, N, D = bb.depth, batch_size, bb.num_patches, bb.embed_dim
    dt = bb.compute_dtype
    nh = bb.num_heads
    return StreamState(
        k_cache=tuple(jnp.zeros((B, N, nh, Tmax, D // nh), dt) for _ in range(L)),
        v_cache=tuple(jnp.zeros((B, N, nh, Tmax, D // nh), dt) for _ in range(L)),
        cls_in=jnp.zeros((L, B, D), dt),
        t=jnp.int32(0))


def _qkv_heads(p, x):
    '''(..., D) -> q, k, v each (..., D) pre-head-split.'''
    qkv = tsf._dense(x, p['qkv'])
    D = x.shape[-1]
    return qkv[..., :D], qkv[..., D:2 * D], qkv[..., 2 * D:]


def _attend_cached(q, k_all, v_all, nh, valid):
    '''q (B, N, D) over head-major cached keys/values (B, N, nh, S, dh); `valid` (S,) or
    per-example (B, S) bool marks the populated cache slots (slot order is irrelevant:
    softmax is permutation-invariant over cache slots).

    The head-major (b, n, h, t, d) layout matches the einsum batch dims (b, n, h) exactly,
    so BOTH contractions are relayout-free. The original (B, N, S, D) layout forced XLA to
    transpose the whole cache every frame, making per-frame cost superlinear in S (38
    ms/frame at S=120 vs 4.6 at S=30; head-major measures 0.55 ms/block vs 2.60 at S=120,
    against a 0.43 ms cache-copy floor). Reading only the valid-prefix slots via a
    lax.switch over static prefix sizes was tried and measured SLOWER (the conditional
    forces extra materializations of the cache operand) — reads stay full-cache.'''
    B, N, D = q.shape
    dh = D // nh
    scale = dh ** -0.5
    qh = q.reshape(B, N, nh, dh)
    logits = jnp.einsum('bnhtd,bnhd->bnht', k_all, qh,
                        preferred_element_type=jnp.float32) * scale
    vmask = valid[None, None, None, :] if valid.ndim == 1 else valid[:, None, None, :]
    logits = jnp.where(vmask, logits, jnp.float32(-1e10))
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)          # (B, N, nh, S)
    out = jnp.einsum('bnht,bnhtd->bnhd', probs, v_all)
    return out.reshape(B, N, D)


def _embed_frame(bparams, bb, frame_rgb, query_mask, gh: int, gw: int):
    '''Patch-embed ONE frame + spatial pos embed -> (tokens (B, N, D), pos (1+N, D)).'''
    B = frame_rgb.shape[0]
    p_sz = bb.patch_size
    N = gh * gw
    x = jnp.concatenate([frame_rgb, query_mask], axis=1).astype(bb.compute_dtype)
    if bb.normalize_inputs:
        mean = jnp.asarray(tsf.TIMESFORMER_MEAN, x.dtype).reshape(1, 3, 1, 1)
        std = jnp.asarray(tsf.TIMESFORMER_STD, x.dtype).reshape(1, 3, 1, 1)
        x = jnp.concatenate([(x[:, 0:3] - mean) / std, x[:, 3:]], axis=1)
    x = x.transpose(0, 2, 3, 1).reshape(B, gh, p_sz, gw, p_sz, bb.in_channels)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, N, p_sz * p_sz * bb.in_channels)
    pe = bparams['patch_embed']
    x = x @ pe['w'].astype(x.dtype) + pe['b'].astype(x.dtype)
    pos = tsf.resize_pos_embed(bparams['pos_embed'], gh, gw,
                               src_grid=(bb.grid_h, bb.grid_w)).astype(x.dtype)
    return x + pos[None, 1:], pos


def _decode_frame(params, cfg: mt.SeekerConfig, xs, gh: int, gw: int
                  ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    '''Per-frame decode head (mask_tracker.py:113-137) -> (mask logits, flags|None).'''
    B = xs.shape[0]
    D = xs.shape[-1]
    p_sz = cfg.backbone_config().patch_size
    feats = xs.reshape(B, gh, gw, D).astype(jnp.float32)
    hp = params['post_linear']
    C = cfg.output_channels
    patches = jnp.einsum('bhwd,dk->bhwk', feats, hp['w'])
    patches = (patches + hp['b']).reshape(B, gh, gw, C, p_sz, p_sz)
    mask = patches.transpose(0, 3, 1, 4, 2, 5).reshape(B, C, gh * p_sz, gw * p_sz)
    mask = mt.coarsen_mask(mask, cfg.track_map_stride, cfg.track_map_resize)
    flags = None
    if cfg.flag_channels > 0:
        fp = params['flag_linear']
        flags = (jnp.einsum('bhwd,df->bhwf', feats, fp['w']) + fp['b']).mean(axis=(1, 2))
    return mask.astype(jnp.float32), flags


def stream_step(params: Dict[str, Any], cfg: mt.SeekerConfig, state: StreamState,
                frame_rgb: jnp.ndarray, query_mask: jnp.ndarray,
                window: Optional[int] = None, pinned_frames: int = 1
                ) -> Tuple[StreamState, jnp.ndarray, Optional[jnp.ndarray]]:
    '''Process ONE frame.

    :param frame_rgb (B, 3, H, W) float in [0, 1].
    :param query_mask (B, 1, H, W): the query at its frame, zeros elsewhere.
    :param window/pinned_frames: static ints; MUST match the init_stream call. None = the
        unbounded (exact) mode. Mark them static when jitting.
    :return (new_state, mask_logits (B, C, H, W), flags (B, F) or None).
    '''
    bb = cfg.backbone_config()
    B, _, H, W = frame_rgb.shape
    p_sz, D, nh = bb.patch_size, bb.embed_dim, bb.num_heads
    gh, gw = H // p_sz, W // p_sz
    N = gh * gw
    bparams = params['backbone']
    L = bb.depth
    Tmax = state.k_cache[0].shape[-2]
    t = state.t

    x, pos = _embed_frame(bparams, bb, frame_rgb, query_mask, gh, gw)
    if window is None:
        # Unbounded mode: cache slot == frame index; the time embedding is nearest-resized
        # to the cache size (identity when Tmax == num_frames, matching the batch forward).
        time = tsf.nearest_resize_1d(bparams['time_embed'], Tmax, axis=0).astype(x.dtype)
        time_idx = t
        slot = t
        valid = jnp.arange(Tmax) <= t
    else:
        # Windowed mode: pinned prefix + ring of recent frames; without rope, the time
        # embedding clamps to the last trained index beyond the training horizon.
        P = pinned_frames
        R = window - P
        assert Tmax == window, (Tmax, window)
        time = bparams['time_embed'].astype(x.dtype)
        time_idx = jnp.minimum(t, time.shape[0] - 1)
        slot = jnp.where(t < P, t, P + (t - P) % R)
        n_ring = jnp.clip(t + 1 - P, 0, R)
        valid = jnp.concatenate([jnp.arange(P) <= t, jnp.arange(R) < n_ring])
    if not bb.temporal_rope:
        # With rope, the rotation IS the time signal (matching tsf.forward, which skips
        # the absolute embedding): no clamped embedding leaks into token content.
        x = x + time[time_idx][None, None, :]

    cls0 = (bparams['cls_token'].astype(x.dtype) + pos[0])[None, :].repeat(B, axis=0)

    is_first = (t == 0)

    # The block loop is UNROLLED (L is small) with each block's cache updated in place on
    # its own buffer; a lax.scan over stacked caches would copy every cache fully per frame
    # (xs -> ys), which dominated per-frame cost at large windows.
    xs, cls_carry = x, cls0
    k_new, v_new, cls_in_new = [], [], []
    for l in range(L):
        pb = jax.tree.map(lambda a: a[l], bparams['blocks'])
        # Block input cls: at frame 0 it is the previous block's output (chained through
        # the carry, seeded with cls0); afterwards the frozen cached value.
        cls_in = jnp.where(is_first, cls_carry, state.cls_in[l])

        # Temporal attention with KV cache (head-major layout: slot axis = 3 of 4).
        y = tsf.layer_norm(xs, pb['temporal_norm1'], bb.ln_eps)
        q, k, v = _qkv_heads(pb['temporal_attn'], y)
        Bq, Nq, Dq = k.shape
        dh = Dq // nh
        k5 = k.reshape(Bq, Nq, nh, dh)
        if bb.temporal_rope:
            # Rotate q and the cached key by the ABSOLUTE frame index (ops/rope.py): the
            # cache then holds rotated keys and logits depend only on relative offsets,
            # so no time index ever clamps — the windowed stream extrapolates past the
            # trained horizon smoothly (pinned-frame offsets still grow with t).
            cos_t, sin_t = rope_lib.rope_tables(t.astype(jnp.float32), dh)
            q = rope_lib.apply_rope(q.reshape(Bq, Nq, nh, dh),
                                    cos_t, sin_t).reshape(Bq, Nq, Dq)
            k5 = rope_lib.apply_rope(k5, cos_t, sin_t)
        k_all = jax.lax.dynamic_update_index_in_dim(state.k_cache[l], k5, slot, axis=3)
        v_all = jax.lax.dynamic_update_index_in_dim(
            state.v_cache[l], v.reshape(Bq, Nq, nh, dh), slot, axis=3)
        res_t = _attend_cached(q, k_all, v_all, nh, valid)
        res_t = tsf._dense(res_t, pb['temporal_attn']['proj'])
        res_t = tsf._dense(res_t, pb['temporal_fc'])
        xt = xs + res_t

        # Spatial attention over [cls_in, tokens] (ca == 1, vit.py:179-200).
        seq = jnp.concatenate([cls_in[:, None, :], xt], axis=1)
        res_sp = tsf.attention(pb['attn'], tsf.layer_norm(seq, pb['norm1'], bb.ln_eps), nh)
        cls_from_sp = res_sp[:, 0, :]
        tokens = xt + res_sp[:, 1:, :]

        # cls chain: only frame 0's spatial attention feeds the block's cls output
        # (vit.py:197-198), so it is computed once and frozen.
        cls_mid = cls_in + cls_from_sp
        cls_out = cls_mid + tsf.mlp(pb['mlp'],
                                    tsf.layer_norm(cls_mid, pb['norm2'], bb.ln_eps))
        tokens = tokens + tsf.mlp(pb['mlp'], tsf.layer_norm(tokens, pb['norm2'], bb.ln_eps))
        xs, cls_carry = tokens, cls_out
        k_new.append(k_all)
        v_new.append(v_all)
        cls_in_new.append(cls_in)
    cls_in_new = jnp.stack(cls_in_new)

    if bb.norm_embeddings:
        xs = tsf.layer_norm(xs, bparams['norm'], bb.ln_eps)

    mask, flags = _decode_frame(params, cfg, xs, gh, gw)
    new_state = StreamState(k_cache=tuple(k_new), v_cache=tuple(v_new),
                            cls_in=cls_in_new, t=t + 1)
    return new_state, mask, flags


# -- Multi-session (continuous-batching) streaming ---------------------------------------
#
# Serving many independent tracked streams on one chip wants ONE batched device step per
# tick instead of one step per session: the per-step dispatch/host-sync overhead then
# amortizes over every session that has a frame pending (classic continuous batching).
# Sessions sit at DIFFERENT stream positions, so the state carries a PER-EXAMPLE frame
# index t (B,) and each example writes its own cache slot. Recycling a batch slot for a
# new session only needs t[i] = 0: `valid` masks every slot a session has not yet written
# (pinned slots become valid exactly when written, ring slots only after n_ring covers
# them), so stale cache contents from a previous occupant are never read.


def init_stream_multi(params: Dict[str, Any], cfg: mt.SeekerConfig, batch_size: int,
                      max_frames: Optional[int] = None, window: Optional[int] = None,
                      pinned_frames: int = 1) -> StreamState:
    '''Like init_stream, but t has shape (batch_size,): each example is an independent
    session at its own stream position (use with stream_step_multi).'''
    s = init_stream(params, cfg, batch_size, max_frames, window, pinned_frames)
    return s._replace(t=jnp.zeros((batch_size,), jnp.int32))


def reset_stream_slot(state: StreamState, i) -> StreamState:
    '''Recycle batch slot i for a fresh session (multi-session states only).'''
    return state._replace(t=state.t.at[i].set(0))


def _write_slot_multi(cache_l, new_val, slot, active):
    '''Per-example cache-slot write that leaves inactive examples' caches unchanged:
    cache_l (B, N, nh, S, dh), new_val (B, N, nh, dh), slot (B,) int32, active (B,) bool.
    Inactive examples write back the OLD value at their slot (a one-slot read, not a
    full-cache select, so the update stays in place on the donated buffer).'''
    old = jax.vmap(lambda c, s: jax.lax.dynamic_index_in_dim(c, s, axis=2,
                                                             keepdims=False))(cache_l, slot)
    val = jnp.where(active[:, None, None, None], new_val, old)
    return jax.vmap(lambda c, v, s: jax.lax.dynamic_update_index_in_dim(
        c, v, s, axis=2))(cache_l, val, slot)


def stream_step_multi(params: Dict[str, Any], cfg: mt.SeekerConfig, state: StreamState,
                      frame_rgb: jnp.ndarray, query_mask: jnp.ndarray,
                      active: jnp.ndarray, window: Optional[int] = None,
                      pinned_frames: int = 1
                      ) -> Tuple[StreamState, jnp.ndarray, Optional[jnp.ndarray]]:
    '''Process one frame for EVERY active example of a multi-session state.

    Same math per example as stream_step (verified bit-equal in tests/test_streaming.py),
    but state.t is (B,) and `active` (B,) bool selects which examples consume their frame:
    inactive examples' caches and t are unchanged and their outputs are garbage (callers
    discard them).

    :param frame_rgb (B, 3, H, W) float in [0, 1] (rows for inactive examples ignored).
    :param query_mask (B, 1, H, W).
    :param active (B,) bool.
    :return (new_state, mask_logits (B, C, H, W), flags (B, F) or None).
    '''
    bb = cfg.backbone_config()
    B, _, H, W = frame_rgb.shape
    p_sz, D, nh = bb.patch_size, bb.embed_dim, bb.num_heads
    gh, gw = H // p_sz, W // p_sz
    bparams = params['backbone']
    L = bb.depth
    Tmax = state.k_cache[0].shape[-2]
    t = state.t
    assert t.ndim == 1, 'stream_step_multi needs a per-example t (init_stream_multi)'

    x, pos = _embed_frame(bparams, bb, frame_rgb, query_mask, gh, gw)
    if window is None:
        time = tsf.nearest_resize_1d(bparams['time_embed'], Tmax, axis=0).astype(x.dtype)
        time_idx = jnp.minimum(t, Tmax - 1)     # host enforces capacity; clamp for safety
        slot = jnp.minimum(t, Tmax - 1)
        valid = jnp.arange(Tmax)[None, :] <= t[:, None]
    else:
        P = pinned_frames
        R = window - P
        assert Tmax == window, (Tmax, window)
        time = bparams['time_embed'].astype(x.dtype)
        time_idx = jnp.minimum(t, time.shape[0] - 1)
        slot = jnp.where(t < P, t, P + (t - P) % R)
        n_ring = jnp.clip(t + 1 - P, 0, R)
        valid = jnp.concatenate([jnp.arange(P)[None, :] <= t[:, None],
                                 jnp.arange(R)[None, :] < n_ring[:, None]], axis=1)
    if not bb.temporal_rope:
        x = x + time[time_idx][:, None, :]

    cls0 = (bparams['cls_token'].astype(x.dtype) + pos[0])[None, :].repeat(B, axis=0)
    is_first = (t == 0)

    xs, cls_carry = x, cls0
    k_new, v_new, cls_in_new = [], [], []
    for l in range(L):
        pb = jax.tree.map(lambda a: a[l], bparams['blocks'])
        cls_in = jnp.where(is_first[:, None], cls_carry, state.cls_in[l])

        y = tsf.layer_norm(xs, pb['temporal_norm1'], bb.ln_eps)
        q, k, v = _qkv_heads(pb['temporal_attn'], y)
        Bq, Nq, Dq = k.shape
        dh = Dq // nh
        k5 = k.reshape(Bq, Nq, nh, dh)
        if bb.temporal_rope:
            # Per-example rotation by each session's own absolute frame index.
            cos_t, sin_t = rope_lib.rope_tables(t.astype(jnp.float32), dh)  # (B, dh/2)
            cos_b, sin_b = cos_t[:, None, None, :], sin_t[:, None, None, :]
            q = rope_lib.apply_rope(q.reshape(Bq, Nq, nh, dh),
                                    cos_b, sin_b).reshape(Bq, Nq, Dq)
            k5 = rope_lib.apply_rope(k5, cos_b, sin_b)
        k_all = _write_slot_multi(state.k_cache[l], k5, slot, active)
        v_all = _write_slot_multi(state.v_cache[l], v.reshape(Bq, Nq, nh, dh), slot,
                                  active)
        res_t = _attend_cached(q, k_all, v_all, nh, valid)
        res_t = tsf._dense(res_t, pb['temporal_attn']['proj'])
        res_t = tsf._dense(res_t, pb['temporal_fc'])
        xt = xs + res_t

        seq = jnp.concatenate([cls_in[:, None, :], xt], axis=1)
        res_sp = tsf.attention(pb['attn'], tsf.layer_norm(seq, pb['norm1'], bb.ln_eps), nh)
        cls_from_sp = res_sp[:, 0, :]
        tokens = xt + res_sp[:, 1:, :]

        cls_mid = cls_in + cls_from_sp
        cls_out = cls_mid + tsf.mlp(pb['mlp'],
                                    tsf.layer_norm(cls_mid, pb['norm2'], bb.ln_eps))
        tokens = tokens + tsf.mlp(pb['mlp'], tsf.layer_norm(tokens, pb['norm2'], bb.ln_eps))
        xs, cls_carry = tokens, cls_out
        k_new.append(k_all)
        v_new.append(v_all)
        # Inactive examples keep their cached cls (cls_in for an inactive fresh slot is
        # garbage carry; it must not overwrite the stored value).
        cls_in_new.append(jnp.where(active[:, None], cls_in, state.cls_in[l]))
    cls_in_new = jnp.stack(cls_in_new)

    if bb.norm_embeddings:
        xs = tsf.layer_norm(xs, bparams['norm'], bb.ln_eps)

    mask, flags = _decode_frame(params, cfg, xs, gh, gw)
    new_state = StreamState(k_cache=tuple(k_new), v_cache=tuple(v_new),
                            cls_in=cls_in_new, t=jnp.where(active, t + 1, t))
    return new_state, mask, flags

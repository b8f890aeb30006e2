'''
Rotary position embeddings (RoPE) for the TEMPORAL attention axis.

Opt-in (`temporal_rope=1`, new capability over the reference): the reference encodes time
purely through learned absolute embeddings (vit.py:425-430, added to token content), which
forces windowed streaming to CLAMP time indices at the training horizon for longer videos.
Rotating q/k by their absolute frame index makes the attention logits depend only on
RELATIVE offsets (R_t q · R_s k = f(s - t)), so an infinitely long stream never leaves the
trained regime for attention — and the rotation commutes with KV caching (cache stores
rotated keys; each new query is rotated by its own absolute index, which may grow without
bound).

Half-split convention (rotate halves, not interleaved pairs): for x = [x1, x2] along the
feature dim, R_p x = [x1*cos - x2*sin, x1*sin + x2*cos] with angles p * base^(-2j/(dh)).
R_p is orthogonal; the inverse rotation (needed for gradient un-rotation in the custom
attention backwards) is R_p^T = R_{-p}.
'''

import jax.numpy as jnp

DEFAULT_BASE = 10000.0


def rope_tables(positions, dh: int, base: float = DEFAULT_BASE, dtype=jnp.float32):
    '''cos/sin tables for feature dim dh (must be even): each (len(positions), dh // 2).'''
    assert dh % 2 == 0, dh
    positions = jnp.asarray(positions, dtype)
    freqs = base ** (-jnp.arange(0, dh // 2, dtype=dtype) * 2.0 / dh)
    ang = positions[..., None] * freqs                       # (..., S, dh/2)
    return jnp.cos(ang), jnp.sin(ang)


def tables_from_positions(pos, dh: int, base: float = DEFAULT_BASE):
    '''cos/sin (..., S, dh // 2) from an f32 position array (..., S).

    TPU-kernel-safe variant of `rope_tables`: builds the frequency ladder from a >=2-D
    broadcasted_iota (Mosaic rejects 1-D iota and float-typed tpu.iota results), so it can
    run inside a Pallas kernel on a traced position operand. Used by the time-calibrated
    rope path where positions are TRUE source-frame timestamps (per example), not 0..S-1.'''
    import jax
    dh2 = dh // 2
    shape = pos.shape + (dh2,)
    j = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1).astype(jnp.float32)
    freqs = base ** (-j * 2.0 / dh)
    ang = pos[..., None].astype(jnp.float32) * freqs
    return jnp.cos(ang), jnp.sin(ang)


def packed_tables(SP: int, S: int, dh: int, base: float = DEFAULT_BASE):
    '''cos/sin (SP, dh // 2) for the Pallas packed layout: `pack` sequences of padded
    length S are concatenated along the row axis, so row r has position r % S. Built from
    2-D broadcasted_iota (TPU kernels reject 1-D iota); constant-folded at compile time.'''
    import jax
    dh2 = dh // 2
    rows = jax.lax.broadcasted_iota(jnp.int32, (SP, dh2), 0) % S
    # int32 iota + convert: Mosaic rejects float-typed tpu.iota results.
    j = jax.lax.broadcasted_iota(jnp.int32, (SP, dh2), 1).astype(jnp.float32)
    freqs = base ** (-j * 2.0 / dh)
    ang = rows.astype(jnp.float32) * freqs
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x, cos, sin, inverse: bool = False):
    '''Rotates x (..., S, dh) by position tables cos/sin (broadcastable to (S, dh/2)).
    inverse=True applies R^T (rotation by -p). Math in fp32, output in x.dtype.'''
    h = x.shape[-1] // 2
    x1 = x[..., :h].astype(jnp.float32)
    x2 = x[..., h:].astype(jnp.float32)
    c = cos.astype(jnp.float32)
    s = jnp.asarray(sin, jnp.float32)
    s = -s if inverse else s
    return jnp.concatenate([x1 * c - x2 * s, x1 * s + x2 * c], axis=-1).astype(x.dtype)

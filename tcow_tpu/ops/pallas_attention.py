'''
Fused multi-head self-attention as a Pallas TPU kernel.

One kernel per transformer-attention call fuses QKV projection -> scaled scores -> (causal)
masked softmax -> PV -> output projection, keeping every intermediate in VMEM. The divided
space-time stack runs attention over many SHORT sequences (T=30 temporal, N+1=301 spatial at
the config of record, SURVEY.md section 2.2), so a grid step processes a *group* of whole
sequences and the projection weights stay resident across the grid.

The causal variant reproduces the reference semantics exactly (tril mask, diagonal =
causal_attention - 2 for >= 3, pre-softmax fill -1e10; vit.py:88-101).

Backward: jax.custom_vjp whose bwd differentiates the numerically identical XLA
implementation (recompute-style, matching the per-block rematerialization policy used in
training).
'''

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tcow_tpu.ops import rope as rope_lib


# Module-level interpret-mode switch: tests / CPU dryruns set this True so every
# pallas_call in this file (forward, residual-forward, in-kernel backward) runs under the
# Pallas interpreter — including calls reached through the custom-VJP wiring and under
# jax.shard_map, where the per-call `interpret=` plumbing cannot reach.
INTERPRET = False


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _interp(interpret) -> bool:
    return INTERPRET if interpret is None else interpret


def _vma(*arrays):
    '''Union of the operands' varying-manual-axes: under jax.shard_map(check_vma=True)
    pallas_call outputs must declare how they vary across the manual mesh axes; outside
    shard_map this is the empty set and has no effect.'''
    out = frozenset()
    for a in arrays:
        if a is not None:
            out |= jax.typeof(a).vma
    return out


def attention_ref(x, qkv_w, qkv_b, proj_w, proj_b, num_heads: int, causal_attention: int,
                  rope: bool = False, pos=None):
    '''Reference XLA implementation over (B, S, D); the kernel must match this exactly.
    `pos` (B, S) f32: optional per-sequence rope positions (time-calibrated rope); default
    row positions 0..S-1.'''
    B, S, D = x.shape
    dh = D // num_heads
    scale = dh ** -0.5
    qkv = jnp.einsum('bsd,de->bse', x, qkv_w.astype(x.dtype)) + qkv_b.astype(x.dtype)
    qkv = qkv.reshape(B, S, 3, num_heads, dh)
    q = jnp.moveaxis(qkv[:, :, 0], 2, 1)
    k = jnp.moveaxis(qkv[:, :, 1], 2, 1)
    v = jnp.moveaxis(qkv[:, :, 2], 2, 1)
    if rope:
        if pos is None:
            cos, sin = rope_lib.rope_tables(jnp.arange(S), dh)
        else:
            cos, sin = rope_lib.rope_tables(pos, dh)      # (B, S, dh/2)
            cos, sin = cos[:, None], sin[:, None]         # broadcast over heads
        q = rope_lib.apply_rope(q, cos, sin)
        k = rope_lib.apply_rope(k, cos, sin)
    logits = jnp.einsum('bhqd,bhkd->bhqk', q, k,
                        preferred_element_type=jnp.float32) * scale
    if causal_attention > 0:
        diag = 0 if causal_attention <= 2 else causal_attention - 2
        mask = jnp.tril(jnp.ones((S, S), bool), k=diag)
        logits = jnp.where(mask, logits, jnp.float32(-1e10))
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum('bhqk,bhkd->bhqd', probs, v)
    out = jnp.moveaxis(out, 1, 2).reshape(B, S, D)
    return jnp.einsum('bsd,de->bse', out, proj_w.astype(x.dtype)) + proj_b.astype(x.dtype)


def _kernel(x_ref, qkv_w_ref, qkv_b_ref, proj_w_ref, proj_b_ref, out_ref,
            qkv_out_ref=None, probs_out_ref=None, attn_out_ref=None, cos_ref=None,
            sin_ref=None, *, num_heads: int, causal_attention: int, seq_len: int,
            pack: int, rope: bool = False):
    '''Grid cell: a group of G whole sequences. Shapes (G, S_pad, D) in VMEM.

    `pack` sequences share one score matmul with a block-diagonal mask: short sequences
    (the temporal axis, S_pad = 32) would otherwise run 30x64x30 matmuls that waste almost
    the entire 128-wide MXU tile; packing 4 makes them 128x64x128.'''
    G, S, D = x_ref.shape
    dh = D // num_heads
    scale = dh ** -0.5
    # One big (G*S, D) @ (D, 3D) GEMM: keep M large so the MXU tiles stay full.
    x = x_ref[:].reshape(G * S, D)
    qkv = jax.lax.dot_general(x, qkv_w_ref[:].astype(x.dtype),
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    qkv = (qkv + qkv_b_ref[:].astype(jnp.float32)).astype(x.dtype)
    qkv = qkv.reshape(G, S, 3 * D)

    P = pack
    SP = S * P
    # Mask over the packed (SP, SP) score tile: same-sequence block + key validity +
    # optional causal (static: seq_len is compile-time).
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (SP, SP), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (SP, SP), 1)
    mask = (row_ids // S) == (col_ids // S)                      # block diagonal
    mask = jnp.logical_and(mask, (col_ids % S) < seq_len)        # key validity
    if causal_attention > 0:
        diag = 0 if causal_attention <= 2 else causal_attention - 2
        mask = jnp.logical_and(mask, (col_ids % S) <= (row_ids % S) + diag)

    qkv_p = qkv.reshape(G // P, SP, 3 * D)
    if rope:
        # Time-calibrated tables are precomputed XLA-side and passed as (G/P, SP, dh/2)
        # inputs — building them in-kernel from a (G, S_pad) pos ref needs a
        # sublane->lane reshape that Mosaic rejects ("unsupported shape cast").
        # Without per-example positions: compile-time row positions r % S.
        rope_cs = ((cos_ref[:], sin_ref[:]) if cos_ref is not None
                   else rope_lib.packed_tables(SP, S, dh))
    else:
        rope_cs = None
    outs = []
    for h in range(num_heads):
        q = qkv_p[:, :, h * dh:(h + 1) * dh]
        k = qkv_p[:, :, D + h * dh:D + (h + 1) * dh]
        v = qkv_p[:, :, 2 * D + h * dh:2 * D + (h + 1) * dh]
        if rope:
            q = rope_lib.apply_rope(q, *rope_cs)
            k = rope_lib.apply_rope(k, *rope_cs)
        logits = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                     preferred_element_type=jnp.float32) * scale
        logits = jnp.where(mask[None], logits, jnp.float32(-1e10))
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)       # (G/P, SP, SP)
        if probs_out_ref is not None:
            probs_out_ref[:, h] = probs
        outs.append(jax.lax.dot_general(probs, v, (((2,), (1,)), ((0,), (0,))),
                                        preferred_element_type=jnp.float32)
                    .astype(x.dtype))
    attn = jnp.concatenate(outs, axis=-1).reshape(G * S, D)
    out = jax.lax.dot_general(attn, proj_w_ref[:].astype(x.dtype),
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out = (out + proj_b_ref[:].astype(jnp.float32)).astype(x.dtype)
    out_ref[:] = out.reshape(G, S, D)
    if qkv_out_ref is not None:
        qkv_out_ref[:] = qkv
    if attn_out_ref is not None:
        attn_out_ref[:] = attn.reshape(G, S, D)


def _pick_group(S_pad: int, D: int, dtype_bytes: int) -> int:
    '''Choose sequences per grid step under a ~10 MB VMEM budget (weights ~4D^2 bytes +
    activations ~ G * S_pad * 9D bytes + f32 scores G * S_pad^2 * 4).'''
    budget = 10 * 1024 * 1024 - 4 * D * D * dtype_bytes
    per_seq = S_pad * 9 * D * dtype_bytes + S_pad * S_pad * 8
    g = max(1, budget // max(per_seq, 1))
    # Keep G a power of two <= 64 for clean grids.
    p = 1
    while p * 2 <= min(g, 64):
        p *= 2
    return p


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def fused_attention(x, qkv_w, qkv_b, proj_w, proj_b, pos, num_heads: int,
                    causal_attention: int, bwd_mode: str = 'res', rope: bool = False):
    '''Fused attention over (B, S, D); differentiable. The primal (inference) call skips
    residual outputs entirely, which keeps VMEM in budget at long sequence lengths (the
    ViT-L 480x640 stretch config has S = 1201).

    `pos` (B, S) f32 or None: per-sequence rope positions (time-calibrated rope — TRUE
    source-frame timestamps instead of row indices). Only meaningful with rope=True; its
    gradient is zero (positions are coordinates, not parameters).

    bwd_mode selects the backward implementation:
      'res'        — forward kernel exports (qkv, packed probs, attn) residuals; backward
                     is explicit XLA matmul math with no recompute.
      'kernel_qkv' — forward exports qkv only (name: attn_qkv); backward is a fused Pallas
                     kernel that recomputes probs/attn in VMEM from the saved qkv. No
                     probs/attn HBM residual, ~1/3 of the residual bytes of 'res'.
      'kernel_x'   — forward exports nothing; the backward kernel recomputes qkv from x
                     in VMEM too. Zero attention residuals (x is the only saved value);
                     costs one extra qkv GEMM per call in the backward.
      'kernel_x_wg'— 'kernel_x' plus in-kernel weight-gradient accumulation: weight/bias
                     grads build up in f32 VMEM accumulator outputs across the grid and
                     dx is computed in-kernel, so the backward writes only (B, S, D) to
                     HBM instead of (B, S, 4D) + XLA-side re-reads.
    Under per-block remat, pair the kernel modes with the 'dots_nb_out'(+'_qkv') policies
    in timesformer.py so the forward kernel is never re-run in the backward pass.'''
    return _fused_attention_fwd_impl(x, qkv_w, qkv_b, proj_w, proj_b, num_heads,
                                     causal_attention, want_residuals=False,
                                     rope=rope, pos=pos)[0]


def _geometry(x, num_heads):
    B, S, D = x.shape
    sublane = 16 if x.dtype == jnp.bfloat16 else 8
    S_pad = _round_up(S, sublane)
    # Pack short sequences so score matmuls reach a 128-row MXU tile.
    pack = max(1, min(128 // S_pad, 8))
    G = _pick_group(S_pad, D, np.dtype(x.dtype).itemsize)
    G = max(pack, (G // pack) * pack)
    B_pad = _round_up(B, G)
    return B, S, D, S_pad, pack, G, B_pad


def _weight_in_specs(G, S_pad, D):
    return [
        pl.BlockSpec((G, S_pad, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((D, 3 * D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3 * D,), lambda i: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((D, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((D,), lambda i: (0,), memory_space=pltpu.VMEM),
    ]


def _fwd_vmem_limit(x, G, S_pad, pack, D):
    '''Scoped-VMEM budget for the forward kernel (both residual modes): long sequences
    need more than the 16M default for the f32 qkv/score intermediates.'''
    itemsize = np.dtype(x.dtype).itemsize
    SP = S_pad * pack
    block_bytes = (G * S_pad * (4 + 9 * itemsize) * D
                   + (G // pack) * SP * SP * (8 + 2 * itemsize)
                   + 4 * D * D * itemsize)
    return int(min(max(block_bytes * 1.5, 32 * 1024 * 1024), 120 * 1024 * 1024))


def _pad_pos(pos, B_pad, S_pad):
    '''Pads a (B, S) position array to the kernel grid; padded slots are masked anyway.'''
    if pos.shape[0] != B_pad or pos.shape[1] != S_pad:
        pos = jnp.pad(pos, ((0, B_pad - pos.shape[0]), (0, S_pad - pos.shape[1])))
    return pos.astype(jnp.float32)


def _pos_tables(pos, B_pad, S_pad, pack, dh):
    '''XLA-side cos/sin rope tables, (B_pad/pack, SP, dh/2), already in the kernel's
    packed row layout. Precomputed outside the kernel: the (G, S_pad) -> (G/pack, SP)
    reshape merges the sublane axis into lanes, which Mosaic cannot lower in-kernel
    (observed: "tpu.reshape vector<16x16xf32> -> vector<2x128x1xf32> unsupported shape
    cast" on v5e). Padded slots get position 0 -> identity rotation; they are masked.'''
    posp = _pad_pos(pos, B_pad, S_pad).reshape(B_pad // pack, S_pad * pack)
    return rope_lib.tables_from_positions(posp, dh)


def _table_in_specs(G, pack, SP, dh):
    spec = pl.BlockSpec((G // pack, SP, dh // 2), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return [spec, spec]


def _fused_attention_fwd_impl(x, qkv_w, qkv_b, proj_w, proj_b, num_heads,
                              causal_attention, interpret=None,
                              want_residuals: bool = True, rope: bool = False,
                              pos=None):
    interpret = _interp(interpret)
    B, S, D, S_pad, pack, G, B_pad = _geometry(x, num_heads)
    SP = S_pad * pack
    vma = _vma(x, qkv_w, qkv_b, proj_w, proj_b, pos)
    xp = x
    if S_pad != S or B_pad != B:
        xp = jnp.pad(x, ((0, B_pad - B), (0, S_pad - S), (0, 0)))

    inputs = [xp, qkv_w, qkv_b, proj_w, proj_b]
    in_specs = _weight_in_specs(G, S_pad, D)
    if pos is not None:
        inputs.extend(_pos_tables(pos, B_pad, S_pad, pack, D // num_heads))
        in_specs = in_specs + _table_in_specs(G, pack, SP, D // num_heads)

    kernel = functools.partial(_kernel, num_heads=num_heads,
                               causal_attention=causal_attention, seq_len=S,
                               pack=pack, rope=rope)

    def bind(out_names):
        '''Adapter: pallas passes refs positionally (inputs then outputs); _kernel wants
        the optional rope-table inputs and the optional residual outputs as keywords.'''
        def wrapped(x_ref, qw, qb, pw, pb, *rest):
            rest = list(rest)
            cos_ref = rest.pop(0) if pos is not None else None
            sin_ref = rest.pop(0) if pos is not None else None
            out_ref = rest.pop(0)
            kw = dict(zip(out_names, rest))
            kernel(x_ref, qw, qb, pw, pb, out_ref, cos_ref=cos_ref, sin_ref=sin_ref, **kw)
        return wrapped

    if want_residuals == 'qkv':
        results = pl.pallas_call(
            bind(('qkv_out_ref',)),
            out_shape=(jax.ShapeDtypeStruct((B_pad, S_pad, D), x.dtype, vma=vma),
                       jax.ShapeDtypeStruct((B_pad, S_pad, 3 * D), x.dtype, vma=vma)),
            grid=(B_pad // G,),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_fwd_vmem_limit(x, G, S_pad, pack, D)),
            in_specs=in_specs,
            out_specs=(pl.BlockSpec((G, S_pad, D), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((G, S_pad, 3 * D), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)),
            interpret=interpret,
        )(*inputs)
        out, qkv = results
        return out[:B, :S], qkv, None, None

    out_shape = [jax.ShapeDtypeStruct((B_pad, S_pad, D), x.dtype, vma=vma)]
    out_specs = [pl.BlockSpec((G, S_pad, D), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)]
    out_names = ()
    if want_residuals:
        out_shape += [
            jax.ShapeDtypeStruct((B_pad, S_pad, 3 * D), x.dtype, vma=vma),
            jax.ShapeDtypeStruct((B_pad // pack, num_heads, SP, SP), x.dtype, vma=vma),
            jax.ShapeDtypeStruct((B_pad, S_pad, D), x.dtype, vma=vma),
        ]
        out_specs += [
            pl.BlockSpec((G, S_pad, 3 * D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G // pack, num_heads, SP, SP), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, S_pad, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ]
        out_names = ('qkv_out_ref', 'probs_out_ref', 'attn_out_ref')
    results = pl.pallas_call(
        bind(out_names),
        out_shape=tuple(out_shape),
        grid=(B_pad // G,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_fwd_vmem_limit(x, G, S_pad, pack, D)),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        interpret=interpret,
    )(*inputs)
    if not want_residuals:
        return (results[0][:B, :S] if isinstance(results, (tuple, list))
                else results[:B, :S]), None, None, None
    out, qkv, probs, attn = results
    return out[:B, :S], qkv, probs, attn


def _fwd(x, qkv_w, qkv_b, proj_w, proj_b, pos, num_heads, causal_attention, bwd_mode,
         rope):
    from jax.ad_checkpoint import checkpoint_name
    if bwd_mode in ('kernel_x', 'kernel_x_wg'):
        out = _fused_attention_fwd_impl(x, qkv_w, qkv_b, proj_w, proj_b, num_heads,
                                        causal_attention, want_residuals=False,
                                        rope=rope, pos=pos)[0]
        return out, (x, qkv_w, qkv_b, proj_w, pos)
    if bwd_mode == 'kernel_qkv':
        out, qkv, _, _ = _fused_attention_fwd_impl(x, qkv_w, qkv_b, proj_w, proj_b,
                                                   num_heads, causal_attention,
                                                   want_residuals='qkv', rope=rope,
                                                   pos=pos)
        # Named so the 'dots_nb_out_qkv' remat policy can keep qkv across the per-block
        # checkpoint boundary (the fwd kernel is then never re-run in the backward).
        qkv = checkpoint_name(qkv, 'attn_qkv')
        return out, (x, qkv, qkv_w, qkv_b, proj_w, pos)
    assert bwd_mode == 'res', bwd_mode
    out, qkv, probs, attn = _fused_attention_fwd_impl(
        x, qkv_w, qkv_b, proj_w, proj_b, num_heads, causal_attention, rope=rope, pos=pos)
    # Name the residuals so a remat policy (save_only_these_names) can keep them across the
    # per-block checkpoint boundary, avoiding any attention recompute in the backward.
    qkv = checkpoint_name(qkv, 'attn_res')
    probs = checkpoint_name(probs, 'attn_res')
    attn = checkpoint_name(attn, 'attn_res')
    x_res = checkpoint_name(x, 'attn_res')
    return out, (x_res, qkv, probs, attn, qkv_w, proj_w, pos)


def _pos_grad(pos):
    '''Positions are coordinates, not parameters: zero cotangent (None stays None).'''
    return None if pos is None else jnp.zeros_like(pos)


def _bwd(num_heads, causal_attention, bwd_mode, rope, residuals, g):
    if bwd_mode in ('kernel_x', 'kernel_x_wg'):
        x, qkv_w, qkv_b, proj_w, pos = residuals
        grads = _fused_attention_bwd_impl(x, g, qkv_w, qkv_b, proj_w, None,
                                          num_heads, causal_attention, rope=rope,
                                          pos=pos,
                                          inkernel_wgrads=bwd_mode == 'kernel_x_wg')
    elif bwd_mode == 'kernel_qkv':
        x, qkv, qkv_w, qkv_b, proj_w, pos = residuals
        grads = _fused_attention_bwd_impl(x, g, qkv_w, qkv_b, proj_w, qkv,
                                          num_heads, causal_attention, rope=rope,
                                          pos=pos)
    else:
        pos = residuals[-1]
        grads = _bwd_res(num_heads, causal_attention, residuals[:-1], g, rope, pos=pos)
    return grads + (_pos_grad(pos),)


def _bwd_res(num_heads, causal_attention, residuals, g, rope: bool = False, pos=None):
    '''Explicit attention backward from saved residuals (packed layout; off-block probs are
    exactly zero, so packed matmuls produce correct per-sequence gradients). The saved qkv
    is UN-rotated; with rope the score-path gradients are computed against rotated q/k and
    un-rotated (R is orthogonal: dq = R^T dq_rot) before entering the qkv projection.'''
    x, qkv, probs, attn, qkv_w, proj_w = residuals
    B, S, D, S_pad, pack, G, B_pad = _geometry(x, num_heads)
    SP = S_pad * pack
    dh = D // num_heads
    scale = dh ** -0.5
    cdt = x.dtype

    gp = g
    if gp.shape[0] != B_pad or gp.shape[1] != S_pad:
        gp = jnp.pad(g, ((0, B_pad - B), (0, S_pad - S), (0, 0)))
    gp = gp.astype(cdt)

    g2 = gp.reshape(B_pad * S_pad, D)
    attn2 = attn.reshape(B_pad * S_pad, D)
    dproj_w = jnp.dot(attn2.T, g2, preferred_element_type=jnp.float32)
    dproj_b = jnp.sum(g2, axis=0, dtype=jnp.float32)
    dattn = jnp.dot(g2, proj_w.astype(cdt).T).reshape(B_pad // pack, SP, D)

    qkv_p = qkv.reshape(B_pad // pack, SP, 3 * D)
    if rope:
        rope_cs = (rope_lib.tables_from_positions(
                       _pad_pos(pos, B_pad, S_pad).reshape(B_pad // pack, SP), dh)
                   if pos is not None else rope_lib.packed_tables(SP, S_pad, dh))
    else:
        rope_cs = None
    dqkv = []
    for h in range(num_heads):
        q = qkv_p[:, :, h * dh:(h + 1) * dh]
        k = qkv_p[:, :, D + h * dh:D + (h + 1) * dh]
        v = qkv_p[:, :, 2 * D + h * dh:2 * D + (h + 1) * dh]
        if rope:
            q = rope_lib.apply_rope(q, *rope_cs)
            k = rope_lib.apply_rope(k, *rope_cs)
        p_h = probs[:, h]                                              # (Bp/P, SP, SP)
        da_h = dattn[:, :, h * dh:(h + 1) * dh]
        dv = jax.lax.dot_general(p_h, da_h, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32).astype(cdt)
        dp = jax.lax.dot_general(da_h, v, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)   # (Bp/P, SP, SP)
        pf = p_h.astype(jnp.float32)
        dlog = pf * (dp - jnp.sum(dp * pf, axis=-1, keepdims=True))
        dlog = (dlog * scale).astype(cdt)
        dq = jax.lax.dot_general(dlog, k, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32).astype(cdt)
        dk = jax.lax.dot_general(dlog, q, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32).astype(cdt)
        if rope:
            dq = rope_lib.apply_rope(dq, *rope_cs, inverse=True)
            dk = rope_lib.apply_rope(dk, *rope_cs, inverse=True)
        dqkv.append((dq, dk, dv))
    dqkv_full = jnp.concatenate([d for d, _, _ in dqkv] + [d for _, d, _ in dqkv]
                                + [d for _, _, d in dqkv], axis=-1)
    dqkv_full = dqkv_full.reshape(B_pad * S_pad, 3 * D)

    xp = x
    if x.shape[0] != B_pad or x.shape[1] != S_pad:
        xp = jnp.pad(x, ((0, B_pad - B), (0, S_pad - S), (0, 0)))
    x2 = xp.astype(cdt).reshape(B_pad * S_pad, D)
    dqkv_w = jnp.dot(x2.T, dqkv_full, preferred_element_type=jnp.float32)
    dqkv_b = jnp.sum(dqkv_full.astype(jnp.float32), axis=0)
    dx = jnp.dot(dqkv_full, qkv_w.astype(cdt).T).reshape(B_pad, S_pad, D)
    dx = dx[:B, :S].astype(x.dtype)
    return dx, dqkv_w, dqkv_b, dproj_w, dproj_b


fused_attention.defvjp(_fwd, _bwd)


def fused_attention_rows(x, qkv_w, qkv_b, proj_w, proj_b, pos, num_heads: int,
                         causal_attention: int, bwd_mode: str = 'res',
                         rope: bool = False, row_axes=()):
    '''Row-sharded fused attention over the flat (R, S, D) batch: the multi-chip wrap.

    The divided space-time stack runs attention over many SHORT whole sequences, so the
    computation is independent per ROW — any partition of rows is numerically exact. This
    shards the flat row axis over `row_axes` (e.g. ('data', 'seq', 'model')) with
    jax.shard_map: every shard runs the single-device fused kernel — including the
    in-kernel custom-VJP backward — on its local rows. Weights enter the manual region
    replicated (in_spec P()) and shard_map's transpose psums their cotangents across all
    row shards, which is exactly the DP/SP/TP gradient reduction.

    Row-parallelism is deliberately used for the TENSOR-parallel axis too (instead of
    head-parallel slicing): the B-major flat rows mean the (data, seq, model) row blocks
    are local slices of the incoming P(data, seq)-sharded activations (zero input comm),
    and the output gather over 'model' moves the same bytes as the head-parallel proj
    psum — while the kernel geometry, the packed masking, and the in-kernel backward stay
    byte-identical to the single-device program. The tradeoff is that the attention
    weights are broadcast into the region per call (the MLP keeps its Megatron layout,
    parallel/mesh.py tp_pspec).

    Rows are zero-padded up to a multiple of the shard count (zero rows softmax to finite
    garbage that is sliced off; the sliced outputs get zero cotangents, so no gradient
    leaks). Requires an ambient mesh (jax.set_mesh); with no mesh, no named axes, or
    all-size-1 axes this degrades to the plain single-device call.
    '''
    row_axes = tuple(a for a in row_axes if a is not None)
    mesh = jax.sharding.get_abstract_mesh()
    shards = 1
    if row_axes and mesh is not None and not mesh.empty:
        sizes = dict(mesh.shape)
        row_axes = tuple(a for a in row_axes if sizes.get(a, 1) > 1)
        for a in row_axes:
            shards *= sizes[a]
    if shards == 1:
        return fused_attention(x, qkv_w, qkv_b, proj_w, proj_b, pos, num_heads,
                               causal_attention, bwd_mode, rope)

    from jax.sharding import PartitionSpec as P
    R, S, D = x.shape
    R_pad = _round_up(R, shards)
    xp = jnp.pad(x, ((0, R_pad - R), (0, 0), (0, 0))) if R_pad != R else x
    row_spec = P(row_axes, None, None)

    if pos is not None:
        posp = jnp.pad(pos, ((0, R_pad - R), (0, 0))) if R_pad != R else pos

        def body_pos(xl, posl, qw, qb, pw, pb):
            return fused_attention(xl, qw, qb, pw, pb, posl, num_heads,
                                   causal_attention, bwd_mode, rope)

        out = jax.shard_map(body_pos, mesh=mesh,
                            in_specs=(row_spec, P(row_axes, None), P(), P(), P(), P()),
                            out_specs=row_spec, check_vma=False)(
            xp, posp, qkv_w, qkv_b, proj_w, proj_b)
    else:
        def body(xl, qw, qb, pw, pb):
            return fused_attention(xl, qw, qb, pw, pb, None, num_heads,
                                   causal_attention, bwd_mode, rope)

        out = jax.shard_map(body, mesh=mesh,
                            in_specs=(row_spec, P(), P(), P(), P()),
                            out_specs=row_spec, check_vma=False)(
            xp, qkv_w, qkv_b, proj_w, proj_b)
    return out[:R] if R_pad != R else out


# ---------------------------------------------------------------------------
# Fully in-kernel backward: recompute probs/attn in VMEM (optionally qkv too) and emit
# dqkv + attn; no probs/attn residual ever touches HBM. Weight/bias/input gradients are
# ordinary XLA dots on those outputs — kept OUT of the kernel by default (fusing f32
# weight accumulators into the XLA scan body hit scoped-vmem OOM, see NEXT.md).
# `wgrads=True` retries that differently: the weight/bias gradients accumulate in f32
# VMEM accumulator OUTPUTS (constant index maps — the blocks stay resident across the
# sequential grid) and the kernel emits dx directly, so the (B, S, 4D) dqkv/attn
# round-trip through HBM disappears entirely.
# ---------------------------------------------------------------------------

def _bwd_kernel(x_ref, g_ref, qkv_w_ref, qkv_b_ref, proj_w_ref, *rest,
                num_heads: int, causal_attention: int, seq_len: int, pack: int,
                has_qkv: bool, has_pos: bool = False, rope: bool = False,
                wgrads: bool = False):
    rest = list(rest)
    cos_ref = rest.pop(0) if has_pos else None
    sin_ref = rest.pop(0) if has_pos else None
    qkv_ref = rest.pop(0) if has_qkv else None
    if wgrads:
        dx_ref, dqkvw_ref, dqkvb_ref, dprojw_ref, dprojb_ref = rest
        dqkv_ref = attn_ref = None
    else:
        dqkv_ref, attn_ref = rest
    G, S, D = x_ref.shape
    dh = D // num_heads
    scale = dh ** -0.5
    P = pack
    SP = S * P
    cdt = x_ref.dtype

    x = x_ref[:].reshape(G * S, D)
    g = g_ref[:].reshape(G * S, D)
    if qkv_ref is not None:
        qkv = qkv_ref[:]
    else:
        qkv = jax.lax.dot_general(x, qkv_w_ref[:].astype(cdt), (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        qkv = (qkv + qkv_b_ref[:].astype(jnp.float32)).astype(cdt).reshape(G, S, 3 * D)
    qkv_p = qkv.reshape(G // P, SP, 3 * D)

    # Same packed block-diagonal + key-validity + causal mask as the forward kernel.
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (SP, SP), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (SP, SP), 1)
    mask = (row_ids // S) == (col_ids // S)
    mask = jnp.logical_and(mask, (col_ids % S) < seq_len)
    if causal_attention > 0:
        diag = 0 if causal_attention <= 2 else causal_attention - 2
        mask = jnp.logical_and(mask, (col_ids % S) <= (row_ids % S) + diag)

    dattn = jax.lax.dot_general(g, proj_w_ref[:].astype(cdt),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32).astype(cdt)
    dattn = dattn.reshape(G // P, SP, D)

    if rope:
        # Precomputed XLA-side tables (see _pos_tables) or compile-time row positions.
        rope_cs = ((cos_ref[:], sin_ref[:]) if cos_ref is not None
                   else rope_lib.packed_tables(SP, S, dh))
    else:
        rope_cs = None
    attn_parts, dq_parts, dk_parts, dv_parts = [], [], [], []
    for h in range(num_heads):
        q = qkv_p[:, :, h * dh:(h + 1) * dh]
        k = qkv_p[:, :, D + h * dh:D + (h + 1) * dh]
        v = qkv_p[:, :, 2 * D + h * dh:2 * D + (h + 1) * dh]
        if rope:
            q = rope_lib.apply_rope(q, *rope_cs)
            k = rope_lib.apply_rope(k, *rope_cs)
        logits = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                     preferred_element_type=jnp.float32) * scale
        logits = jnp.where(mask[None], logits, jnp.float32(-1e10))
        pf = jax.nn.softmax(logits, axis=-1)                          # (G/P, SP, SP) f32
        p_c = pf.astype(cdt)
        attn_parts.append(jax.lax.dot_general(p_c, v, (((2,), (1,)), ((0,), (0,))),
                                              preferred_element_type=jnp.float32)
                          .astype(cdt))
        da_h = dattn[:, :, h * dh:(h + 1) * dh]
        dv_parts.append(jax.lax.dot_general(p_c, da_h, (((1,), (1,)), ((0,), (0,))),
                                            preferred_element_type=jnp.float32)
                        .astype(cdt))
        dp = jax.lax.dot_general(da_h, v, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)  # (G/P, SP, SP) f32
        dlog = pf * (dp - jnp.sum(dp * pf, axis=-1, keepdims=True))
        dlog = (dlog * scale).astype(cdt)
        dq_h = jax.lax.dot_general(dlog, k, (((2,), (1,)), ((0,), (0,))),
                                   preferred_element_type=jnp.float32).astype(cdt)
        dk_h = jax.lax.dot_general(dlog, q, (((1,), (1,)), ((0,), (0,))),
                                   preferred_element_type=jnp.float32).astype(cdt)
        if rope:
            dq_h = rope_lib.apply_rope(dq_h, *rope_cs, inverse=True)
            dk_h = rope_lib.apply_rope(dk_h, *rope_cs, inverse=True)
        dq_parts.append(dq_h)
        dk_parts.append(dk_h)

    attn2 = jnp.concatenate(attn_parts, axis=-1).reshape(G * S, D)
    dqkv2 = jnp.concatenate(dq_parts + dk_parts + dv_parts,
                            axis=-1).reshape(G * S, 3 * D)
    if not wgrads:
        attn_ref[:] = attn2.reshape(G, S, D)
        dqkv_ref[:] = dqkv2.reshape(G, S, 3 * D)
        return

    # dx for this group + f32 weight/bias gradients accumulated across the grid. Padded
    # batch rows contribute exactly zero (g = 0 there, and dqkv = 0 since dattn = 0), so
    # the accumulators equal the XLA-side dots over the padded arrays bit-for-bit in math.
    dx = jax.lax.dot_general(dqkv2, qkv_w_ref[:].astype(cdt), (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dx_ref[:] = dx.astype(cdt).reshape(G, S, D)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dqkvw_ref[:] = jnp.zeros_like(dqkvw_ref)
        dqkvb_ref[:] = jnp.zeros_like(dqkvb_ref)
        dprojw_ref[:] = jnp.zeros_like(dprojw_ref)
        dprojb_ref[:] = jnp.zeros_like(dprojb_ref)

    gf = g  # (G*S, D), compute dtype
    dqkvw_ref[:] += jax.lax.dot_general(x, dqkv2, (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
    dqkvb_ref[:] += jnp.sum(dqkv2.astype(jnp.float32), axis=0)
    dprojw_ref[:] += jax.lax.dot_general(attn2, gf, (((0,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
    dprojb_ref[:] += jnp.sum(gf.astype(jnp.float32), axis=0)


def _fused_attention_bwd_impl(x, g, qkv_w, qkv_b, proj_w, qkv, num_heads,
                              causal_attention, interpret=None,
                              rope: bool = False, pos=None,
                              inkernel_wgrads: bool = False):
    '''Runs the in-kernel backward; qkv=None recomputes qkv from x inside the kernel.
    Returns (dx, dqkv_w, dqkv_b, dproj_w, dproj_b).

    inkernel_wgrads=True ('kernel_x_wg' mode, qkv=None only) keeps the weight/bias
    gradients inside the kernel as f32 VMEM accumulators revisited across the grid and
    emits dx directly — the (B, S, 4D) dqkv/attn HBM round-trip of the default mode is
    eliminated at the cost of ~16*D^2 bytes of resident accumulator VMEM.'''
    interpret = _interp(interpret)
    B, S, D, S_pad, pack, G, B_pad = _geometry(x, num_heads)
    SP = S_pad * pack
    vma = _vma(x, g, qkv_w, qkv_b, proj_w, qkv, pos)
    assert not (inkernel_wgrads and qkv is not None), \
        'in-kernel weight grads require the qkv-recompute (kernel_x) path'

    def pad3(a):
        if a.shape[0] != B_pad or a.shape[1] != S_pad:
            return jnp.pad(a, ((0, B_pad - a.shape[0]), (0, S_pad - a.shape[1]), (0, 0)))
        return a

    xp = pad3(x)
    gp = pad3(g.astype(x.dtype))

    inputs = [xp, gp, qkv_w, qkv_b, proj_w]
    in_specs = [
        pl.BlockSpec((G, S_pad, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((G, S_pad, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((D, 3 * D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3 * D,), lambda i: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((D, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    if pos is not None:
        inputs.extend(_pos_tables(pos, B_pad, S_pad, pack, D // num_heads))
        in_specs.extend(_table_in_specs(G, pack, SP, D // num_heads))
    if qkv is not None:
        assert qkv.shape == (B_pad, S_pad, 3 * D), (qkv.shape, (B_pad, S_pad, 3 * D))
        inputs.append(qkv)
        in_specs.append(pl.BlockSpec((G, S_pad, 3 * D), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))

    itemsize = np.dtype(x.dtype).itemsize
    block_bytes = (G * S_pad * D * itemsize * 12                    # x/g/attn/dattn + qkv/dqkv
                   + (G // pack) * SP * SP * (12 + 2 * itemsize)    # probs f32 + dp f32 + dlog
                   + 6 * D * D * itemsize)                          # resident weights
    kernel = functools.partial(_bwd_kernel, num_heads=num_heads,
                               causal_attention=causal_attention, seq_len=S, pack=pack,
                               has_qkv=qkv is not None, has_pos=pos is not None,
                               rope=rope, wgrads=inkernel_wgrads)
    if inkernel_wgrads:
        # dx per grid step + f32 accumulator outputs with constant index maps: the
        # accumulator blocks are revisited every step, so Mosaic keeps them resident in
        # VMEM and only flushes to HBM once at the end of the (sequential) grid.
        out_shape = (
            jax.ShapeDtypeStruct((B_pad, S_pad, D), x.dtype, vma=vma),      # dx
            jax.ShapeDtypeStruct((D, 3 * D), jnp.float32, vma=vma),         # dqkv_w
            jax.ShapeDtypeStruct((3 * D,), jnp.float32, vma=vma),           # dqkv_b
            jax.ShapeDtypeStruct((D, D), jnp.float32, vma=vma),             # dproj_w
            jax.ShapeDtypeStruct((D,), jnp.float32, vma=vma),               # dproj_b
        )
        out_specs = (
            pl.BlockSpec((G, S_pad, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 3 * D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * D,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda i: (0,), memory_space=pltpu.VMEM),
        )
        acc_bytes = 16 * D * D + 16 * D  # f32 accumulators resident across the grid
        vmem_limit = int(min(max((block_bytes + acc_bytes) * 1.5, 48 * 1024 * 1024),
                             124 * 1024 * 1024))
        dx, dqkv_w, dqkv_b, dproj_w, dproj_b = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid=(B_pad // G,),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
            in_specs=in_specs,
            out_specs=out_specs,
            interpret=interpret,
        )(*inputs)
        return dx[:B, :S], dqkv_w, dqkv_b, dproj_w, dproj_b

    out_shape = (
        jax.ShapeDtypeStruct((B_pad, S_pad, 3 * D), x.dtype, vma=vma),  # dqkv
        jax.ShapeDtypeStruct((B_pad, S_pad, D), x.dtype, vma=vma),  # attn (pre-projection)
    )
    out_specs = (
        pl.BlockSpec((G, S_pad, 3 * D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((G, S_pad, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    )
    vmem_limit = int(min(max(block_bytes * 1.5, 48 * 1024 * 1024), 124 * 1024 * 1024))
    dqkv, attn = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(B_pad // G,),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(*inputs)

    # Weight/bias/input gradients as ordinary XLA dots (they fuse into the surrounding
    # scan-body gradient accumulation exactly like the 'res' backward; keeping them out of
    # the kernel avoids scoped-vmem pressure from fusing f32 accumulators into that body).
    cdt = x.dtype
    g2 = gp.reshape(B_pad * S_pad, D)
    attn2 = attn.reshape(B_pad * S_pad, D)
    dproj_w = jnp.dot(attn2.T, g2, preferred_element_type=jnp.float32)
    dproj_b = jnp.sum(g2, axis=0, dtype=jnp.float32)
    dqkv2 = dqkv.reshape(B_pad * S_pad, 3 * D)
    x2 = xp.reshape(B_pad * S_pad, D)
    dqkv_w = jnp.dot(x2.T, dqkv2, preferred_element_type=jnp.float32)
    dqkv_b = jnp.sum(dqkv2.astype(jnp.float32), axis=0)
    dx = jnp.dot(dqkv2, qkv_w.astype(cdt).T).reshape(B_pad, S_pad, D)
    return dx[:B, :S].astype(cdt), dqkv_w, dqkv_b, dproj_w, dproj_b

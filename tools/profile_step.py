'''
Ablation profiler for the train/inference step on real TPU hardware.

Times the full flagship configuration and variants with parts knocked out, to attribute step
time (the axon relay breaks block_until_ready, so synchronization is via scalar fetches).

Usage: python tools/profile_step.py [--what fwd|train|ablate]
'''

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tcow_tpu.data.synthetic import synthetic_device_batch
from tcow_tpu.models import mask_tracker, timesformer as tsf
from tcow_tpu.models.mask_tracker import SeekerConfig
from tcow_tpu.objectives.losses import LossConfig
from tcow_tpu.train import optim, step as step_lib

B, Q, T, H, W, M = 1, 3, 30, 240, 320, 36


def sync_time(fn, n=8, warmup=2):
    float(fn())
    for _ in range(warmup):
        fn()
    float(fn())
    t0 = time.time()
    for _ in range(n):
        v = fn()
    float(v)
    return (time.time() - t0) / n * 1e3


def main():
    global B
    p = argparse.ArgumentParser()
    p.add_argument('--what', default='ablate')
    p.add_argument('--attention_bwd', default='kernel_x',
                   help="'res'|'kernel_qkv'|'kernel_x'|'kernel_x_wg' A/B on the real chip")
    p.add_argument('--batch', type=int, default=B)
    p.add_argument('--rope', action='store_true', help='temporal_rope variant')
    p.add_argument('--rope_coords', action='store_true',
                   help='time-calibrated rope variant (implies --rope): per-sequence '
                        'frame_times drive the rotary tables, exercising the XLA-side '
                        'table precompute + extra kernel inputs')
    args = p.parse_args()
    B = args.batch

    # Match bench.py's flagship configuration (fused pallas attention + in-kernel backward)
    # so the ablation attributes the same program the recorded numbers come from.
    seeker = SeekerConfig(num_total_frames=T, frame_height=H, frame_width=W,
                          causal_attention=1, drop_path_rate=0.1, network_depth=12,
                          compute_dtype=jnp.bfloat16, remat=True,
                          remat_policy='dots_nb_out',
                          use_pallas_attention=args.attention_bwd != 'res',
                          attention_bwd=args.attention_bwd,
                          temporal_rope=args.rope or args.rope_coords,
                          rope_time_coords=args.rope_coords)
    params = mask_tracker.init_params(jax.random.key(0), seeker)
    batch_np = synthetic_device_batch(0, B=B, Q=Q, T=T, H=H, W=W, M=M, K=8)
    batch = {k: jax.device_put(jnp.asarray(v)) for k, v in batch_np.items()}
    if args.rope_coords:
        # Strided true timestamps, one clock per example (matches the batch schema).
        batch['frame_times'] = jax.device_put(
            jnp.broadcast_to(jnp.arange(T, dtype=jnp.float32) * 2.0, (B, T)))
    rgb_q = jnp.broadcast_to(batch['rgb'][:, None], (B, Q, 3, T, H, W)).reshape(B * Q, 3, T, H, W)
    qm = jnp.zeros((B * Q, 1, T, H, W))

    if args.what in ('fwd', 'ablate'):
        fwd = jax.jit(lambda p, r, q: mask_tracker.forward(p, seeker, r, q)[0]
                      .astype(jnp.float32).sum())
        print(f'forward full       : {sync_time(lambda: fwd(params, rgb_q, qm)):.1f} ms')

    if args.what == 'ablate':
        # Knock out attentions by monkeypatching (profiling only).
        real_attention = tsf.attention

        def no_attention(p, x, num_heads, **kwargs):
            return tsf._dense(x, p['proj'])  # keep one matmul so shapes/residuals hold

        tsf.attention = no_attention
        fwd_na = jax.jit(lambda p, r, q: mask_tracker.forward(p, seeker, r, q)[0]
                         .astype(jnp.float32).sum())
        print(f'forward no-attn    : {sync_time(lambda: fwd_na(params, rgb_q, qm)):.1f} ms')
        tsf.attention = real_attention

    if args.what in ('train', 'ablate'):
        cfg = step_lib.StepConfig(seeker=seeker, loss=LossConfig(), num_queries=Q)
        tx = optim.make_optimizer('adamw', 1e-4, num_epochs=70, steps_per_epoch=1000)
        state = step_lib.init_train_state(jax.random.key(0), cfg, tx)
        ts = jax.jit(step_lib.make_train_step(cfg, tx))

        def one():
            nonlocal state
            state, aux = ts(state, batch, jnp.float32(0.1))
            return aux['total_seeker']
        print(f'train step         : {sync_time(one):.1f} ms')


def fwd_inner(p, seeker, r, q):
    return mask_tracker.forward(p, seeker, r, q)[0].astype(jnp.float32).sum()


if __name__ == '__main__':
    main()

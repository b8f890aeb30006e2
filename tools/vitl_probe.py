'''
ViT-L stretch-config TRAINING feasibility probe on one chip (VERDICT r4 task 6).

The stretch config (BASELINE.json config 5: ViT-L divided space-time, network_depth=24,
D=1024, 431M params — reference depth presets
/root/reference/third_party/TimeSformer/timesformer/models/vit.py:440-446) has a measured
INFERENCE number (1.44 clips/s at T=60 @ 480x640, BASELINE.md) and a virtual-mesh SP
training test (tests/test_stretch_config.py), but training feasibility on one 16 GB chip
was unmeasured. This tool walks a geometry ladder at the training configuration (bf16 +
per-block remat 'dots_nb_out' + fused Pallas attention 'kernel_x', AdamW — exactly
bench.py's step construction) and reports, per geometry: ms/step + clips/s, or the
compile-reported HBM OOM. grad_accum microbatching (train/step.py) is the lever that
trades step time for activation memory, so each geometry can also be probed at accum>1.

Usage (real chip):
  python tools/vitl_probe.py                      # the default ladder
  python tools/vitl_probe.py --geoms 24,1,1,30,240,320,1  # depth,B,Q,T,H,W,accum
'''

import argparse
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# --device cpu must take effect before jax import (the env pins JAX_PLATFORMS=axon).
if '--device=cpu' in sys.argv or ('--device' in sys.argv and
                                  sys.argv[sys.argv.index('--device') + 1] == 'cpu'):
    os.environ['JAX_PLATFORMS'] = 'cpu'

import jax
import jax.numpy as jnp

if os.environ.get('JAX_PLATFORMS') == 'cpu':
    jax.config.update('jax_platforms', 'cpu')

from tcow_tpu.data.synthetic import synthetic_device_batch
from tcow_tpu.models.mask_tracker import SeekerConfig
from tcow_tpu.objectives.losses import LossConfig
from tcow_tpu.train import optim, step as step_lib

# depth, B, Q, T, H, W, grad_accum — ordered small -> large so the OOM frontier is the
# last row; each entry is an independent try (a fresh jit, state donated + freed).
DEFAULT_LADDER = [
    (24, 1, 1, 30, 240, 320, 1),    # ViT-L at the flagship clip geometry
    (24, 2, 1, 30, 240, 320, 2),    # effective B=2 via microbatching
    (24, 1, 3, 30, 240, 320, 1),    # reference query count
    (24, 1, 1, 60, 240, 320, 1),    # stretch T
    (24, 1, 1, 30, 480, 640, 1),    # stretch resolution (36000 tokens)
    (24, 1, 1, 60, 480, 640, 1),    # FULL stretch config (72000 tokens)
]


def try_geom(depth, B, Q, T, H, W, accum, steps=3, policy=''):
    on_tpu = jax.default_backend() == 'tpu'   # CPU wiring test: XLA attention path
    if not policy:
        policy = 'dots_nb_out' if on_tpu else 'dots_nb'
    seeker = SeekerConfig(num_total_frames=T, frame_height=H, frame_width=W,
                          causal_attention=1, drop_path_rate=0.1, network_depth=depth,
                          compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
                          remat=True, remat_policy=policy,
                          use_pallas_attention=on_tpu,
                          attention_bwd='kernel_x' if on_tpu else 'res')
    cfg = step_lib.StepConfig(seeker=seeker, loss=LossConfig(), num_queries=Q)
    tx = optim.make_optimizer('adamw', 1e-4, num_epochs=70, steps_per_epoch=1000)
    state = jax.jit(lambda r: step_lib.init_train_state(r, cfg, tx))(jax.random.key(0))
    train_step = jax.jit(step_lib.make_train_step(cfg, tx, grad_accum=accum),
                         donate_argnums=(0,))
    batch_np = synthetic_device_batch(0, B=B, Q=Q, T=T, H=H, W=W, M=12, K=6)
    batch = {k: jax.device_put(jnp.asarray(v)) for k, v in batch_np.items()}
    t0 = time.time()
    state, aux = train_step(state, batch, jnp.float32(0.1))
    loss = float(aux['total_seeker'])   # sync: compile + step 1
    print(f'  compile+step1 {time.time() - t0:.1f}s loss={loss:.3f}', file=sys.stderr)
    for _ in range(1):
        state, aux = train_step(state, batch, jnp.float32(0.1))
    float(aux['total_seeker'])
    t0 = time.time()
    for _ in range(steps):
        state, aux = train_step(state, batch, jnp.float32(0.1))
    float(aux['total_seeker'])
    return (time.time() - t0) / steps * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--geoms', default='',
                   help='semicolon-separated depth,B,Q,T,H,W,accum tuples '
                        '(default: the built-in ladder)')
    p.add_argument('--steps', type=int, default=3)
    p.add_argument('--device', default='', help="'cpu' forces the CPU backend (wiring test)")
    a = p.parse_args()
    ladder = DEFAULT_LADDER
    if a.geoms:
        # depth,B,Q,T,H,W,accum[,remat_policy]
        ladder = [tuple(int(x) if i < 7 else x for i, x in enumerate(g.split(',')))
                  for g in a.geoms.split(';') if g]
    print(f'devices: {jax.devices()}', file=sys.stderr)
    rows = []
    for geom in ladder:
        depth, B, Q, T, H, W, accum = geom[:7]
        policy = geom[7] if len(geom) > 7 else ''
        tag = f'd{depth} B{B} Q{Q} T{T} {H}x{W} accum{accum}' + \
              (f' {policy}' if policy else '')
        tokens = T * (H // 16) * (W // 16)
        print(f'[probe] {tag} ({tokens} tokens/clip)', file=sys.stderr)
        try:
            ms = try_geom(depth, B, Q, T, H, W, accum, steps=a.steps, policy=policy)
            clips = B / (ms / 1e3)
            rows.append((tag, tokens, f'{ms:.0f} ms/step', f'{clips:.3f} clips/s'))
            print(f'[probe] {tag}: {ms:.0f} ms/step = {clips:.3f} clips/s',
                  file=sys.stderr)
        except Exception as e:
            msg = str(e).splitlines()[0][:200] if str(e) else type(e).__name__
            rows.append((tag, tokens, 'OOM/FAIL', msg))
            print(f'[probe] {tag}: FAILED: {msg}', file=sys.stderr)
            traceback.print_exc(limit=1, file=sys.stderr)
    print('\n| geometry | tokens/clip | result | detail |')
    print('|---|---|---|---|')
    for tag, tokens, r, d in rows:
        print(f'| {tag} | {tokens} | {r} | {d} |')


if __name__ == '__main__':
    main()

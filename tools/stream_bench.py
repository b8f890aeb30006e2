'''
Device-only streaming-inference throughput: chain N stream_step calls in ONE jitted
lax.scan (single host sync via a scalar fetch, per the axon-relay timing rules) and report
ms/frame for the unbounded cache and for windowed ring caches of several sizes.

This is the measurement behind BASELINE.md's "Streaming (online) inference" table and the
regression harness for the valid-slot cache-read optimization (VERDICT round-1 item 5).

Usage:  python tools/stream_bench.py [--frames 64] [--windows 30,120] [--device cpu]
'''

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--frames', type=int, default=64)
    p.add_argument('--windows', default='30,120')
    p.add_argument('--unbounded', type=int, default=1)
    p.add_argument('--height', type=int, default=240)
    p.add_argument('--width', type=int, default=320)
    p.add_argument('--depth', type=int, default=12)
    p.add_argument('--repeats', type=int, default=3)
    p.add_argument('--rope', type=int, default=0, help='temporal_rope on the bench model')
    p.add_argument('--multi', type=int, default=0,
                   help='>0: ALSO bench stream_step_multi with this many concurrent '
                        'sessions (the serving layer\'s continuous-batching step)')
    p.add_argument('--device', default='')
    a = p.parse_args()
    if a.device == 'cpu':
        os.environ['JAX_PLATFORMS'] = 'cpu'

    import jax
    import jax.numpy as jnp
    import numpy as np
    if a.device == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    from tcow_tpu.models import mask_tracker as mt
    from tcow_tpu.models import streaming

    cfg = mt.SeekerConfig(frame_height=a.height, frame_width=a.width,
                          causal_attention=1, drop_path_rate=0.0,
                          network_depth=a.depth, compute_dtype=jnp.bfloat16,
                          temporal_rope=bool(a.rope))
    params = jax.device_put(mt.init_params(jax.random.key(0), cfg))
    B, H, W, T = 1, a.height, a.width, a.frames
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.rand(T, B, 3, H, W), jnp.float32)
    queries = jnp.zeros((T, B, 1, H, W), jnp.float32).at[0, :, :, 64:128, 96:192].set(1.0)

    def chain(window):
        @jax.jit
        def run(params, frames, queries):
            def scan_body(state, ft_qt):
                ft, qt = ft_qt
                state, mask, _ = streaming.stream_step(params, cfg, state, ft, qt,
                                                       window=window)
                return state, jnp.sum(mask.astype(jnp.float32))

            if window is None:
                state = streaming.init_stream(params, cfg, B, max_frames=T)
            else:
                state = streaming.init_stream(params, cfg, B, window=window)
            _, sums = jax.lax.scan(scan_body, state, (frames, queries))
            return jnp.sum(sums)

        return run

    def measure(label, window):
        run = chain(window)
        t0 = time.time()
        s = float(run(params, frames, queries))  # compile + first run
        compile_s = time.time() - t0
        best = float('inf')
        for _ in range(a.repeats):
            t0 = time.time()
            s = float(run(params, frames, queries))
            best = min(best, time.time() - t0)
        ms = best * 1e3 / T
        print(f'{label:>14}: {ms:7.2f} ms/frame  ({1e3 / ms:6.0f} fps)   '
              f'[chain {best:.3f} s, compile {compile_s:.1f} s, checksum {s:.1f}]',
              flush=True)
        return ms

    def chain_multi(window, K):
        framesK = jnp.broadcast_to(frames, (T, K) + frames.shape[2:])
        queriesK = jnp.broadcast_to(queries, (T, K) + queries.shape[2:])
        active = jnp.ones((K,), bool)

        @jax.jit
        def run(params, framesK, queriesK):
            def scan_body(state, ft_qt):
                ft, qt = ft_qt
                state, mask, _ = streaming.stream_step_multi(
                    params, cfg, state, ft, qt, active, window=window)
                return state, jnp.sum(mask.astype(jnp.float32))

            state = streaming.init_stream_multi(params, cfg, K, max_frames=T,
                                                window=window)
            _, sums = jax.lax.scan(scan_body, state, (framesK, queriesK))
            return jnp.sum(sums)

        return run, framesK, queriesK

    def measure_multi(window, K):
        run, fK, qK = chain_multi(window, K)
        t0 = time.time()
        float(run(params, fK, qK))
        compile_s = time.time() - t0
        best = float('inf')
        for _ in range(a.repeats):
            t0 = time.time()
            float(run(params, fK, qK))
            best = min(best, time.time() - t0)
        ms = best * 1e3 / (T * K)   # per session-frame
        label = f'multi{K} w={window or 0}'
        print(f'{label:>14}: {ms:7.2f} ms/frame/session  ({1e3 / ms:6.0f} agg fps)   '
              f'[chain {best:.3f} s, compile {compile_s:.1f} s]', flush=True)
        return ms

    results = {}
    if a.unbounded:
        results['unbounded'] = measure(f'unbounded({T})', None)
    for w in [int(x) for x in a.windows.split(',') if x]:
        results[f'window{w}'] = measure(f'window={w}', w)
    if a.multi:
        for w in [int(x) for x in a.windows.split(',') if x]:
            results[f'multi{a.multi}_w{w}'] = measure_multi(w, a.multi)
    print(results)


if __name__ == '__main__':
    main()

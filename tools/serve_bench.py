'''
Aggregate-throughput benchmark for the online tracking service (tcow_tpu/serving.py).

Starts an in-process TrackerServer (random-init weights by default: throughput does not
depend on weight values), opens K concurrent client sessions, streams F frames per
session, and reports aggregate frames/sec + per-frame latency percentiles. Compares the
dedicated-step path (batch_slots=1: one B=1 device step per frame per session) against
continuous batching (batch_slots=K: all pending frames ride ONE batched step), which is
where the fixed per-step dispatch/host-sync cost stops scaling with session count.

  python tools/serve_bench.py --sessions 1,4,8 --frames 60 --window 30 [--batch_slots 8]
'''

import argparse
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_clients(host, port, n_sessions, n_frames, window, H, W, reload_at=-1):
    '''reload_at >= 0: an admin connection hot-swaps the weights once any session reaches
    that frame. A session whose track() errors (stale after the reload, non-migrating
    server) reopens and resends its query — modelling a real client losing its tracking
    state — and the error is counted in `stale_errors`.'''
    from tcow_tpu.serving import TrackerClient
    rng = np.random.RandomState(0)
    rgb = rng.randint(0, 256, size=(8, H, W, 3), dtype=np.uint8)   # cycled
    qmask = np.zeros((H, W), np.uint8)
    qmask[H // 4: H // 2, W // 4: W // 2] = 255

    lat = [[] for _ in range(n_sessions)]
    errors = []
    stale_errors = [0]
    stale_msgs = set()
    count_lock = threading.Lock()
    reload_evt = threading.Event()
    barrier = threading.Barrier(n_sessions + 1)

    def admin():
        reload_evt.wait()
        c = TrackerClient(host, port)
        c.reload('fresh')
        c.close()

    def worker(k):
        try:
            c = TrackerClient(host, port)
            c.open(window=window)
            c.track(rgb[0], query_mask=qmask)   # warm-up (compile) frame
            barrier.wait()
            for t in range(n_frames):
                if t == reload_at and k == 0:
                    reload_evt.set()
                t0 = time.time()
                try:
                    c.track(rgb[(t + 1) % len(rgb)])
                except RuntimeError as e:
                    with count_lock:
                        stale_errors[0] += 1
                        stale_msgs.add(str(e)[:120])
                    c.close()
                    c = TrackerClient(host, port)
                    c.open(window=window)
                    c.track(rgb[0], query_mask=qmask)   # tracking state lost: requery
                lat[k].append(time.time() - t0)
            c.close()
        except BaseException as e:   # noqa: BLE001
            errors.append((k, e))
            try:
                barrier.abort()
            except Exception:
                pass

    if reload_at >= 0:
        threading.Thread(target=admin, daemon=True).start()

    threads = [threading.Thread(target=worker, args=(k,)) for k in range(n_sessions)]
    for t in threads:
        t.start()
    try:
        barrier.wait()       # all sessions warmed: timed region starts here
    except threading.BrokenBarrierError:
        pass                 # a worker failed during open/warm-up; report it below
    t0 = time.time()
    for t in threads:
        t.join()
    wall = time.time() - t0
    assert not errors, errors
    all_lat = np.concatenate([np.asarray(x) for x in lat])
    return dict(sessions=n_sessions, frames_total=n_sessions * n_frames, wall_s=wall,
                agg_fps=n_sessions * n_frames / wall,
                lat_ms_p50=float(np.percentile(all_lat, 50) * 1e3),
                lat_ms_p95=float(np.percentile(all_lat, 95) * 1e3),
                lat_ms_max=float(all_lat.max() * 1e3),
                stale_errors=stale_errors[0], stale_msgs=sorted(stale_msgs))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--sessions', default='1,4,8',
                   help='comma list of concurrent session counts to sweep')
    p.add_argument('--frames', type=int, default=60, help='timed frames per session')
    p.add_argument('--window', type=int, default=30)
    p.add_argument('--batch_slots', type=int, default=0,
                   help='0 = max(sessions sweep); 1 = dedicated per-session steps')
    p.add_argument('--height', type=int, default=240)
    p.add_argument('--width', type=int, default=320)
    p.add_argument('--num_frames', type=int, default=30)
    p.add_argument('--resume', default='', help='optional checkpoint (else random init)')
    p.add_argument('--migrate', type=int, default=0,
                   help='1: migrate_sessions=True (zero-downtime reloads)')
    p.add_argument('--reload_midway', action='store_true',
                   help='hot-swap weights once a session reaches frames/2; reports '
                        'stale_errors (sessions killed; 0 with --migrate 1) and the '
                        'max latency (the migration replay spike)')
    a = p.parse_args()

    import jax
    from tcow_tpu import serving
    from tcow_tpu.models import mask_tracker as mt

    sweep = [int(s) for s in a.sessions.split(',')]
    slots = a.batch_slots or max(sweep)

    if a.resume:
        from tcow_tpu.evaluation import inference as inference_lib
        params, cfg, *_ = inference_lib.load_networks(a.resume, None)
    else:
        import dataclasses
        cfg = mt.SeekerConfig(num_total_frames=a.num_frames, frame_height=a.height,
                              frame_width=a.width, causal_attention=1,
                              drop_path_rate=0.0)
        if jax.default_backend() == 'tpu':
            cfg = dataclasses.replace(cfg, use_pallas_attention=True)
        params = mt.init_params(jax.random.key(0), cfg)

    print(f'backend={jax.default_backend()} {a.height}x{a.width} window={a.window} '
          f'batch_slots={slots} migrate={a.migrate} reload_midway={a.reload_midway}',
          file=sys.stderr)
    loader = (lambda _path: jax.tree_util.tree_map(lambda x: x, params)) \
        if a.reload_midway else None   # same values: throughput-neutral hot swap
    server = serving.TrackerServer(params, cfg, port=0, batch_slots=slots,
                                   params_loader=loader,
                                   migrate_sessions=bool(a.migrate))
    host, port = server.start()
    try:
        for n in sweep:
            r = run_clients(host, port, n, a.frames, a.window, a.height, a.width,
                            reload_at=a.frames // 2 if a.reload_midway else -1)
            occ = ''
            for g in server._groups.values():
                if g.steps:
                    occ = (f'  [steps={g.steps} avg_batch={g.frames / g.steps:.1f} '
                           f'avg_step={g.step_ms / g.steps:.0f} ms]')
                g.steps = g.frames = 0
                g.step_ms = 0.0
            extra = (f'  max={r["lat_ms_max"]:7.1f} ms  stale_errors={r["stale_errors"]}'
                     if a.reload_midway else '')
            if a.reload_midway and r['stale_msgs']:
                print('  stale error kinds: ' + ' | '.join(r['stale_msgs']),
                      file=sys.stderr)
            print(f'sessions={r["sessions"]:3d}  agg_fps={r["agg_fps"]:8.1f}  '
                  f'p50={r["lat_ms_p50"]:7.1f} ms  p95={r["lat_ms_p95"]:7.1f} ms  '
                  f'({r["frames_total"]} frames in {r["wall_s"]:.2f} s){occ}{extra}')
    finally:
        server.stop()


if __name__ == '__main__':
    main()

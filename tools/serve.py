'''
Serve online tracking over TCP (tcow_tpu/serving.py), and a demo client.

Server (loads a checkpoint, owns the device):
  python tools/serve.py --resume <name|ckpt> [--host 0.0.0.0 --port 7465]

Demo client (streams a video file through a running server, writes an overlay):
  python tools/serve.py --client --port 7465 --video demo/rollball.mp4 \
      --query demo/rollball_15_query.png --query_frame 15 --window 30 [--out serve_out.webm]

The server sustains many concurrent sessions: each connection owns an independent
device-resident KV-cache state, all sessions share one compiled step per window geometry.
'''

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_server(a):
    import jax
    from tcow_tpu.evaluation import inference as inference_lib
    from tcow_tpu.serving import TrackerServer
    from tcow_tpu.train import checkpoint as ckpt_lib
    from tcow_tpu.utils.logvis import Logger

    logger = Logger(context='serve')
    resume = a.resume
    if not os.path.isfile(resume):
        resume = ckpt_lib.resolve_resume_path(a.checkpoint_root, resume)
    params, cfg, *_ = inference_lib.load_networks(resume, logger)
    if cfg.causal_attention != 1:
        import dataclasses
        logger.warning('checkpoint is not causal_attention=1; forcing for streaming.')
        cfg = dataclasses.replace(cfg, causal_attention=1)

    def load_same_geometry(path):
        '''Loader backing the 'reload' command: the hot-swapped checkpoint must describe
        the SAME model geometry (step functions are compiled per geometry).'''
        new_params, new_cfg, *_ = inference_lib.load_networks(path, logger)
        import dataclasses
        if dataclasses.replace(new_cfg, causal_attention=1) != cfg:
            raise ValueError(f'checkpoint geometry mismatch: {new_cfg} != {cfg}')
        return new_params

    server = TrackerServer(params, cfg, host=a.host, port=a.port,
                           default_max_frames=a.max_frames or None,
                           batch_slots=a.batch_slots,
                           params_loader=load_same_geometry if a.allow_reload else None,
                           migrate_sessions=a.migrate_sessions)
    host, port = server.start()
    logger.info(f'serving {a.resume} on {host}:{port} '
                f'({cfg.frame_height}x{cfg.frame_width}, backend {jax.default_backend()}); '
                f'Ctrl-C to stop')
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        logger.info('stopping')
    finally:
        server.stop()


def run_client(a):
    import cv2
    from tcow_tpu.serving import TrackerClient
    from tcow_tpu.utils.logvis import _write_video

    client = TrackerClient(a.host, a.port)
    meta = client.open(window=a.window)
    H, W = meta['height'], meta['width']

    cap = cv2.VideoCapture(a.video)
    assert cap.isOpened(), a.video
    qmask_img = cv2.imread(a.query, cv2.IMREAD_GRAYSCALE)
    assert qmask_img is not None, a.query

    frames_out, lat = [], []
    idx = -1
    while True:
        ok, bgr = cap.read()
        if not ok:
            break
        idx += 1
        if idx < a.query_frame:
            continue
        if a.client_frames > 0 and len(frames_out) >= a.client_frames:
            break
        rgb = cv2.resize(bgr[..., ::-1], (W, H)).astype(np.uint8)
        q = None
        if idx == a.query_frame:
            q = cv2.resize(qmask_img, (W, H), interpolation=cv2.INTER_NEAREST) > 127
        t0 = time.time()
        mask_logits, flags, t = client.track(rgb, query_mask=q)
        lat.append(time.time() - t0)
        mask = 1.0 / (1.0 + np.exp(-mask_logits.astype(np.float32)))
        vis = rgb.astype(np.float32) / 255.0 * 0.6
        vis[..., 1] += mask[0] * 0.5
        if mask.shape[0] >= 2:
            vis[..., 0] += mask[1] * 0.5
        if mask.shape[0] >= 3:
            vis[..., 2] += mask[2] * 0.5
        frames_out.append((np.clip(vis, 0, 1) * 255).astype(np.uint8))
    cap.release()
    print(client.stats())
    client.close()

    out_fp = _write_video(a.out, np.stack(frames_out), fps=12)
    print(f'wrote {len(frames_out)} overlay frames to {out_fp}; median round-trip '
          f'{np.median(lat[1:]) * 1e3:.1f} ms/frame')


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--client', action='store_true', help='run the demo client instead')
    p.add_argument('--host', default='127.0.0.1')
    p.add_argument('--port', type=int, default=7465)
    # server args
    p.add_argument('--resume', default='', help='checkpoint name or path (server)')
    p.add_argument('--checkpoint_root', default='checkpoints/')
    p.add_argument('--max_frames', type=int, default=0,
                   help='cache slots for unbounded (window=0) sessions')
    p.add_argument('--migrate_sessions', action='store_true',
                   help='zero-downtime weight reloads: live sessions are transparently '
                        'rebuilt (retained-frame replay) instead of erroring with reopen')
    p.add_argument('--allow_reload', action='store_true',
                   help='enable the "reload" command (checkpoint hot-swap)')
    p.add_argument('--batch_slots', type=int, default=1,
                   help='>1: continuous batching — same-geometry sessions share one '
                        'batched device step (higher aggregate throughput)')
    # client args
    p.add_argument('--video', default='demo/rollball.mp4')
    p.add_argument('--query', default='demo/rollball_15_query.png')
    p.add_argument('--query_frame', type=int, default=15)
    p.add_argument('--window', type=int, default=30,
                   help='0 = unbounded (exact, bounded length); >0 = windowed any-length')
    p.add_argument('--client_frames', type=int, default=0,
                   help='stop the demo client after this many frames (0 = whole video)')
    p.add_argument('--out', default='serve_out.webm')
    p.add_argument('--device', default='',
                   help="'cpu' forces the CPU backend (debugging; the env pins the TPU)")
    a = p.parse_args()
    if a.device == 'cpu':
        os.environ['JAX_PLATFORMS'] = 'cpu'
        import jax
        jax.config.update('jax_platforms', 'cpu')
    if a.client:
        run_client(a)
    else:
        assert a.resume, '--resume is required for the server'
        run_server(a)


if __name__ == '__main__':
    main()

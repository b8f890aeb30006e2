'''
Online tracking demo: run the STREAMING seeker over a video frame-by-frame (causal KV-cached
inference, tcow_tpu/models/streaming.py) and write the hierarchical mask overlay.

Usage:
  python tools/stream_demo.py --resume <name|ckpt> --video demo/rollball.mp4 \
      --query demo/rollball_15_query.png --query_frame 15 [--out stream_out.webm]

The query frame is fed when reached; every subsequent frame is processed online with O(1)
latency — something the offline reference (fixed-T clips) cannot do.
'''

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--resume', required=True)
    p.add_argument('--video', required=True)
    p.add_argument('--query', required=True, help='query mask png')
    p.add_argument('--query_frame', type=int, required=True)
    p.add_argument('--max_frames', type=int, default=-1,
                   help='frames to process after the query frame; -1 = model capacity '
                        '(or the whole video with --window)')
    p.add_argument('--window', type=int, default=0,
                   help='>0: windowed KV cache (pinned query frame + ring of window-1 '
                        'recent frames) -> videos of ANY length at O(window) memory')
    p.add_argument('--out', default='stream_out.webm')
    p.add_argument('--checkpoint_root', default='checkpoints/')
    p.add_argument('--device', default='')
    a = p.parse_args()
    if a.device == 'cpu':
        os.environ['JAX_PLATFORMS'] = 'cpu'
        import jax
        jax.config.update('jax_platforms', 'cpu')

    import cv2
    import jax
    import jax.numpy as jnp
    from tcow_tpu.evaluation import inference as inference_lib
    from tcow_tpu.models import streaming
    from tcow_tpu.train import checkpoint as ckpt_lib
    from tcow_tpu.utils import visualization
    from tcow_tpu.utils.logvis import Logger, _write_video

    logger = Logger(context='stream_demo')
    resume = a.resume
    if not os.path.isfile(resume):
        resume = ckpt_lib.resolve_resume_path(a.checkpoint_root, resume)
    params, cfg, *_ = inference_lib.load_networks(resume, logger)
    params = jax.device_put(params)  # keep params device-resident across frames
    import dataclasses
    if cfg.causal_attention != 1:
        logger.warning('checkpoint is not causal_attention=1; streaming semantics require '
                       'it — forcing (outputs will differ from offline eval).')
        cfg = dataclasses.replace(cfg, causal_attention=1)
    H, W = cfg.frame_height, cfg.frame_width

    cap = cv2.VideoCapture(a.video)
    assert cap.isOpened(), a.video
    qmask_img = cv2.imread(a.query, cv2.IMREAD_GRAYSCALE)

    if a.window > 0:
        T = a.max_frames if a.max_frames > 0 else 10 ** 9  # bounded by the video length
        state = streaming.init_stream(params, cfg, batch_size=1, window=a.window)
        step = jax.jit(lambda p, s, f, q: streaming.stream_step(
            p, cfg, s, f, q, window=a.window), donate_argnums=(1,))
    else:
        T = cfg.num_total_frames if a.max_frames < 0 else a.max_frames
        state = streaming.init_stream(params, cfg, batch_size=1, max_frames=T)
        step = jax.jit(lambda p, s, f, q: streaming.stream_step(p, cfg, s, f, q),
                       donate_argnums=(1,))

    frames_out = []
    t_model = 0
    idx = -1
    lat = []
    while t_model < T:
        ok, bgr = cap.read()
        if not ok:
            break
        idx += 1
        if idx < a.query_frame:
            continue  # streaming starts at the query frame (query at position 0)
        rgb = cv2.resize(bgr[..., ::-1], (W, H)).astype(np.float32) / 255.0
        if idx == a.query_frame:
            q = (cv2.resize(qmask_img, (W, H), interpolation=cv2.INTER_NEAREST) > 127)
            q = q.astype(np.float32)[None, None]
        else:
            q = np.zeros((1, 1, H, W), np.float32)
        t0 = time.time()
        state, mask_logits, flags = step(params, state,
                                         jnp.asarray(rgb.transpose(2, 0, 1)[None]), q)
        mask = 1.0 / (1.0 + np.exp(-np.asarray(mask_logits[0])))  # (C, H, W)
        lat.append(time.time() - t0)
        vis = rgb * 0.6
        vis[..., 1] += mask[0] * 0.5
        if mask.shape[0] >= 2:
            vis[..., 0] += mask[1] * 0.5
        if mask.shape[0] >= 3:
            vis[..., 2] += mask[2] * 0.5
        frames_out.append((np.clip(vis, 0, 1) * 255).astype(np.uint8))
        t_model += 1
    cap.release()

    out_fp = _write_video(a.out, np.stack(frames_out), fps=12)
    logger.info(f'Wrote {len(frames_out)} overlay frames to {out_fp}; '
                f'median latency {np.median(lat[1:]) * 1e3:.1f} ms/frame '
                f'({1.0 / np.median(lat[1:]):.0f} fps)')


if __name__ == '__main__':
    main()

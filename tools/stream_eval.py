'''
Far-horizon streaming QUALITY evaluation (VERDICT r3 task 7).

Scores windowed streaming inference (tcow_tpu/models/streaming.py) against the offline
joint clip protocol on LONG kubric-format videos (e.g. 160 frames, >5x the trained
horizon) with ground-truth amodal masks — so the six reference metric families
(/root/reference/eval/metrics.py:86-103) can be reported per inference mode AND per
horizon bucket (within the trained horizon / 1-4x past it / beyond). The query is the
scene's snitch (instance 0, tcow_tpu/data/synthetic._apply_rich_events) at frame 0.

Usage:
  python tools/stream_eval.py --resume rich256 --checkpoint_root /tmp/rich_ckpt \
      --data_path /tmp/kubrich_long8 --num_frames 160 --windows 30,120 [--joint 1]

Prints one aggregate table (weighted means = global sum/count, the reference's primary
aggregation) and writes <out> (JSON) with per-variant, per-bucket numbers.
'''

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--resume', required=True)
    p.add_argument('--checkpoint_root', default='checkpoints/')
    p.add_argument('--data_path', required=True)
    p.add_argument('--num_frames', type=int, default=160)
    p.add_argument('--windows', default='30,120',
                   help='comma-separated streaming window sizes; 0 = unbounded cache')
    p.add_argument('--joint', type=int, default=1,
                   help='also run the offline joint forward over the full video '
                        '(time embedding nearest-resized to T, timesformer.py:752)')
    p.add_argument('--buckets', default='30,120',
                   help='horizon bucket boundaries (frames); metrics reported per bucket')
    p.add_argument('--max_scenes', type=int, default=0)
    p.add_argument('--out', default='/tmp/stream_eval.json')
    p.add_argument('--device', default='')
    a = p.parse_args()
    if a.device == 'cpu':
        os.environ['JAX_PLATFORMS'] = 'cpu'
        import jax
        jax.config.update('jax_platforms', 'cpu')

    import dataclasses
    import jax
    import jax.numpy as jnp
    from tcow_tpu.data import data_utils
    from tcow_tpu.data.kubric import KubricQueryDataset
    from tcow_tpu.evaluation import inference as inference_lib
    from tcow_tpu.models import mask_tracker, streaming
    from tcow_tpu.objectives import metrics as metrics_lib
    from tcow_tpu.objectives import supervision
    from tcow_tpu.train import checkpoint as ckpt_lib
    from tcow_tpu.utils.logvis import Logger

    logger = Logger(context='stream_eval')
    resume = a.resume
    if not os.path.isfile(resume):
        resume = ckpt_lib.resolve_resume_path(a.checkpoint_root, resume)
    params, cfg, *_ = inference_lib.load_networks(resume, logger)
    assert cfg.causal_attention == 1, 'streaming requires a causal checkpoint'
    params = jax.device_put(params)
    H, W = cfg.frame_height, cfg.frame_width
    T = a.num_frames
    M = 12

    ds = KubricQueryDataset(a.data_path, logger, 'test', num_frames=T, max_delay=0,
                            frame_height=H, frame_width=W, num_queries=1, max_objects=M,
                            augs_2d=False, device_color_jitter=False)
    n_scenes = len(ds) if a.max_scenes <= 0 else min(a.max_scenes, len(ds))
    windows = [int(w) for w in a.windows.split(',') if w != '']
    bucket_edges = [0] + [int(b) for b in a.buckets.split(',') if b != ''] + [T]
    buckets = list(zip(bucket_edges[:-1], bucket_edges[1:]))

    sup_fn = jax.jit(lambda segm, div, of, dag: supervision.fill_query_target_batch(
        segm, div, jnp.zeros((1, 1), jnp.int32), jnp.int32(0), of, dag))
    sums_fn = jax.jit(metrics_lib.mask_track_metric_sums)

    # Per-variant jitted streaming step (one compile per window size).
    step_fns = {}
    for w in windows:
        if w == 0:
            step_fns[w] = jax.jit(
                lambda p, s, f, q: streaming.stream_step(p, cfg, s, f, q),
                donate_argnums=(1,))
        else:
            step_fns[w] = jax.jit(
                (lambda _w: lambda p, s, f, q: streaming.stream_step(
                    p, cfg, s, f, q, window=_w))(w),
                donate_argnums=(1,))
    joint_cfg = dataclasses.replace(cfg, num_total_frames=T)
    joint_fn = jax.jit(lambda p, rgb, q: mask_tracker.forward(p, joint_cfg, rgb, q,
                                                              train=False, rng=None))

    agg = {}   # variant -> bucket -> summed metric dict
    lat = {w: [] for w in windows}
    for idx in range(n_scenes):
        item = ds[idx]
        rgb = np.asarray(item['rgb'], np.float32)                    # (3, T, H, W)
        if rgb.dtype == np.uint8:
            rgb = rgb.astype(np.float32) / 255.0
        div_pad, _ = data_utils.pad_div(item['div_segm'], [0], M)    # (M, T, H, W)
        sup = sup_fn(jnp.asarray(item['segm'])[None],
                     jnp.asarray(div_pad)[None],
                     jnp.asarray(item['occl_fracs'])[None],
                     jnp.asarray(item['occl_cont_dag'])[None])
        target = np.asarray(sup['target_mask'])                      # (1, 1, 3, T, H, W)
        qmask = np.asarray(sup['seeker_query_mask'])[0, 0]           # (1, T, H, W)
        occ = int((target[0, 0, 1] > 0.5).any(axis=(-2, -1)).sum())
        con = int((target[0, 0, 2] > 0.5).any(axis=(-2, -1)).sum())
        logger.info(f'scene {idx}: {occ} occluded / {con} contained frames of {T}')

        outputs = {}
        for w in windows:
            state = streaming.init_stream(params, cfg, batch_size=1,
                                          window=(w if w > 0 else None),
                                          max_frames=(None if w > 0 else T))
            masks = []
            for t in range(T):
                f = jnp.asarray(rgb[:, t][None])
                q = jnp.asarray(qmask[:, t][None])          # (1, 1, H, W)
                t0 = time.time()
                state, mask_logits, _ = step_fns[w](params, state, f, q)
                masks.append(np.asarray(mask_logits[0]))
                lat[w].append(time.time() - t0)
            outputs[f'stream_w{w or "inf"}'] = np.stack(masks, axis=1)[None, None]
        if a.joint:
            out_mask, _ = joint_fn(params, jnp.asarray(rgb[None]),
                                   jnp.asarray(qmask[None]))
            outputs['joint'] = np.asarray(out_mask)[:, None]         # (1, 1, C, T, H, W)

        for name, out in outputs.items():
            for (b0, b1) in buckets:
                s = sums_fn(jnp.asarray(out[:, :, :, b0:b1]),
                            jnp.asarray(target[:, :, :, b0:b1]))
                dst = agg.setdefault(name, {}).setdefault(f'{b0}-{b1}', {})
                for k, v in s.items():
                    dst[k] = dst.get(k, 0.0) + float(v)

    results = {}
    for name, per_bucket in agg.items():
        results[name] = {}
        total = {}
        for bucket, s in per_bucket.items():
            results[name][bucket] = metrics_lib.finalize_metric_sums(
                {k: np.float32(v) for k, v in s.items()})
            for k, v in s.items():
                total[k] = total.get(k, 0.0) + v
        results[name]['all'] = metrics_lib.finalize_metric_sums(
            {k: np.float32(v) for k, v in total.items()})
    for w in windows:
        if len(lat[w]) > 1:
            results[f'latency_ms_w{w or "inf"}'] = float(
                np.median(lat[w][1:]) * 1e3)

    with open(a.out, 'w') as f:
        json.dump(results, f, indent=1)
    keys = ['mean_snitch_iou', 'mean_snitch_during_vis_iou', 'mean_snitch_during_occl_iou',
            'mean_snitch_during_cont_iou', 'mean_occl_mask_iou', 'mean_cont_mask_iou']
    hdr = 'variant/bucket'.ljust(24) + ' '.join(k.replace('mean_', '')[:16].rjust(17)
                                                for k in keys)
    logger.info(hdr)
    for name in sorted(agg.keys()):
        for bucket in list(results[name].keys()):
            row = results[name][bucket]
            if not isinstance(row, dict):
                continue
            logger.info(f'{name}/{bucket}'.ljust(24) + ' '.join(
                (f'{row[k]:.3f}' if row.get(k, -1.0) >= 0 else 'n/a').rjust(17)
                for k in keys))
    logger.info(f'wrote {a.out}')


if __name__ == '__main__':
    main()

'''
Evaluation metrics as on-device masked reductions.

Reimplements /root/reference/eval/metrics.py:9-163: binary IoU (output logit > 0 vs target >
0.5) per (batch, query, frame) for six families:
  snitch / occl_mask / cont_mask IoU, and snitch IoU during {visible, occluded, contained}.
Frames with empty (or negative = unannotated) targets are excluded from the counts; each
family reports a (mean, count) pair, mean = -1.0 when count == 0.

The reference's python triple loop (metrics.py:51-82) becomes vectorized masked sums; weighted
averaging across batches (metrics.py:116-139) is then exact aggregation of (sum, count).
'''

from typing import Dict, List

import jax.numpy as jnp
import numpy as np

METRIC_KEYS = ('snitch_iou', 'occl_mask_iou', 'cont_mask_iou',
               'snitch_during_vis_iou', 'snitch_during_occl_iou', 'snitch_during_cont_iou')


def mask_track_metric_sums(output_mask, target_mask) -> Dict[str, jnp.ndarray]:
    '''
    :param output_mask (B, Q, Co, T, H, W) logits, Co in {1, 3}.
    :param target_mask (B, Q, Ct, T, H, W), Ct in {1, 3}; negative values mark unannotated.
    :return dict mapping 'sum_<k>' / 'count_<k>' to f32 scalars.
    '''
    out_b = output_mask > 0.0
    tgt_b = target_mask > 0.5
    out_b, tgt_b = jnp.broadcast_arrays(out_b, tgt_b)
    Ct = target_mask.shape[2]

    inter = jnp.logical_and(out_b, tgt_b).sum(axis=(-2, -1)).astype(jnp.float32)  # (B,Q,C,T)
    union = jnp.logical_or(out_b, tgt_b).sum(axis=(-2, -1)).astype(jnp.float32)
    area = tgt_b.sum(axis=(-2, -1)).astype(jnp.float32)
    iou = inter / (union + 1e-7)

    has = area > 0  # (B, Q, C, T)
    sums, counts = {}, {}

    def family(name, valid, values):
        sums[f'sum_{name}'] = jnp.sum(jnp.where(valid, values, 0.0))
        counts[f'count_{name}'] = jnp.sum(valid).astype(jnp.float32)

    family('snitch_iou', has[:, :, 0], iou[:, :, 0])
    if Ct >= 2:
        family('occl_mask_iou', has[:, :, 1], iou[:, :, 1])
        family('snitch_during_vis_iou',
               jnp.logical_and(has[:, :, 0], ~has[:, :, 1]), iou[:, :, 0])
        family('snitch_during_occl_iou',
               jnp.logical_and(has[:, :, 0], has[:, :, 1]), iou[:, :, 0])
    else:
        family('occl_mask_iou', jnp.zeros_like(has[:, :, 0]), iou[:, :, 0])
        family('snitch_during_vis_iou', jnp.zeros_like(has[:, :, 0]), iou[:, :, 0])
        family('snitch_during_occl_iou', jnp.zeros_like(has[:, :, 0]), iou[:, :, 0])
    if Ct >= 3:
        family('cont_mask_iou', has[:, :, 2], iou[:, :, 2])
        family('snitch_during_cont_iou',
               jnp.logical_and(has[:, :, 0], has[:, :, 2]), iou[:, :, 0])
    else:
        family('cont_mask_iou', jnp.zeros_like(has[:, :, 0]), iou[:, :, 0])
        family('snitch_during_cont_iou', jnp.zeros_like(has[:, :, 0]), iou[:, :, 0])

    sums.update(counts)
    return sums


def finalize_metric_sums(sums: Dict[str, np.ndarray]) -> Dict[str, float]:
    '''(sum, count) pairs -> the reference's metrics_retval schema of mean_*/count_* values
    (mean = -1.0 when count == 0, metrics.py:86-103).'''
    out = {}
    for k in METRIC_KEYS:
        count = float(np.asarray(sums[f'count_{k}']))
        total = float(np.asarray(sums[f'sum_{k}']))
        out[f'mean_{k}'] = total / (count + 1e-7) if count > 0 else -1.0
        out[f'count_{k}'] = int(round(count))
    return out


def calculate_metrics_mask_track(output_mask, target_mask) -> Dict[str, float]:
    '''Convenience wrapper returning the reference-format dict for one batch.'''
    return finalize_metric_sums(mask_track_metric_sums(output_mask, target_mask))


def calculate_weighted_averages(metrics_retvals: List[Dict[str, float]]) -> Dict[str, float]:
    '''Frame-weighted aggregation across batches (metrics.py:116-139).'''
    final = {}
    for k in METRIC_KEYS:
        counts = np.array([m[f'count_{k}'] for m in metrics_retvals], dtype=np.float64)
        means = np.array([m[f'mean_{k}'] for m in metrics_retvals], dtype=np.float64)
        new_count = counts.sum()
        final[f'count_{k}'] = new_count
        final[f'mean_{k}'] = float((means * counts).sum() / (new_count + 1e-7)) \
            if new_count > 0 else -1.0
    return final


def calculate_unweighted_averages(metrics_retvals: List[Dict[str, float]],
                                  exclude_value: float = -1.0) -> Dict[str, float]:
    '''Per-scene aggregation ignoring invalid entries (metrics.py:142-163).'''
    final = {}
    for k in METRIC_KEYS:
        values = np.array([m[f'mean_{k}'] for m in metrics_retvals], dtype=np.float64)
        filtered = values[values != exclude_value]
        final[f'count_{k}'] = len(filtered)
        final[f'mean_{k}'] = float(filtered.mean()) if len(filtered) > 0 else float('nan')
    return final

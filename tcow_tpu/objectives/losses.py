'''
Objective functions for hierarchical mask tracking, as pure jit-friendly tensor functions.

Reimplements the semantics of /root/reference/loss.py:13-421 with masked reductions instead of
boolean indexing (XLA needs static shapes):

  - weighted BCE (or focal) per pixel, with frame weights (occlusion-scaled, query-frame
    discount; loss.py:55-81) x pixel weights (class balancing, occluded-snitch doubling, hard
    negatives; loss.py:83-148),
  - AOT-style bootstrapped BCE: mean of the top-k pixel losses with
    k = floor(topk_frac * numel), topk_frac = clip(1 - progress * 8.5, 0.15, 1.0)
    (loss.py:191-199); computed here with a fixed-iteration threshold bisection instead of a
    full sort (exact up to float-interval convergence, far cheaper on TPU),
  - soft Jaccard / Tversky(alpha=beta=1, eps=0.1) (loss.py:20-32),
  - per-channel gating of occluder/container losses with a small always-on zero-weight
    (loss.py:282-313),
  - total = track * track_lw + occl * occl_mask_lw + cont * cont_mask_lw (loss.py:367-369).

Known intentional deviations from the reference (documented; both favor correctness):
  - loss.py:79 applies the query-frame 0.2x discount only to the LAST batch element (the
    statement sits outside the `for b` loop); we apply it to every example. Identical for the
    config of record (1 example per device).
  - class-balancing fractions (loss.py:101-108) are computed over whatever batch the function
    sees; under data parallelism the caller may psum them globally (SURVEY.md section 7.4).
'''

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LossConfig:
    track_lw: float = 1.0
    occl_mask_lw: float = 0.5
    cont_mask_lw: float = 0.5
    occluded_weight: float = 5.0
    occl_cont_zero_weight: float = 0.02
    class_balancing: bool = True
    focal_loss: bool = False
    aot_loss: float = 0.8
    hard_negative_factor: float = 3.0
    front_occl_thres: float = 0.95
    outer_cont_thres: float = 0.75
    # Reference-exact compatibility: loss.py:78 down-weights the query frame with a STALE
    # loop variable (`frame_weights[b, :, query_time]` after the b-loop ends), so only the
    # LAST example in the (sub)batch is affected. Under the reference's DataParallel config
    # every GPU shard has B=1, making the bug invisible there — so this package's default
    # (all examples down-weighted) matches the reference's effective per-device behavior.
    # Set True only to reproduce the reference's unsharded-batch output bit-for-bit
    # (tests/test_pipeline_parity.py).
    qt_downweight_last_only: bool = False


def bce_with_logits(logits, targets):
    '''Numerically stable elementwise BCEWithLogits.'''
    return jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def sigmoid_focal_loss(logits, targets, alpha: float = 0.25, gamma: float = 2.0):
    '''torchvision.ops.sigmoid_focal_loss semantics (reduction=none).'''
    p = jax.nn.sigmoid(logits)
    ce = bce_with_logits(logits, targets)
    p_t = p * targets + (1.0 - p) * (1.0 - targets)
    loss = ce * (1.0 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
        loss = alpha_t * loss
    return loss


def topk_mean_masked(values, mask, k, num_iters: int = 48):
    '''Mean of the k largest `values` where mask is True, with k a traced integer >= 1.

    Exact top-k selection via threshold bisection: f(t) = #(values > t) is monotone, so after
    `num_iters` halvings the bracket [lo, hi] is at float resolution; ties at the threshold
    contribute at value ~= hi. Matches sort-then-slice to ~1e-6 relative.
    '''
    big = jnp.float32(3.4e38)
    vm = jnp.where(mask, values, -big)
    lo = jnp.min(jnp.where(mask, values, big))
    hi = jnp.max(vm)
    k = jnp.maximum(k, 1)

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum(vm > mid)
        too_many = cnt > k
        return jnp.where(too_many, mid, lo), jnp.where(too_many, hi, mid)

    lo, hi = jax.lax.fori_loop(0, num_iters, body, (lo, hi))
    above = vm > hi
    cnt_above = jnp.sum(above)
    sum_above = jnp.sum(jnp.where(above, vm, 0.0))
    total = sum_above + (k - cnt_above) * hi
    return total / k


def tversky_loss(logits, target, sel, alpha=1.0, beta=1.0, eps=0.1):
    '''Soft Jaccard over the selected elements (loss.py:20-32). `sel` is a broadcastable
    boolean selection mask; the reference's `target.mean() >= 1e-6` guard is evaluated over
    the selected subset.'''
    sel_f = sel.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(sel_f), 1.0)
    t_mean = jnp.sum(target * sel_f) / n
    p0 = jax.nn.sigmoid(logits)
    numer = jnp.sum(p0 * target * sel_f)
    denom = numer + alpha * jnp.sum(p0 * (1.0 - target) * sel_f) \
        + beta * jnp.sum((1.0 - p0) * target * sel_f)
    loss = 1.0 - numer / (denom + eps)
    return jnp.where(t_mean >= 1e-6, loss, 0.0)


def mask_track_frame_weights(sel_occl_fracs, query_time, cfg: LossConfig):
    '''(B, Q, T, 3) occl fracs -> (B, Q, T) frame weights (loss.py:55-81).'''
    w = sel_occl_fracs[..., 0] * cfg.occluded_weight
    w = jnp.clip(w, min=1.0)
    B, _, T = w.shape
    is_qt = (jnp.arange(T) == query_time)  # query_time may be traced
    if cfg.qt_downweight_last_only and B > 1:
        # Reference-exact: loss.py:78's stale-variable indexing hits example B-1 only.
        is_qt = is_qt & (jnp.arange(B) == B - 1)[:, None, None]
    return jnp.where(is_qt, w * 0.2, w)


def _dilate_binary(mask, band: int):
    '''(..., H, W) binary dilation with a band x band square structuring element; exactly
    equivalent to the reference's gaussian_blur(...) > 0 enlargement (loss.py:136-144, since
    the truncated Gaussian kernel is strictly positive and blur uses reflect padding).'''
    *lead, H, W = mask.shape
    x = mask.reshape(-1, H, W).astype(jnp.float32)
    y = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                              window_dimensions=(1, band, band),
                              window_strides=(1, 1, 1), padding='SAME')
    return (y > 0.0).reshape(*lead, H, W)


def mask_track_pixel_weights(target_mask, snitch_occl_by_ptr, cfg: LossConfig,
                             no_hard_negatives: bool = False,
                             balance_axis_name: Optional[str] = None):
    '''(B, Q, T, H, W) target + occluder-pointer maps -> pixel weights (loss.py:83-148).

    :param balance_axis_name if set, pos/neg fractions are psum'd over this mesh axis so the
        class balancing matches the global-batch math under data parallelism.
    '''
    B, Q, T, H, W = target_mask.shape
    w = jnp.ones(target_mask.shape, jnp.float32)

    if cfg.class_balancing:
        pos_mask = (target_mask == 1.0)
        neg_mask = (target_mask == 0.0)
        pos_cnt = jnp.sum(pos_mask, dtype=jnp.float32)
        neg_cnt = jnp.sum(neg_mask, dtype=jnp.float32)
        numel = jnp.float32(target_mask.size)
        if balance_axis_name is not None:
            pos_cnt = jax.lax.psum(pos_cnt, balance_axis_name)
            neg_cnt = jax.lax.psum(neg_cnt, balance_axis_name)
            numel = jax.lax.psum(numel, balance_axis_name)
        pos_frac = jnp.clip(pos_cnt / numel, min=0.05)
        neg_frac = jnp.clip(neg_cnt / numel, min=0.05)
        ratio = jnp.minimum(pos_frac, neg_frac) / jnp.maximum(pos_frac, neg_frac)
        # smaller class gets ratio**-0.3 (boost), larger gets ratio**0.7 (damp): loss.py:113-124
        boost = ratio ** -0.3
        damp = ratio ** 0.7
        pos_is_minority = pos_frac <= neg_frac
        pos_corr = jnp.where(pos_is_minority, boost, damp)
        neg_corr = jnp.where(pos_is_minority, damp, boost)
        w = w * jnp.where(neg_mask, neg_corr, 1.0) * jnp.where(pos_mask, pos_corr, 1.0)

    w = jnp.where(snitch_occl_by_ptr != 0, w * 2.0, w)

    if cfg.hard_negative_factor > 1.0 and not no_hard_negatives:
        band = int((H * W) ** 0.5 / 12.0)
        if band % 2 == 0:
            band += 1
        hard_neg = _dilate_binary(target_mask, band)
        hard_neg = jnp.logical_and(hard_neg, target_mask < 0.5)
        w = jnp.where(hard_neg, w * cfg.hard_negative_factor, w)

    return w


def occlusion_flag_loss(output_flag, target_flag):
    '''Masked-mean BCE over frames with target != 2 (loss.py:150-162). Unused by the default
    training config (flags are not supervised in the reference pipeline) but kept for parity.'''
    sel = (target_flag != 2).astype(jnp.float32)
    loss = bce_with_logits(output_flag.astype(jnp.float32), target_flag.astype(jnp.float32))
    return jnp.sum(loss * sel) / jnp.maximum(jnp.sum(sel), 1.0)


def my_mask_loss(logits, target, final_weights, progress, apply_weights_for_aot: bool,
                 cfg: LossConfig):
    '''Single-channel mask loss (loss.py:164-225) over (B, Q, T, H, W) tensors.

    Frames whose weights are entirely zero are skipped from every reduction via the
    `which_frames` selection; the loss is scaled by sqrt(mean(which_frames)) to avoid
    overweighting near-empty selections (loss.py:216).'''
    B, Q, T, H, W = logits.shape
    which_frames = jnp.any(final_weights != 0.0, axis=(-2, -1))        # (B, Q, T)
    sel = jnp.broadcast_to(which_frames[..., None, None], logits.shape)
    sel_f = sel.astype(jnp.float32)
    n_sel = jnp.sum(sel_f)
    n_safe = jnp.maximum(n_sel, 1.0)

    loss_fn = sigmoid_focal_loss if cfg.focal_loss else bce_with_logits
    loss_bce = loss_fn(logits, target)
    loss_mask_custom = jnp.sum(loss_bce * final_weights * sel_f) / n_safe

    if cfg.aot_loss > 0.0:
        loss_for_aot = loss_bce * final_weights if apply_weights_for_aot else loss_bce
        topk_frac = jnp.clip(1.0 - progress * 8.5, 0.15, 1.0)
        k = jnp.floor(topk_frac * n_sel).astype(jnp.int32)
        loss_bootstrap = topk_mean_masked(loss_for_aot, sel, k)
        if apply_weights_for_aot:
            loss_jaccard = loss_bootstrap  # loss.py:202-203
        else:
            loss_jaccard = tversky_loss(logits, target, sel)
        loss_aot = (loss_bootstrap + loss_jaccard) / 2.0
        loss_mask = loss_aot * cfg.aot_loss + loss_mask_custom * (1.0 - cfg.aot_loss)
    else:
        loss_mask = loss_mask_custom

    loss_mask = loss_mask * jnp.sqrt(n_sel / jnp.float32(logits.size))

    valid = jnp.logical_and(n_sel > 0.0,
                            jnp.mean(final_weights) >= 1e-4)
    return jnp.where(valid, loss_mask, 0.0)


def compute_losses(cfg: LossConfig, output_mask, target_mask, sel_occl_fracs,
                   snitch_occl_by_ptr, query_time, progress,
                   balance_axis_name: Optional[str] = None) -> Dict[str, Any]:
    '''Full per-batch loss computation (loss.py:238-329 + 367-369).

    :param output_mask (B, Q, 3, T, H, W) logits.
    :param target_mask (B, Q, 3, T, H, W) float {0, 1}.
    :param sel_occl_fracs (B, Q, T, 3).
    :param snitch_occl_by_ptr (B, Q, 1, T, H, W) integer occluder-ID map.
    :param query_time scalar int (traced ok).
    :param progress scalar float in [0, 1].
    :return dict with 'track', 'occl_mask', 'cont_mask', 'total_seeker' scalars and
        'snitch_weights' (B, Q, T, H, W) for visualization.
    '''
    out = {}
    snitch_weights = None

    if cfg.track_lw > 0.0:
        fw = mask_track_frame_weights(sel_occl_fracs, query_time, cfg)           # (B,Q,T)
        pw = mask_track_pixel_weights(target_mask[:, :, 0], snitch_occl_by_ptr[:, :, 0],
                                      cfg, balance_axis_name=balance_axis_name)
        snitch_weights = fw[..., None, None] * pw                                # (B,Q,T,H,W)
        out['track'] = my_mask_loss(output_mask[:, :, 0], target_mask[:, :, 0],
                                    snitch_weights, progress, False, cfg)
    else:
        out['track'] = jnp.float32(0.0)

    for ch, key, lw in ((1, 'occl_mask', cfg.occl_mask_lw), (2, 'cont_mask', cfg.cont_mask_lw)):
        if lw > 0.0:
            frame_has = jnp.any(target_mask[:, :, ch] > 0.0, axis=(-2, -1))      # (B,Q,T)
            wch = frame_has.astype(jnp.float32)[..., None, None]
            wch = jnp.broadcast_to(wch, target_mask[:, :, ch].shape)
            wch = wch * (1.0 - cfg.occl_cont_zero_weight) + cfg.occl_cont_zero_weight
            out[key] = my_mask_loss(output_mask[:, :, ch], target_mask[:, :, ch],
                                    wch, progress, True, cfg)
        else:
            out[key] = jnp.float32(0.0)

    out['total_seeker'] = out['track'] * cfg.track_lw + \
        out['occl_mask'] * cfg.occl_mask_lw + out['cont_mask'] * cfg.cont_mask_lw
    if snitch_weights is not None:
        out['snitch_weights'] = snitch_weights
    return out

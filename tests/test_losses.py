'''
Loss tests against independent numpy oracles that follow the reference control flow
(/root/reference/loss.py) with boolean indexing + full sorts, validating the masked-reduction
reimplementation.
'''

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import conftest  # noqa: F401  (sets platform)
from tcow_tpu.objectives import losses as L


def np_bce(x, y):
    return np.maximum(x, 0) - x * y + np.log1p(np.exp(-np.abs(x)))


def test_bce_matches_torch():
    torch = pytest.importorskip('torch')
    rng = np.random.RandomState(0)
    x = rng.randn(4, 5).astype(np.float32) * 3
    y = (rng.rand(4, 5) > 0.5).astype(np.float32)
    got = np.asarray(L.bce_with_logits(jnp.asarray(x), jnp.asarray(y)))
    want = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(x), torch.from_numpy(y), reduction='none').numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_topk_mean_masked_matches_sort():
    rng = np.random.RandomState(1)
    x = rng.rand(1000).astype(np.float32) * 7
    mask = rng.rand(1000) > 0.3
    for frac in (0.15, 0.5, 1.0):
        k = int(frac * mask.sum())
        got = float(L.topk_mean_masked(jnp.asarray(x), jnp.asarray(mask), jnp.int32(k)))
        want = np.sort(x[mask])[::-1][:k].mean()
        assert abs(got - want) < 1e-4 * max(1.0, abs(want)), (frac, got, want)


def test_topk_mean_masked_all_equal():
    x = np.full(64, 2.5, np.float32)
    got = float(L.topk_mean_masked(jnp.asarray(x), jnp.ones(64, bool), jnp.int32(10)))
    assert abs(got - 2.5) < 1e-5


def test_tversky_matches_reference_semantics():
    rng = np.random.RandomState(2)
    logits = rng.randn(6, 8).astype(np.float32)
    target = (rng.rand(6, 8) > 0.6).astype(np.float32)
    sel = np.ones_like(target, bool)
    got = float(L.tversky_loss(jnp.asarray(logits), jnp.asarray(target), jnp.asarray(sel)))
    p0 = 1 / (1 + np.exp(-logits))
    num = (p0 * target).sum()
    den = num + (p0 * (1 - target)).sum() + ((1 - p0) * target).sum()
    want = 1.0 - num / (den + 0.1)
    assert abs(got - want) < 1e-5
    # All-zero target -> 0 loss (loss.py:21,30-31).
    got0 = float(L.tversky_loss(jnp.asarray(logits), jnp.zeros_like(jnp.asarray(target)),
                                jnp.asarray(sel)))
    assert got0 == 0.0


def test_frame_weights():
    cfg = L.LossConfig()
    B, Q, T = 2, 3, 6
    rng = np.random.RandomState(3)
    fr = rng.rand(B, Q, T, 3).astype(np.float32)
    qt = 2
    got = np.asarray(L.mask_track_frame_weights(jnp.asarray(fr), qt, cfg))
    want = np.clip(fr[..., 0] * cfg.occluded_weight, 1.0, None)
    want[..., qt] *= 0.2
    np.testing.assert_allclose(got, want, rtol=1e-6)


def _oracle_pixel_weights(target, ptr, cfg, H, W):
    '''Direct numpy transcription of loss.py:83-148 semantics (single process).'''
    w = np.ones(target.shape, np.float32)
    if cfg.class_balancing:
        pos = target == 1.0
        neg = target == 0.0
        pos_frac = max(pos.mean(), 0.05)
        neg_frac = max(neg.mean(), 0.05)
        if pos_frac > neg_frac:
            pos_corr = (neg_frac / pos_frac) ** 0.7
            neg_corr = (neg_frac / pos_frac) ** -0.3
        else:
            pos_corr = (pos_frac / neg_frac) ** -0.3
            neg_corr = (pos_frac / neg_frac) ** 0.7
        w[neg] *= neg_corr
        w[pos] *= pos_corr
    w[ptr != 0] *= 2.0
    if cfg.hard_negative_factor > 1.0:
        band = int(np.sqrt(H * W) / 12.0)
        if band % 2 == 0:
            band += 1
        r = band // 2
        # dilation with band x band window == gaussian blur > 0
        dil = np.zeros_like(target)
        B_, Q_, T_ = target.shape[:3]
        for b in range(B_):
            for q in range(Q_):
                for t in range(T_):
                    m = target[b, q, t]
                    ys, xs = np.nonzero(m > 0)
                    for y, x in zip(ys, xs):
                        dil[b, q, t, max(0, y - r):y + r + 1, max(0, x - r):x + r + 1] = 1
        hn = (dil > 0) & (target < 0.5)
        w[hn] *= cfg.hard_negative_factor
    return w


def test_pixel_weights_matches_oracle():
    cfg = L.LossConfig()
    rng = np.random.RandomState(4)
    B, Q, T, H, W = 1, 2, 3, 24, 36
    target = (rng.rand(B, Q, T, H, W) > 0.92).astype(np.float32)
    ptr = (rng.rand(B, Q, T, H, W) > 0.95).astype(np.int32) * 5
    got = np.asarray(L.mask_track_pixel_weights(jnp.asarray(target), jnp.asarray(ptr), cfg))
    want = _oracle_pixel_weights(target, ptr, cfg, H, W)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def _oracle_mask_loss(logits, target, weights, progress, apply_w, cfg):
    '''Numpy transcription of loss.py:164-225.'''
    which_frames = (weights != 0).any(axis=(-2, -1))
    sel = np.broadcast_to(which_frames[..., None, None], weights.shape)
    if not sel.any() or weights.mean() < 1e-4:
        return 0.0
    lo = logits[sel]
    ta = target[sel]
    we = weights[sel]
    bce = np_bce(lo, ta)
    custom = (bce * we).mean()
    if cfg.aot_loss > 0:
        bce_aot = bce * we if apply_w else bce
        frac = min(max(1.0 - progress * 8.5, 0.15), 1.0)
        k = int(frac * bce_aot.size)
        boot = np.sort(bce_aot.flatten())[::-1][:k].mean()
        if apply_w:
            jac = boot
        else:
            if ta.mean() >= 1e-6:
                p0 = 1 / (1 + np.exp(-lo))
                num = (p0 * ta).sum()
                den = num + (p0 * (1 - ta)).sum() + ((1 - p0) * ta).sum()
                jac = 1.0 - num / (den + 0.1)
            else:
                jac = 0.0
        aot = (boot + jac) / 2
        loss = aot * cfg.aot_loss + custom * (1 - cfg.aot_loss)
    else:
        loss = custom
    return loss * np.sqrt(sel.mean())


@pytest.mark.parametrize('apply_w,progress', [(False, 0.0), (False, 0.5), (True, 0.05)])
def test_my_mask_loss_matches_oracle(apply_w, progress):
    cfg = L.LossConfig()
    rng = np.random.RandomState(5)
    B, Q, T, H, W = 1, 2, 4, 8, 12
    logits = rng.randn(B, Q, T, H, W).astype(np.float32)
    target = (rng.rand(B, Q, T, H, W) > 0.7).astype(np.float32)
    weights = rng.rand(B, Q, T, H, W).astype(np.float32) + 0.1
    # Zero out some frames entirely to exercise frame skipping.
    weights[:, :, 1] = 0.0
    got = float(L.my_mask_loss(jnp.asarray(logits), jnp.asarray(target),
                               jnp.asarray(weights), jnp.float32(progress), apply_w, cfg))
    want = _oracle_mask_loss(logits, target, weights, progress, apply_w, cfg)
    assert abs(got - want) < 2e-4 * max(1.0, abs(want)), (got, want)


def test_compute_losses_runs_and_total():
    cfg = L.LossConfig()
    rng = np.random.RandomState(6)
    B, Q, T, H, W = 1, 2, 4, 16, 16
    out = rng.randn(B, Q, 3, T, H, W).astype(np.float32)
    tgt = (rng.rand(B, Q, 3, T, H, W) > 0.8).astype(np.float32)
    fr = rng.rand(B, Q, T, 3).astype(np.float32)
    ptr = np.zeros((B, Q, 1, T, H, W), np.int32)
    res = L.compute_losses(cfg, jnp.asarray(out), jnp.asarray(tgt), jnp.asarray(fr),
                           jnp.asarray(ptr), 0, jnp.float32(0.2))
    total = float(res['track']) * cfg.track_lw + float(res['occl_mask']) * cfg.occl_mask_lw \
        + float(res['cont_mask']) * cfg.cont_mask_lw
    assert abs(float(res['total_seeker']) - total) < 1e-6
    assert res['snitch_weights'].shape == (B, Q, T, H, W)
    assert np.isfinite(total)


def test_focal_loss_matches_torchvision_semantics():
    '''sigmoid_focal_loss must match torchvision.ops.sigmoid_focal_loss (reduction='none'),
    the reference's loss when --focal_loss (loss.py:197 equivalent).'''
    import torch
    rng = np.random.RandomState(11)
    x = rng.randn(4, 7).astype(np.float32) * 3
    y = (rng.rand(4, 7) > 0.5).astype(np.float32)
    got = np.asarray(L.sigmoid_focal_loss(jnp.asarray(x), jnp.asarray(y)))
    try:
        from torchvision.ops import sigmoid_focal_loss as tv_focal
        want = tv_focal(torch.tensor(x), torch.tensor(y), reduction='none').numpy()
    except ImportError:
        p = torch.sigmoid(torch.tensor(x))
        ce = torch.nn.functional.binary_cross_entropy_with_logits(
            torch.tensor(x), torch.tensor(y), reduction='none')
        p_t = p * torch.tensor(y) + (1 - p) * (1 - torch.tensor(y))
        want = (ce * ((1 - p_t) ** 2))
        alpha_t = 0.25 * torch.tensor(y) + 0.75 * (1 - torch.tensor(y))
        want = (alpha_t * want).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_compute_losses_focal_variant():
    '''--focal_loss flips the pixel loss; totals must stay finite and differ from BCE.'''
    rng = np.random.RandomState(12)
    B, Q, C, T, H, W = 1, 1, 3, 4, 16, 16
    out = jnp.asarray(rng.randn(B, Q, C, T, H, W), jnp.float32)
    tgt = jnp.asarray((rng.rand(B, Q, C, T, H, W) > 0.5), jnp.float32)
    occ = jnp.zeros((B, Q, T, 3), jnp.float32)
    ptr = -jnp.ones((B, Q, T, H, W), jnp.float32)
    r_bce = L.compute_losses(L.LossConfig(), out, tgt, occ, ptr, jnp.int32(0), 0.5)
    r_foc = L.compute_losses(L.LossConfig(focal_loss=True), out, tgt, occ, ptr,
                             jnp.int32(0), 0.5)
    assert np.isfinite(float(r_foc['total_seeker']))
    assert abs(float(r_foc['total_seeker']) - float(r_bce['total_seeker'])) > 1e-4

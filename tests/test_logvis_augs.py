'''
Logger (scalar accumulation, media writers, friendly names) + augmentation pipeline tests.
'''

import os

import numpy as np
import pytest

import conftest  # noqa: F401
from tcow_tpu.data import augs as augs_lib
from tcow_tpu.utils import visualization
from tcow_tpu.utils.logvis import Logger, MyLogger


def test_scalar_weighted_memory(tmp_path):
    lg = Logger(str(tmp_path), 'unit')
    lg.report_scalar('k', 1.0, remember=True, weight=1.0)
    lg.report_scalar('k', 3.0, remember=True, weight=3.0)
    out = lg.commit_scalars()
    assert abs(out['k'] - 2.5) < 1e-6  # (1*1 + 3*3) / 4
    assert lg.commit_scalars() == {}  # memory cleared


def test_save_video_and_gallery(tmp_path):
    lg = Logger(str(tmp_path), 'unit')
    frames = np.random.RandomState(0).rand(5, 32, 48, 3).astype(np.float32)
    fp = lg.save_video(frames, 'clip.webm', fps=5, asynchronous=False)
    assert fp is not None and os.path.exists(fp) and os.path.getsize(fp) > 0
    gal = lg.save_gallery(np.stack([frames[0]] * 5), 'g.png', num_cols=3)
    assert os.path.exists(gal)
    pkl = lg.save_pickle({'a': 1}, 'results/x.p')
    assert os.path.exists(pkl)


def test_friendly_short_name():
    kub = {'source_name': 'kubric', 'scene_dn': 'kubcon_v10_scn00042', 'dset_idx': 3}
    assert MyLogger.friendly_short_name(kub, 1) == 'kubcon_v10_scn00042_q1'
    plug = {'source_name': 'plugin', 'src_path': '/x/rollball.mp4', 'dset_idx': 7,
            'frame_start': 15, 'frame_stride': 4}
    assert MyLogger.friendly_short_name(plug) == 'rollball_i7_f15_s4'


def test_draw_segm_borders():
    m = np.zeros((2, 10, 10, 1), np.uint8)
    m[:, 3:7, 3:7, 0] = 1
    border = visualization.draw_segm_borders(m)
    assert border.shape == (2, 10, 10)
    assert border[0, 3, 3] and not border[0, 5, 5]  # edge yes, interior no


def make_pipeline(**kw):
    base = dict(num_frames_load=10, num_frames_clip=8, frame_height=24, frame_width=32,
                frame_stride=1, do_random_augs=True, augs_2d=True, reverse_prob=0.5,
                palindrome_prob=0.5, center_crop=False)
    base.update(kw)
    return augs_lib.AugmentationPipeline(**base)


def test_augs_param_distributions():
    pipe = make_pipeline()
    rng = np.random.default_rng(0)
    stats = {'palindrome': 0, 'reverse': 0, 'flip': 0}
    n = 400
    for _ in range(n):
        p = pipe.sample_augs_params(rng)
        stats['palindrome'] += p['palindrome']
        stats['reverse'] += p['reverse']
        stats['flip'] += p['horz_flip']
        assert len(p['frame_inds_clip']) == 8
        assert all(0 <= i < 10 for i in p['frame_inds_clip'])
        if np.all(p['crop_rect'] >= 0):
            y1, y2, x1, x2 = p['crop_rect']
            assert 0 <= y1 <= 0.2 and 0.8 <= y2 <= 1.0
            assert 0 <= x1 <= 0.2 and 0.8 <= x2 <= 1.0
    assert 0.35 < stats['palindrome'] / n < 0.65
    assert 0.35 < stats['flip'] / n < 0.65


def test_augs_deterministic_no_random():
    pipe = make_pipeline(do_random_augs=False)
    p = pipe.sample_augs_params(np.random.default_rng(1))
    assert not p['palindrome'] and not p['reverse'] and not p['horz_flip']
    assert p['offset'] == 1  # (10 - 8) // 2
    np.testing.assert_array_equal(p['frame_inds_clip'], np.arange(8))


def test_apply_flip_and_nearest_resize():
    pipe = make_pipeline(do_random_augs=False)
    params = pipe.sample_augs_params(np.random.default_rng(0))
    params['horz_flip'] = True
    rgb = np.zeros((3, 10, 24, 32), np.float32)
    rgb[:, :, :, :16] = 1.0  # left half bright
    segm = np.zeros((1, 10, 24, 32), np.uint8)
    segm[:, :, :, :16] = 7
    out = pipe.apply_augs_2d_frames({'rgb': rgb, 'segm': segm}, params)
    # After flip the bright half is on the right.
    assert out['rgb'][:, 0, :, 16:].mean() > 0.9
    assert out['rgb'][:, 0, :, :16].mean() < 0.1
    # Nearest resize keeps integer labels intact.
    assert set(np.unique(out['segm'])) <= {0, 7}


def test_nearest_resize_matches_cv2_bitwise():
    '''The gather-based nearest resize must reproduce cv2.INTER_NEAREST exactly,
    including the one-ulp boundary behavior of cv2's 1/(dst/src) scale expression
    (e.g. 368->320 flips the source column at j=100 vs the naive src/dst mapping).'''
    import cv2
    from tcow_tpu.data.augs import resize_frames
    rng = np.random.default_rng(0)
    for (H, W, h, w) in [(360, 480, 240, 320), (304, 368, 240, 320),
                         (123, 77, 240, 320), (288, 384, 192, 256),
                         (300, 400, 222, 333)]:
        frames = rng.integers(0, 255, (5, 3, H, W), dtype=np.uint8)
        got = resize_frames(frames, h, w, nearest=True)
        for c in range(5):
            for t in range(3):
                ref = cv2.resize(frames[c, t], (w, h),
                                 interpolation=cv2.INTER_NEAREST)
                np.testing.assert_array_equal(got[c, t], ref, err_msg=str((H, W, h, w)))
    # Non-contiguous (flipped/cropped view) input takes the same gather path.
    view = frames[:, :, ::-1, 3:-3][:, :, 5:]
    got = resize_frames(view, 240, 320, nearest=True)
    np.testing.assert_array_equal(
        got[0, 0], cv2.resize(np.ascontiguousarray(view[0, 0]), (320, 240),
                              interpolation=cv2.INTER_NEAREST))


def test_grayscale_aug_preserves_shape():
    '''Regression: the p=0.05 rgb_grayscale branch used a bogus transpose that exploded the
    channel axis ((T,1,H,W)->(T,W,1,H) before the repeat), crashing any item that drew it.'''
    pipe = make_pipeline(do_random_augs=False)
    params = pipe.sample_augs_params(np.random.default_rng(0))
    params['rgb_grayscale'] = True
    rng = np.random.default_rng(1)
    rgb = rng.random((3, 10, 24, 32)).astype(np.float32)
    out = pipe.apply_augs_2d_frames({'rgb': rgb}, params)
    assert out['rgb'].shape == (3, 8, 24, 32)
    np.testing.assert_allclose(out['rgb'][0], out['rgb'][1], atol=1e-6)  # r == g == b
    np.testing.assert_allclose(out['rgb'][1], out['rgb'][2], atol=1e-6)


def test_device_color_jitter_matches_host():
    '''ops/device_augs.apply_color_jitter reproduces the host color_jitter math (same
    factors + op order) to float tolerance; hue goes through different HSV converters
    (cv2 vs jnp), hence the looser tolerance there.'''
    import jax.numpy as jnp
    from tcow_tpu.ops import device_augs

    rng = np.random.default_rng(3)
    frames = rng.random((3, 4, 16, 20)).astype(np.float32)      # (3, T, H, W)
    for seed in range(4):
        frng = np.random.default_rng(100 + seed)
        factors = augs_lib.sample_jitter_factors(frng)
        host = augs_lib.color_jitter(frames.transpose(1, 0, 2, 3),
                                     np.random.default_rng(0), factors=factors)
        fv = np.array([[factors['fb'], factors['fc'], factors['fs'], factors['fh'], 1.0]],
                      np.float32)
        ov = factors['order'][None].astype(np.int32)
        dev = device_augs.apply_color_jitter(jnp.asarray(frames[None]), jnp.asarray(fv),
                                             jnp.asarray(ov))
        np.testing.assert_allclose(np.asarray(dev[0]).transpose(1, 0, 2, 3), host,
                                   atol=3e-3, rtol=0)

    # apply = 0 -> exact no-op.
    fv0 = np.array([[1.3, 0.7, 1.1, 0.05, 0.0]], np.float32)
    dev0 = device_augs.apply_color_jitter(jnp.asarray(frames[None]), jnp.asarray(fv0),
                                          jnp.asarray(np.arange(4, dtype=np.int32)[None]))
    np.testing.assert_array_equal(np.asarray(dev0[0]), frames)


def test_device_blur_gray_matches_host_ops():
    '''apply_blur_gray reproduces cv2.GaussianBlur (ksize 5, reflect-101 borders) and the
    host grayscale math on identical inputs at identical sigma.'''
    import jax.numpy as jnp
    from tcow_tpu.ops import device_augs

    rng = np.random.default_rng(5)
    frames = rng.random((4, 3, 16, 20)).astype(np.float32)          # host (T, 3, H, W)
    dev_in = jnp.asarray(frames.transpose(1, 0, 2, 3)[None])        # (1, 3, T, H, W)
    for sigma in (0.1, 1.0, 3.5):
        host = augs_lib.gaussian_blur(frames, np.random.default_rng(0), sigma=sigma)
        bg = np.array([[sigma, sigma, 0.0]], np.float32)
        dev = device_augs.apply_blur_gray(dev_in, jnp.asarray(bg))
        np.testing.assert_allclose(np.asarray(dev[0]).transpose(1, 0, 2, 3), host,
                                   atol=2e-5, rtol=0, err_msg=f'sigma={sigma}')
    # Grayscale alone.
    host_g = np.repeat(augs_lib._rgb_to_gray(frames), 3, axis=1)
    bg = np.array([[0.0, 0.0, 1.0]], np.float32)
    dev = device_augs.apply_blur_gray(dev_in, jnp.asarray(bg))
    np.testing.assert_allclose(np.asarray(dev[0]).transpose(1, 0, 2, 3), host_g,
                               atol=1e-6, rtol=0)
    # All-zero vector -> exact no-op.
    dev0 = device_augs.apply_blur_gray(dev_in, jnp.zeros((1, 3), jnp.float32))
    np.testing.assert_array_equal(np.asarray(dev0), np.asarray(dev_in))


def test_deferred_jitter_keeps_rng_stream_aligned(monkeypatch):
    '''With defer_color_jitter, the PIPELINE's RNG must sit at the same stream position
    after the jitter point as the host-jitter path (sample_jitter_factors consumes
    exactly the draws color_jitter would have) — observed by recording the bit-generator
    state of the rng the pipeline actually passes in, right after each call returns.'''
    rng_img = np.random.default_rng(7)
    rgb = rng_img.random((3, 10, 24, 32)).astype(np.float32)
    segm = (rng_img.random((1, 10, 24, 32)) * 4).astype(np.uint8)

    post_states = {}
    outs = {}
    orig_sample = augs_lib.sample_jitter_factors
    orig_jitter = augs_lib.color_jitter
    for defer in (False, True):
        def rec_sample(rng, *a, **k):
            out = orig_sample(rng, *a, **k)
            post_states[defer] = rng.bit_generator.state
            return out

        def rec_jitter(frames, rng, *a, **k):
            out = orig_jitter(frames, rng, *a, **k)
            post_states[defer] = rng.bit_generator.state
            return out

        monkeypatch.setattr(augs_lib, 'sample_jitter_factors', rec_sample)
        monkeypatch.setattr(augs_lib, 'color_jitter', rec_jitter)
        pipe = make_pipeline(defer_color_jitter=defer)
        params = pipe.sample_augs_params(np.random.default_rng(11))
        params['color_jitter'] = True
        params['rgb_blur'] = params['rgb_grayscale'] = False  # the pure-defer case
        out = pipe.apply_augs_2d_frames({'rgb': rgb.copy(), 'segm': segm.copy()}, params)
        outs[defer] = (out, params)
    monkeypatch.setattr(augs_lib, 'sample_jitter_factors', orig_sample)
    monkeypatch.setattr(augs_lib, 'color_jitter', orig_jitter)

    # Same in-pipeline stream position after the jitter point in both modes.
    assert post_states[False] == post_states[True]
    np.testing.assert_array_equal(outs[False][0]['segm'], outs[True][0]['segm'])
    jf = outs[True][1]['jitter_factors']
    assert set(jf) == {'fb', 'fc', 'fs', 'fh', 'order'}
    # Host path applied the jitter; the pure-defer path leaves rgb un-jittered.
    assert not np.allclose(outs[False][0]['rgb'], outs[True][0]['rgb'])


def test_deferred_blur_grayscale_matches_host_chain():
    '''Full deferral (round 3): items drawing blur/grayscale defer the WHOLE color chain
    (jitter -> blur -> gray, same relative order as the host) to the device. With an
    identity spatial path (no crop/flip, source size == target size) applying the device
    ops to the deferred pipeline's rgb must reproduce the host pipeline's rgb to float
    tolerance — which also proves the deferred path consumed the same RNG draws (factors
    + blur sigma) at the same stream positions.'''
    import jax.numpy as jnp
    from tcow_tpu.ops import device_augs

    rng_img = np.random.default_rng(8)
    rgb = rng_img.random((3, 10, 24, 32)).astype(np.float32)

    for blur, gray in ((True, False), (False, True), (True, True)):
        outs, fparams = {}, {}
        for defer in (False, True):
            pipe = make_pipeline(defer_color_jitter=defer)
            params = pipe.sample_augs_params(np.random.default_rng(13))
            params['color_jitter'] = True
            params['rgb_blur'] = blur
            params['rgb_grayscale'] = gray
            params['horz_flip'] = False
            params['crop_rect'] = -np.ones(4)
            out = pipe.apply_augs_2d_frames({'rgb': rgb.copy()}, params)
            outs[defer] = out['rgb']
            fparams[defer] = params

        p = fparams[True]
        jf = p['jitter_factors']
        assert jf is not None
        if blur:
            sy, sx = p['blur_sigmas']
            assert 0.1 <= sy <= 3.5 and sy == sx  # identity resize -> unscaled sigma
        else:
            assert 'blur_sigmas' not in p
        fv = np.array([[jf['fb'], jf['fc'], jf['fs'], jf['fh'], 1.0]], np.float32)
        ov = jf['order'][None].astype(np.int32)
        bg = np.array([[p['blur_sigmas'][0] if blur else 0.0,
                        p['blur_sigmas'][1] if blur else 0.0,
                        1.0 if gray else 0.0]], np.float32)
        dev = device_augs.apply_color_jitter(jnp.asarray(outs[True][None]),
                                             jnp.asarray(fv), jnp.asarray(ov))
        dev = device_augs.apply_blur_gray(dev, jnp.asarray(bg))
        np.testing.assert_allclose(np.asarray(dev[0]), outs[False], atol=3e-3, rtol=0,
                                   err_msg=f'blur={blur} gray={gray}')


def test_center_crop_aspect():
    pipe = make_pipeline(do_random_augs=False, augs_2d=False, center_crop=True,
                         frame_height=24, frame_width=24)  # square target
    params = pipe.sample_augs_params(np.random.default_rng(0))
    wide = np.zeros((3, 10, 20, 40), np.float32)
    wide[:, :, :, 10:30] = 1.0  # center band
    out = pipe.apply_augs_2d_frames({'rgb': wide}, params)
    assert out['rgb'].shape == (3, 8, 24, 24)
    assert out['rgb'].mean() > 0.95  # crop kept the bright center


def test_train_step_overlays_render(tmp_path):
    '''handle_train_step must render all four overlay videos for kubric-shaped outputs
    (failures are swallowed in production; here we assert the files appear).'''
    import numpy as np
    lg = MyLogger(log_dir=str(tmp_path), context='train')
    lg.step_interval = 1
    B, Q, C, T, H, W = 1, 2, 3, 4, 32, 48
    rng = np.random.RandomState(0)
    model_retval = {
        'seeker_input': rng.rand(B, 3, T, H, W).astype(np.float32),
        'output_mask': rng.randn(B, Q, C, T, H, W).astype(np.float32),
        'seeker_query_mask': (rng.rand(B, Q, 1, T, H, W) > 0.9).astype(np.float32),
        'target_mask': (rng.rand(B, Q, C, T, H, W) > 0.8).astype(np.float32),
    }
    loss_retval = {'total_seeker': 0.5, 'track': 0.4,
                   'metrics': {'mean_snitch_iou': 0.1}}
    lg.handle_train_step(0, 'train', 0, 0, 10, {'source_name': 'kubric'}, model_retval,
                         loss_retval)
    lg.epoch_finished(0)
    names = sorted(os.listdir(lg.vis_dir))
    assert any('_in.' in n for n in names)
    assert any('_out_sn.' in n for n in names)
    assert any('_out_oc.' in n for n in names)
    assert any('_gt.' in n for n in names)

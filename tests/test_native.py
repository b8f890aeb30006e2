'''
Native C++ preprocessing kernels: build, exact equivalence with the numpy fallbacks, and a
sanity speed check.
'''

import os
import time

import numpy as np
import pytest

import conftest  # noqa: F401
from tcow_tpu import native
from tcow_tpu.data import data_utils, synthetic


@pytest.fixture(scope='module')
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip('native library unavailable (g++ missing?)')
    return lib


def test_overlap_stats_match_numpy(lib):
    rng = np.random.RandomState(0)
    T, H, W, K = 4, 24, 32, 7
    segm = rng.randint(0, K + 1, size=(T, H, W)).astype(np.int32)
    div = (rng.rand(T, H, W, K) > 0.5).astype(np.uint8)
    vis, tot, dd, dv = native.scene_overlap_stats(segm, div)

    ids = np.arange(1, K + 1)
    vis_ref = (segm[..., None] == ids).reshape(T, -1, K).sum(axis=1)
    tot_ref = div.reshape(T, -1, K).sum(axis=1)
    df = div.reshape(T, -1, K).astype(np.float64)
    vf = (segm[..., None] == ids).reshape(T, -1, K).astype(np.float64)
    dd_ref = np.einsum('tpk,tpl->tkl', df, df)
    dv_ref = np.einsum('tpk,tpl->tkl', df, vf)
    np.testing.assert_array_equal(vis, vis_ref)
    np.testing.assert_array_equal(tot, tot_ref)
    np.testing.assert_array_equal(dd, dd_ref)
    np.testing.assert_array_equal(dv, dv_ref)


def test_paint_recon_matches_loop(lib):
    rng = np.random.RandomState(1)
    T, H, W, K = 3, 16, 20, 5
    div = (rng.rand(T, H, W, K) > 0.6).astype(np.uint8)
    order = np.stack([rng.permutation(K) for _ in range(T)]).astype(np.int32)
    got = native.paint_recon_segm(div, order)
    want = np.zeros((T, H, W), np.int32)
    for t in range(T):
        for ref in order[t]:
            want[t][div[t, :, :, ref] == 1] = ref + 1
    np.testing.assert_array_equal(got, want)


def test_dag_same_with_and_without_native(monkeypatch):
    if native.get_lib() is None:
        pytest.skip('native library unavailable')
    scene = synthetic.make_synthetic_scene_arrays(5, T=4, H=32, W=32, K=3)
    segm = scene['segm'][..., None]
    div = scene['div_segm'].transpose(1, 2, 3, 0)
    meta = {'camera': {'positions': [[0.0, 0.0, 10.0]] * 4},
            'instances': [{'positions': [[0, 0, float(k)]] * 4,
                           'bboxes_3d': [np.eye(4)[:3].T.tolist() + [[0, 0, 0]]] * 4}
                          for k in range(3)]}
    # Make bboxes valid (8, 3) corner sets.
    def cube(o):
        e = np.eye(3) * 0.2
        o = np.asarray(o, float)
        return np.stack([o, o + e[0], o + e[1], o + e[2], o + e[0] + e[1],
                         o + e[0] + e[2], o + e[1] + e[2], o + e.sum(0)])
    for k in range(3):
        meta['instances'][k]['bboxes_3d'] = [cube([0, 0, k]).tolist()] * 4

    dag1, ord1, recon1, err1 = data_utils.get_thing_occl_cont_dag(segm, div, meta,
                                                                  list(range(4)))
    monkeypatch.setenv('TCOW_NO_NATIVE', '1')
    monkeypatch.setattr(native, '_lib', None)
    monkeypatch.setattr(native, '_failed', False)
    dag2, ord2, recon2, err2 = data_utils.get_thing_occl_cont_dag(segm, div, meta,
                                                                  list(range(4)))
    np.testing.assert_allclose(dag1, dag2, atol=1e-5)
    np.testing.assert_array_equal(ord1, ord2)
    np.testing.assert_array_equal(recon1, recon2)
    assert abs(err1 - err2) < 1e-9


def test_nearest_index_maps_match_apply(lib):
    '''nearest_index_maps must reproduce apply_augs_2d_frames exactly for nearest-path
    modalities, across flip/crop/palindrome/center-crop variants.'''
    from tcow_tpu.data import augs as augs_lib
    rng = np.random.default_rng(11)
    for trial in range(12):
        center_crop = trial % 3 == 2
        pipe = augs_lib.AugmentationPipeline(
            num_frames_load=10, num_frames_clip=8, frame_height=24, frame_width=32,
            frame_stride=1, do_random_augs=(trial % 3 != 1), augs_2d=True,
            reverse_prob=0.2, palindrome_prob=0.4, center_crop=center_crop)
        params = pipe.sample_augs_params(rng)
        H, W = (40, 72) if center_crop else (48, 64)
        raw = rng.integers(0, 5, size=(3, 10, H, W)).astype(np.uint8)
        want = pipe.apply_augs_2d_frames({'segm': raw}, params)['segm']
        t_map, y_map, x_map = pipe.nearest_index_maps(params, H, W)
        got = raw[:, t_map][:, :, y_map[:, None], x_map]
        np.testing.assert_array_equal(got, want)


def test_gather_div_bits_matches_unpack(lib):
    rng = np.random.default_rng(7)
    Tv, H, W, K = 6, 40, 56, 11          # KB = 2: exercises multi-byte packing
    div = (rng.random((Tv, H, W, K)) > 0.6).astype(np.uint8)
    packed = np.packbits(div, axis=-1)
    t_map = rng.integers(0, Tv, size=5)
    y_map = rng.integers(0, H, size=24)
    x_map = rng.integers(0, W, size=32)  # 32 % 8 == 0 for the packw output
    kthw, thwk, packw, delta = native.gather_div_bits(packed, K, t_map, y_map, x_map,
                                                      want_kthw=True, want_thwk=True,
                                                      want_packw=True, want_delta=True)
    want = div[t_map][:, y_map[:, None], x_map]          # (Tc, h, w, K)
    np.testing.assert_array_equal(thwk, want)
    np.testing.assert_array_equal(kthw, want.transpose(3, 0, 1, 2))
    np.testing.assert_array_equal(packw, np.packbits(want.transpose(3, 0, 1, 2), axis=-1))
    wk = want.transpose(3, 0, 1, 2)
    delta_want = np.zeros((K, len(t_map)), np.int64)
    delta_want[:, 1:] = (wk[:, 1:] != wk[:, :-1]).reshape(K, len(t_map) - 1, -1).sum(-1)
    np.testing.assert_array_equal(delta, delta_want)

    segm = rng.integers(0, K + 1, size=(Tv, H, W)).astype(np.int16)
    got = native.gather_segm_i16(segm, t_map, y_map, x_map)
    np.testing.assert_array_equal(got, segm[t_map][:, y_map[:, None], x_map].astype(np.int32))


def test_item_equivalence_native_vs_numpy(tmp_path, monkeypatch):
    '''The full dataset item (augmented masks, occl fracs, verify outcome, collate batch)
    must be bit-identical with and without the native fused-gather fast path.'''
    if native.get_lib() is None:
        pytest.skip('native library unavailable')
    from tcow_tpu.data.kubric import KubricQueryDataset, collate_kubric
    root = str(tmp_path / 'kub')
    synthetic.write_synthetic_kubric_dataset(root, num_scenes=2, seed=9,
                                             T=10, H=48, W=64, K=4)

    def make_items():
        ds = KubricQueryDataset(root, None, 'train', num_frames=8, frame_height=32,
                                frame_width=48, max_delay=2, num_queries=2, max_objects=6,
                                augs_2d=True, reverse_prob=0.2, palindrome_prob=0.3,
                                seed=5, device_color_jitter=True)
        out = []
        for epoch in range(3):
            ds.set_epoch(epoch)
            out += [ds[0], ds[1]]
        return out

    items_fast = make_items()
    assert any('div_segm_packed_w' in it for it in items_fast), \
        'native fast path did not engage'
    monkeypatch.setenv('TCOW_NO_NATIVE', '1')
    monkeypatch.setattr(native, '_lib', None)
    monkeypatch.setattr(native, '_failed', False)
    items_slow = make_items()

    for fast, slow in zip(items_fast, items_slow):
        for key in ('rgb', 'segm', 'div_segm', 'occl_fracs', 'occl_cont_dag',
                    'desirability', 'frame_times', 'jitter_factors', 'blur_gray'):
            np.testing.assert_array_equal(np.asarray(fast[key]), np.asarray(slow[key]),
                                          err_msg=key)
        np.testing.assert_array_equal(fast['div_segm_packed_w'],
                                      np.packbits(slow['div_segm'], axis=-1))
    b_fast = collate_kubric(items_fast[:2], 2, 'train', rng=np.random.default_rng(3))
    b_slow = collate_kubric(items_slow[:2], 2, 'train', rng=np.random.default_rng(3))
    for k in b_fast:
        np.testing.assert_array_equal(np.asarray(b_fast[k]), np.asarray(b_slow[k]),
                                      err_msg=k)


def test_native_speedup_sanity(lib):
    '''The bitset-histogram kernel should beat the einsum fallback comfortably at realistic
    sizes (T=30, 240x320, K=36).'''
    rng = np.random.RandomState(2)
    T, H, W, K = 8, 240, 320, 36
    segm = rng.randint(0, 9, size=(T, H, W)).astype(np.int32)
    div = np.zeros((T, H, W, K), np.uint8)
    div[..., :8] = (rng.rand(T, H, W, 8) > 0.7).astype(np.uint8)

    t0 = time.time()
    native.scene_overlap_stats(segm, div)
    t_native = time.time() - t0

    df = div.reshape(T, -1, K).astype(np.float32)
    ids = np.arange(1, K + 1)
    t0 = time.time()
    vf = (segm[..., None] == ids).reshape(T, -1, K).astype(np.float32)
    np.einsum('tpk,tpl->tkl', df, df)
    np.einsum('tpk,tpl->tkl', df, vf)
    t_numpy = time.time() - t0
    # Not asserting a hard ratio (CI noise), but native must not be slower.
    assert t_native < t_numpy, (t_native, t_numpy)
    print(f'native {t_native * 1e3:.1f} ms vs numpy {t_numpy * 1e3:.1f} ms')

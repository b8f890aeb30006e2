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

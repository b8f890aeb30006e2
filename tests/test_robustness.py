'''
Failure-tolerance paths (SURVEY.md section 5.3): dataset retry-with-resample on broken
scenes, cache self-healing on corrupt cache files, and the [SkipCache] no-retry protocol.
'''

import glob
import os
import shutil

import numpy as np
import pytest

import conftest  # noqa: F401
from tcow_tpu.data import synthetic
from tcow_tpu.data.kubric import KubricQueryDataset


@pytest.fixture()
def synth_root(tmp_path):
    root = tmp_path / 'kub'
    synthetic.write_synthetic_kubric_dataset(str(root), num_scenes=3, seed=31,
                                             T=8, H=48, W=64, K=4)
    return str(root)


def make_ds(root, **kw):
    base = dict(num_frames=6, frame_height=32, frame_width=48, max_delay=2, num_queries=1,
                max_objects=6, seed=3)
    base.update(kw)
    return KubricQueryDataset(root, None, 'train', **base)


def test_retry_resamples_broken_scene(synth_root):
    '''A scene with missing frames must be skipped via resampling (data_kubric.py:104-131).'''
    ds = make_ds(synth_root)
    victim = ds.scene_dps[0]
    for fp in glob.glob(os.path.join(victim, 'frames', 'rgba_*.png')):
        os.remove(fp)
    item = ds[0]  # index 0 maps to the broken scene; must resample another
    assert item['retries'] >= 1
    assert item['scene_dp'] != victim


def test_all_scenes_broken_raises(synth_root):
    ds = make_ds(synth_root)
    for dp in ds.scene_dps:
        shutil.rmtree(os.path.join(dp, 'frames'))
    with pytest.raises(Exception):
        ds[0]


def test_cache_self_heals_on_corruption(synth_root):
    ds = make_ds(synth_root)
    item1 = ds[1]
    caches = glob.glob(os.path.join(synth_root, '*', 'cc_tpu_*', '*.npy'))
    assert caches
    # Corrupt every cache file; loading must regenerate rather than crash.
    for fp in caches:
        with open(fp, 'wb') as f:
            f.write(b'not an npy at all')
    item2 = ds[1]
    np.testing.assert_array_equal(item1['segm'], item2['segm'])
    # And the cache was rewritten with valid content.
    fp = glob.glob(os.path.join(item2['scene_dp'], 'cc_tpu_*', 'pv_rgb_u8.npy'))[0]
    assert np.load(fp, allow_pickle=False).ndim == 4


def test_insufficient_queries_skipcache(synth_root):
    '''Requesting more queries than valid instances must fail fast with the [SkipCache]
    protocol (no pointless cache regeneration; data_kubric.py:467-471).'''
    ds = make_ds(synth_root, num_queries=50)
    with pytest.raises(Exception, match=r'\[SkipCache\]|Not enough|Insufficient'):
        ds._load_example(ds.scene_dps[0], np.random.default_rng(0))

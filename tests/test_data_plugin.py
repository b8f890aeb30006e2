'''
Plugin video dataset tests using the repo's own demo clip (demo/rollball.mp4 + sparse
annotation masks), covering mask-file discovery, usage-mode enumeration, sparse targets,
and center-crop resizing.
'''

import os

import numpy as np
import pytest

import conftest
from tcow_tpu.data.plugin import PluginVideoDataset, load_timestamped_named_mask_files

DEMO_DP = os.path.join(conftest.REPO_ROOT, 'demo')
DEMO_MP4 = os.path.join(DEMO_DP, 'rollball.mp4')


@pytest.fixture(scope='module')
def dataset():
    if not os.path.exists(DEMO_MP4):
        pytest.skip('demo assets missing')
    return PluginVideoDataset(DEMO_MP4, None, 'test', num_clip_frames=20, frame_height=48,
                              frame_width=64, query_time=0.0, prefetch=True,
                              center_crop=True)


def test_mask_discovery():
    masks = load_timestamped_named_mask_files(DEMO_DP, 'rollball.mp4', 'query', 480)
    assert list(masks.keys()) == [15]
    assert masks[15].shape[-1] == 1 and masks[15].max() == 1
    snitch = load_timestamped_named_mask_files(DEMO_DP, 'rollball.mp4', 'snitch', 480)
    assert sorted(snitch.keys()) == [55, 95]


def test_usage_modes_place_query(dataset):
    assert len(dataset.usage_modes) > 0
    qt = dataset.query_time_idx  # floor(0.0 * 20) = 0
    assert qt == 0
    for start, stride, cov in dataset.usage_modes:
        assert start + qt * stride == 15  # query frame lands at clip position 0


def test_item_schema_and_sparse_targets(dataset):
    # Pick a usage mode whose clip actually covers some annotated frames.
    idx = max(range(len(dataset.usage_modes)),
              key=lambda i: dataset.usage_modes[i][2])
    item = dataset[idx]
    assert item['source_name'] == 'plugin'
    assert item['rgb'].shape == (3, 20, 48, 64)
    assert item['query'].shape == (1, 20, 48, 64)
    assert item['target'].shape == (3, 20, 48, 64)
    # Query mask present exactly at the query frame.
    per_frame = item['query'][0].reshape(20, -1).sum(axis=1)
    assert per_frame[0] > 0
    assert (per_frame[1:] == 0).all()
    # Targets are -1 (unannotated) on frames without annotations.
    tgt = item['target']
    annotated = (tgt >= 0).reshape(3, 20, -1).any(axis=-1)  # (3, T)
    assert annotated.sum() > 0
    assert (~annotated).sum() > 0
    unann_frames = ~annotated.any(axis=0)
    assert (tgt[:, unann_frames] == -1).all()


def test_metrics_only_on_annotated_frames(dataset):
    from tcow_tpu.objectives import metrics as M
    import jax.numpy as jnp
    idx = max(range(len(dataset.usage_modes)),
              key=lambda i: dataset.usage_modes[i][2])
    item = dataset[idx]
    target = item['target'][None, None]  # (1, 1, 3, T, H, W)
    output = np.full(target.shape, 5.0, np.float32)  # predict everything
    got = M.calculate_metrics_mask_track(jnp.asarray(output), jnp.asarray(target))
    # counts only from annotated, non-empty frames
    n_snitch = sum(1 for t in range(20) if (item['target'][0, t] > 0.5).any())
    assert got['count_snitch_iou'] == n_snitch


# ---------------------------------------------------------------------------
# Reference demo media (read-only): the ONLY real human-annotated video available in
# this image. Validates real mp4 decode + the genuine annotation-file layout
# (/root/reference/README.md:127-152, parsed per data_plugin.py:118-132).
# ---------------------------------------------------------------------------

REF_DEMO_DP = '/root/reference/demo'
REF_MP4 = os.path.join(REF_DEMO_DP, 'teaduck2.mp4')


@pytest.mark.skipif(not os.path.exists(REF_MP4), reason='reference demo media absent')
def test_reference_teaduck_mask_discovery():
    '''The actual annotation filenames (teaduck2_15_query.png, _195_snitch, _75/_135_occl)
    parse into the right timestamp maps with binary single-channel masks.'''
    q = load_timestamped_named_mask_files(REF_DEMO_DP, 'teaduck2.mp4', 'query', 200)
    assert list(q.keys()) == [15]
    s = load_timestamped_named_mask_files(REF_DEMO_DP, 'teaduck2.mp4', 'snitch', 200)
    assert list(s.keys()) == [195]
    o = load_timestamped_named_mask_files(REF_DEMO_DP, 'teaduck2.mp4', 'occl', 200)
    assert sorted(o.keys()) == [75, 135]
    for m in (q[15], s[195], o[75], o[135]):
        assert m.shape[-1] == 1 and m.dtype == np.uint8
        assert m.max() == 1 and m.min() == 0 and m.sum() > 0


@pytest.mark.skipif(not os.path.exists(REF_MP4), reason='reference demo media absent')
def test_reference_teaduck_dataset_items():
    '''Real 200-frame 640x480 video through the plugin dataset: usage modes must place
    the query at the clip's query position, cover the annotated far-horizon snitch frame
    (195) in at least one mode, and emit the standard sparse-target item schema.'''
    # T=19 @ stride 10 spans frames 15..195 and lands EXACTLY on all three annotations
    # (75 = slot 6, 135 = slot 12, 195 = slot 18) — the far-horizon protocol the demo
    # was annotated for (annotations 60 frames apart, strides capped at 10).
    T = 19
    ds = PluginVideoDataset(REF_MP4, None, 'test', num_clip_frames=T, frame_height=48,
                            frame_width=64, query_time=0.0, prefetch=True,
                            center_crop=True)
    assert len(ds.usage_modes) > 0
    for start, stride, cov in ds.usage_modes:
        assert start + ds.query_time_idx * stride == 15
    covering = [i for i, (st, sd, cov) in enumerate(ds.usage_modes)
                if sd == 10]
    assert covering, 'stride-10 usage mode missing'
    i10 = covering[0]
    assert ds.usage_modes[i10][2] == pytest.approx(3 / T)  # all 3 annotations on-grid
    item = ds[i10]
    assert item['source_name'] == 'plugin'
    assert item['rgb'].shape == (3, T, 48, 64)
    assert item['query'].shape == (1, T, 48, 64)
    assert item['target'].shape == (3, T, 48, 64)
    qpf = item['query'][0].reshape(T, -1).sum(axis=1)
    assert qpf[0] > 0 and (qpf[1:] == 0).all()
    snitch_ann = (item['target'][0] >= 0).reshape(T, -1).any(axis=-1)
    assert snitch_ann[18] and (item['target'][0, 18] > 0.5).any(), 'snitch @195 empty'
    occl_ann = (item['target'][1] >= 0).reshape(T, -1).any(axis=-1)
    assert occl_ann[6] and occl_ann[12], 'occluder annotations @75/@135 not mapped'

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

'''
Edge-path coverage: phase-subdirectory dataset layout, PrefetchLoader error propagation,
checkpoint resolution by epoch, and txt data-path expansion.
'''

import os

import numpy as np
import pytest

import conftest  # noqa: F401
from tcow_tpu.data import synthetic, data_utils
from tcow_tpu.data.factory import PrefetchLoader
from tcow_tpu.data.kubric import KubricQueryDataset
from tcow_tpu.train import checkpoint as ckpt_lib


def test_kubric_phase_subdirectories(tmp_path):
    '''The reference expects <root>/{train,val,test}/ when present (data_kubric.py:60-78).'''
    for phase, n in (('train', 2), ('val', 1), ('test', 1)):
        synthetic.write_synthetic_kubric_dataset(str(tmp_path / phase), num_scenes=n,
                                                 seed=7, T=8, H=48, W=64, K=3)
    for phase, n in (('train', 2), ('val_aug', 1), ('test', 1)):
        ds = KubricQueryDataset(str(tmp_path), None, phase, num_frames=6, frame_height=32,
                                frame_width=48, max_delay=2, num_queries=1, max_objects=6)
        assert len(ds) == n, phase
        item = ds[0]
        assert item['rgb'].shape[1] == 6


class _BoomDataset:
    def __len__(self):
        return 4

    def __getitem__(self, i):
        if i == 2:
            raise RuntimeError('boom')
        return {'x': np.zeros(3)}


def test_prefetch_loader_propagates_errors():
    loader = PrefetchLoader(_BoomDataset(), batch_size=2, collate_fn=lambda items: items,
                            shuffle=False, drop_last=False, num_workers=2)
    with pytest.raises(RuntimeError, match='boom'):
        list(loader)


def test_resolve_resume_by_epoch(tmp_path):
    d = tmp_path / 'exp1'
    os.makedirs(d)
    for fn in ('checkpoint.npz', 'model_2.npz', 'model_4.npz'):
        (d / fn).write_bytes(b'x')
    assert ckpt_lib.resolve_resume_path(str(tmp_path), 'exp1').endswith('checkpoint.npz')
    assert ckpt_lib.resolve_resume_path(str(tmp_path), 'exp1', epoch=4).endswith(
        'model_4.npz')
    with pytest.raises(FileNotFoundError):
        ckpt_lib.resolve_resume_path(str(tmp_path), 'nope')


def test_txt_data_path_expansion(tmp_path):
    v1 = tmp_path / 'a.mp4'
    v1.write_bytes(b'')
    lst = tmp_path / 'videos.txt'
    lst.write_text('# comment\na.mp4\n')
    out = data_utils.get_data_paths_from_args([str(lst), '/other/dir'])
    assert out == [str(v1), '/other/dir']

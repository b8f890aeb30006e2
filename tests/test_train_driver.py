'''
End-to-end training driver test: synthetic kubric dataset on disk -> config -> driver.main
(2 tiny epochs incl. validation + checkpointing + resume) on the 8-device CPU mesh.
'''

import os
import types

import numpy as np
import pytest

import conftest
from tcow_tpu.data import synthetic


@pytest.fixture(scope='module')
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('kubric_synth')
    synthetic.write_synthetic_kubric_dataset(str(root), num_scenes=4, seed=11,
                                             T=8, H=48, W=64, K=4)
    return str(root)


def make_args(synth_root, tmp_path, name='tdrv1', resume=''):
    from tcow_tpu import config as config_lib
    argv = ['--name', name, '--data_path', synth_root,
            '--checkpoint_root', str(tmp_path / 'checkpoints'),
            '--log_root', str(tmp_path / 'logs'),
            '--batch_size', '2', '--num_queries', '2', '--num_frames', '6',
            '--frame_height', '32', '--frame_width', '48', '--kubric_max_delay', '2',
            '--num_epochs', '2', '--val_every', '1', '--do_val_aug', '1',
            '--tracker_pretrained', '0', '--network_depth', '2', '--num_workers', '2',
            '--compute_dtype', 'float32', '--seed', '3']
    if resume:
        argv += ['--resume', resume]
    return config_lib.train_args(argv)


@pytest.fixture(scope='module')
def tiny_preset():
    from tcow_tpu.models import timesformer as tsf
    old = dict(tsf.DEPTH_PRESETS)
    tsf.DEPTH_PRESETS[2] = (32, 4)
    yield
    tsf.DEPTH_PRESETS.clear()
    tsf.DEPTH_PRESETS.update(old)


def test_driver_trains_and_resumes(synth_root, tmp_path, tiny_preset):
    from tcow_tpu.train import driver
    from tcow_tpu.utils.logvis import MyLogger

    args = make_args(synth_root, tmp_path)
    logger = MyLogger(args, context='train')
    state = driver.main(args, logger)
    assert int(np.asarray(state.step)) == 2 * 2  # 4 scenes / batch 2 = 2 steps x 2 epochs

    ckpt_dir = os.path.join(str(tmp_path / 'checkpoints'), 'tdrv1')
    assert os.path.exists(os.path.join(ckpt_dir, 'checkpoint.npz'))
    assert os.path.exists(os.path.join(ckpt_dir, 'checkpoint_epoch.txt'))
    with open(os.path.join(ckpt_dir, 'checkpoint_epoch.txt')) as f:
        assert int(f.read()) == 1

    # Resume into a new run (bootstrap mode, args.py:308-312): starts at epoch 2 == done.
    args2 = make_args(synth_root, tmp_path, name='tdrv1', resume='tdrv1')
    logger2 = MyLogger(args2, context='train')
    state2 = driver.main(args2, logger2)
    assert int(np.asarray(state2.step)) == int(np.asarray(state.step))  # nothing left to do

    # args txt + log file written
    assert os.path.exists(os.path.join(str(tmp_path / 'logs'), 'tdrv1', 'args_train.txt'))

'''
Config surface tests: every CLI flag of the reference (args.py) must be accepted by our
parsers (BASELINE.json: "Public CLI surface ... preserved so existing Kubric/Rubric
benchmarks run unchanged"), plus the verify_args derivations.
'''

import os
import re

import pytest

import conftest
from tcow_tpu import config as config_lib

REF_ARGS = os.path.join(conftest.REFERENCE_ROOT, 'args.py')


def _ref_flags(section_start, section_end):
    with open(REF_ARGS) as f:
        src = f.read()
    body = src[src.index(section_start):src.index(section_end)]
    return set(re.findall(r"add_argument\('(--[\w]+)'", body))


@pytest.mark.skipif(not os.path.exists(REF_ARGS), reason='reference unavailable')
def test_train_flags_superset():
    ref = _ref_flags('def shared_args', 'def test_args')
    parser_actions = config_lib.train_args.__wrapped__ if False else None
    # Parse with all reference flags set to their defaults-compatible values.
    ours = set()
    import argparse
    p = argparse.ArgumentParser()
    config_lib.shared_args(p)
    for a in p._actions:
        ours.update(a.option_strings)
    # train-specific
    args = config_lib.train_args(['--data_path', '/tmp', '--name', ''])
    for flag in ref:
        assert flag.lstrip('-') in vars(args), f'missing reference train flag {flag}'


@pytest.mark.skipif(not os.path.exists(REF_ARGS), reason='reference unavailable')
def test_test_flags_superset(tmp_path):
    ref = _ref_flags('def test_args', 'def verify_args')
    args = config_lib.test_args(['--data_path', '/tmp', '--name', ''])
    for flag in ref:
        assert flag.lstrip('-') in vars(args), f'missing reference test flag {flag}'


def test_verify_args_derivations(tmp_path):
    args = config_lib.train_args([
        '--data_path', '/tmp', '--name', 'dfoo',
        '--checkpoint_root', str(tmp_path / 'c'), '--log_root', str(tmp_path / 'l')])
    assert args.is_debug  # name starts with 'd' (args.py:264)
    assert args.wandb_group == 'train_debug'
    assert args.log_path == args.train_log_path
    assert os.path.isdir(args.checkpoint_path)

    args2 = config_lib.train_args([
        '--data_path', '/tmp', '--name', 'v1',
        '--checkpoint_root', str(tmp_path / 'c'), '--log_root', str(tmp_path / 'l')])
    assert not args2.is_debug
    assert args2.wandb_group == 'train'


def test_train_resume_without_name_continues_same_experiment(tmp_path):
    # `train.py --resume X` (no --name) continues experiment X: the name defaults to the
    # resumed run so resume resolution happens (the reference leaves args.resume as the
    # bare tag in this case, and the driver would crash opening it as a path).
    croot, lroot = tmp_path / 'c', tmp_path / 'l'
    (croot / 'v1').mkdir(parents=True)
    (croot / 'v1' / 'checkpoint.npz').write_bytes(b'')
    args = config_lib.train_args([
        '--data_path', '/tmp', '--resume', 'v1',
        '--checkpoint_root', str(croot), '--log_root', str(lroot)])
    assert args.name == 'v1'
    assert args.resume == str(croot / 'v1' / 'checkpoint.npz')
    assert args.checkpoint_path == str(croot / 'v1')


def test_test_args_batch_follows_device_batch():
    # The reference forces test batch_size to 1 (args.py:276 — a torch-memory artifact).
    # Here K clips share one device step; --batch_size is overridden by
    # --test_device_batch, and per-clip protocol equality is tested in test_eval.py.
    args = config_lib.test_args(['--data_path', '/tmp', '--name', '', '--batch_size', '9'])
    assert args.batch_size == args.test_device_batch == 4
    args1 = config_lib.test_args(['--data_path', '/tmp', '--name', '',
                                  '--test_device_batch', '1'])
    assert args1.batch_size == 1


def test_seeker_args_schema():
    args = config_lib.train_args(['--data_path', '/tmp', '--name', ''])
    sa = config_lib.build_seeker_args(args)
    # Exact key set of the reference checkpoint payload (train.py:186-206), plus this
    # repo's temporal_rope / rope_time_coords extensions (absent keys default off when
    # loading reference checkpoints — seeker_config_from_args).
    assert set(sa.keys()) == {
        'num_total_frames', 'num_visible_frames', 'frame_height', 'frame_width',
        'tracker_pretrained', 'attention_type', 'patch_size', 'causal_attention',
        'norm_embeddings', 'drop_path_rate', 'network_depth', 'track_map_stride',
        'track_map_resize', 'query_channels', 'output_channels', 'flag_channels',
        'temporal_rope', 'rope_time_coords'}
    assert sa['output_channels'] == 3 and sa['flag_channels'] == 3

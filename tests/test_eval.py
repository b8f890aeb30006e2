'''
End-to-end evaluation: checkpoint -> eval/test.py driver on (a) synthetic kubric scenes and
(b) the demo plugin clip -> itemized CSV -> pick_represent aggregation.
'''

import os

import numpy as np
import pandas as pd
import pytest

import conftest
from tcow_tpu.data import synthetic


@pytest.fixture(scope='module')
def tiny_preset():
    from tcow_tpu.models import timesformer as tsf
    old = dict(tsf.DEPTH_PRESETS)
    tsf.DEPTH_PRESETS[2] = (32, 4)
    yield
    tsf.DEPTH_PRESETS.clear()
    tsf.DEPTH_PRESETS.update(old)


@pytest.fixture(scope='module')
def trained_ckpt(tmp_path_factory, tiny_preset):
    '''Writes a tiny self-describing checkpoint without running full training.'''
    import jax
    from tcow_tpu.models import mask_tracker
    from tcow_tpu.models.mask_tracker import SeekerConfig
    from tcow_tpu.train import checkpoint as ckpt_lib
    root = tmp_path_factory.mktemp('ckpts')
    seeker_args = dict(num_total_frames=6, frame_height=32, frame_width=48, patch_size=16,
                       attention_type='divided_space_time', causal_attention=1,
                       norm_embeddings=False, drop_path_rate=0.1, network_depth=2,
                       track_map_stride=4, track_map_resize='bilinear', query_channels=1,
                       output_channels=3, flag_channels=3, tracker_pretrained='0')
    dset_args = dict(num_frames=6, frame_height=32, frame_width=48, frame_rate=12,
                     frame_stride=1, max_delay=2, use_data_frac=1.0, augs_2d=True,
                     num_queries=1, query_time=0.0, max_objects=6, front_occl_thres=0.95,
                     outer_cont_thres=0.75, reverse_prob=0.1, palindrome_prob=0.1)
    cfg = SeekerConfig(num_total_frames=6, frame_height=32, frame_width=48,
                       causal_attention=1, drop_path_rate=0.0, network_depth=2)
    params = mask_tracker.init_params(jax.random.key(0), cfg)
    d = os.path.join(str(root), 'tev1')
    ckpt_lib.save_checkpoint(d, epoch=0, name='tev1', params=params,
                             train_args={'seed': 900, 'num_frames': 6},
                             dset_args={'kubric': dset_args}, seeker_args=seeker_args)
    return str(root)


@pytest.fixture(scope='module')
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('kub_eval')
    synthetic.write_synthetic_kubric_dataset(str(root), num_scenes=2, seed=21,
                                             T=10, H=48, W=64, K=4)
    return str(root)


def run_eval(trained_ckpt, tmp_path, data_paths, name, extra_argv=()):
    from tcow_tpu import config as config_lib
    from tcow_tpu.evaluation import test_driver
    from tcow_tpu.utils.logvis import MyLogger
    argv = ['--resume', 'tev1', '--name', name, '--data_path'] + data_paths + \
        ['--checkpoint_root', trained_ckpt, '--log_root', str(tmp_path / 'logs'),
         '--num_queries', '1', '--num_workers', '1', '--compute_dtype', 'float32',
         '--avoid_wandb', '2'] + list(extra_argv)
    test_args = config_lib.test_args(argv)
    logger = MyLogger(test_args, context='test_' + test_args.name)
    weighted, unweighted, df = test_driver.main(test_args, logger)
    return test_args, weighted, unweighted, df


def test_eval_kubric_and_pick_represent(trained_ckpt, synth_root, tmp_path, tiny_preset):
    test_args, weighted, unweighted, df = run_eval(trained_ckpt, tmp_path, [synth_root],
                                                   'ev_kub')
    assert len(df) == 2  # two scenes -> two per-clip rows (one padded device batch)
    assert weighted['count_snitch_iou'] > 0
    assert 0.0 <= weighted['mean_snitch_iou'] <= 1.0
    csv_fp = os.path.join(test_args.log_path, 'itemized_results.csv')
    assert os.path.exists(csv_fp)
    out_df = pd.read_csv(csv_fp)
    assert 'friendly_short_name' in out_df.columns
    assert 'mean_snitch_iou' in out_df.columns

    # pick_represent over the itemized CSV.
    from tcow_tpu.evaluation import pick_represent
    from tcow_tpu.utils.logvis import Logger
    guide_fp = str(tmp_path / 'guide_kub.txt')
    with open(guide_fp, 'w') as f:
        f.write('# synthetic scenes\nscn0000\n')
    out_dir = str(tmp_path / 'represent')
    my_args = pick_represent.get_args(
        ['--testres_path', test_args.log_path, '--represent_guide', guide_fp,
         '--output_dir', out_dir])
    summary = pick_represent.main(my_args, Logger(context='pickrep'))
    assert len(summary) == 1
    assert summary.iloc[0]['num_examples'] == 2
    assert os.path.exists(os.path.join(out_dir, '_autosmr_0.csv'))
    # weighted means must agree with the full eval (guide selected everything)
    assert np.isclose(summary.iloc[0]['weighted_mean_snitch_iou'],
                      weighted['mean_snitch_iou'])


def test_eval_kubric_batched_matches_single(trained_ckpt, tmp_path, tiny_preset):
    '''--test_device_batch K stacks K clips per device step; every per-clip CSV row must
    match the batch-1 protocol (per-example losses/metrics inside the jitted step), and a
    5-scene set over K=2 exercises the padded tail batch (VERDICT round 2, task 2).'''
    root = tmp_path / 'kub5'
    synthetic.write_synthetic_kubric_dataset(str(root), num_scenes=5, seed=33,
                                             T=10, H=48, W=64, K=4)
    _, w1, _, df1 = run_eval(trained_ckpt, tmp_path, [str(root)], 'ev_b1',
                             extra_argv=['--test_device_batch', '1'])
    _, w2, _, df2 = run_eval(trained_ckpt, tmp_path, [str(root)], 'ev_b2',
                             extra_argv=['--test_device_batch', '2'])
    assert len(df1) == len(df2) == 5
    assert list(df1['scene_dn']) == list(df2['scene_dn'])
    num_cols = [c for c in df1.columns
                if c.startswith(('mean_', 'count_', 'loss_'))]
    for c in num_cols:
        np.testing.assert_allclose(np.asarray(df2[c], np.float64),
                                   np.asarray(df1[c], np.float64),
                                   rtol=1e-4, atol=1e-5, err_msg=c)
    np.testing.assert_allclose(w2['mean_snitch_iou'], w1['mean_snitch_iou'], rtol=1e-4)


def test_prefetch_loader_start_ahead(synth_root):
    '''start_ahead pre-stages an epoch's batches; the next matching iteration consumes
    them, a mismatched iteration (different epoch) tears the stale producer down and
    yields the right epoch's batches.'''
    import time as time_lib
    from tcow_tpu.data import factory

    class _Items:
        def __len__(self):
            return 6

        def __getitem__(self, i):
            return {'v': np.full((2,), i, np.int64)}

    collate = lambda items: {'v': np.stack([it['v'] for it in items])}
    loader = factory.PrefetchLoader(_Items(), 2, collate, shuffle=True, drop_last=False,
                                    num_workers=1, seed=5)
    loader.set_epoch(3)
    want = [b['v'].copy() for b in loader.iter_batches(0)]

    loader.start_ahead(3, prefetch_depth=8)
    time_lib.sleep(0.3)  # give the producer time to stage everything
    got = [b['v'].copy() for b in loader.iter_batches(0)]
    for a, b in zip(want, got):
        np.testing.assert_array_equal(a, b)

    # Stale ahead (epoch 0 staged, epoch 1 consumed) must not leak epoch-0 batches.
    loader.start_ahead(0, prefetch_depth=8)
    loader.set_epoch(1)
    fresh = [b['v'].copy() for b in loader.iter_batches(0)]
    loader.set_epoch(1)
    want1 = [b['v'].copy() for b in loader.iter_batches(0)]
    for a, b in zip(want1, fresh):
        np.testing.assert_array_equal(a, b)


def test_eval_plugin_demo(trained_ckpt, tmp_path, tiny_preset):
    demo_mp4 = os.path.join(conftest.REPO_ROOT, 'demo', 'rollball.mp4')
    if not os.path.exists(demo_mp4):
        pytest.skip('demo assets missing')
    test_args, weighted, unweighted, df = run_eval(trained_ckpt, tmp_path, [demo_mp4],
                                                   'ev_plug')
    assert len(df) > 1  # multiple usage modes
    assert (df['source'] == 'plugin').all()
    # Untrained net on annotated frames: counts present, ious within range.
    assert weighted['count_snitch_iou'] >= 0


def test_eval_plugin_streaming(trained_ckpt, tmp_path, tiny_preset):
    '''--stream_window: windowed KV-cached streaming over EVERY video frame instead of
    usage-mode clip subsampling; one retval per video, scored at annotated frames.'''
    from tcow_tpu import config as config_lib
    from tcow_tpu.evaluation import test_driver
    from tcow_tpu.utils.logvis import MyLogger
    demo_mp4 = os.path.join(conftest.REPO_ROOT, 'demo', 'rollball.mp4')
    if not os.path.exists(demo_mp4):
        pytest.skip('demo assets missing')
    argv = ['--resume', 'tev1', '--name', 'ev_stream', '--data_path', demo_mp4,
            '--checkpoint_root', trained_ckpt, '--log_root', str(tmp_path / 'logs'),
            '--num_queries', '1', '--num_workers', '1', '--compute_dtype', 'float32',
            '--avoid_wandb', '2', '--stream_window', '6']
    test_args = config_lib.test_args(argv)
    logger = MyLogger(test_args, context='test_' + test_args.name)
    weighted, unweighted, df = test_driver.main(test_args, logger)
    assert len(df) == 1  # ONE row per video (full coverage), not one per usage mode
    assert (df['source'] == 'plugin').all()
    # All annotated target frames are scored (the clip protocol can only cover a subset).
    assert weighted['count_snitch_iou'] >= 2
    assert 0.0 <= weighted['mean_snitch_iou'] <= 1.0
    assert df.iloc[0]['friendly_short_name'].endswith('_s0')  # stride 0 = streaming marker


def test_streaming_eval_rejects_noncausal(trained_ckpt, tiny_preset):
    '''Streaming requires causal_attention=1; anything else must fail fast and clearly.'''
    import dataclasses
    import jax
    from tcow_tpu.evaluation import inference as inference_lib
    from tcow_tpu.objectives.losses import LossConfig
    params, cfg, *_ = inference_lib.load_networks(
        os.path.join(trained_ckpt, 'tev1'), None)
    engine = inference_lib.InferenceEngine(
        params, dataclasses.replace(cfg, causal_attention=0), LossConfig(), 1)
    with pytest.raises(ValueError, match='causal_attention=1'):
        engine.run_plugin_stream({'rgb': None, 'query': None, 'target': None,
                                  'annotated_inds': []}, window=6)

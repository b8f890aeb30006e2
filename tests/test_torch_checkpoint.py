'''
Cross-framework checkpoint loading: a reference-format .pth checkpoint (torch state dict
with tracker_backbone.timesformer.model.* keys + train_args/dset_args/seeker_args payload,
train.py:269-304) must load into this framework and drive evaluation end-to-end, with the
loaded forward matching the torch weights numerically.
'''

import os

import numpy as np
import pytest

import conftest
from tcow_tpu.models import mask_tracker as mt


@pytest.fixture(scope='module')
def reference_pth(tmp_path_factory):
    if not conftest.has_reference():
        pytest.skip('reference unavailable')
    torch = pytest.importorskip('torch')
    import reference_oracle

    (H, W, T, p) = (32, 48, 6, 16)
    ref = reference_oracle.make_reference_backbone(H, W, p, 4, T, 'divided_space_time', 1,
                                                   network_depth=12)
    D = ref.model.embed_dim
    sd = {}
    for k, v in ref.model.state_dict().items():
        sd['tracker_backbone.timesformer.model.' + k] = v
    g = torch.Generator().manual_seed(0)
    sd['tracker_post_linear.weight'] = torch.randn(3 * p * p, D, generator=g) * 0.02
    sd['tracker_post_linear.bias'] = torch.zeros(3 * p * p)
    sd['flag_post_linear.weight'] = torch.randn(3, D, generator=g) * 0.02
    sd['flag_post_linear.bias'] = torch.zeros(3)

    seeker_args = dict(num_total_frames=T, num_visible_frames=T, frame_height=H,
                       frame_width=W, tracker_pretrained='0',
                       attention_type='divided_space_time', patch_size=p,
                       causal_attention=1, norm_embeddings=False, drop_path_rate=0.0,
                       network_depth=12, track_map_stride=4, track_map_resize='bilinear',
                       query_channels=1, output_channels=3, flag_channels=3)
    dset_args = {'kubric': dict(num_frames=T, frame_height=H, frame_width=W, frame_rate=12,
                                frame_stride=1, max_delay=0, use_data_frac=1.0,
                                augs_2d=False, num_queries=1, query_time=0.0,
                                max_objects=6, front_occl_thres=0.95,
                                outer_cont_thres=0.75, reverse_prob=0.0,
                                palindrome_prob=0.0)}
    ckpt = {'epoch': 4, 'train_args': {'num_frames': T, 'seed': 900},
            'dset_args': dset_args, 'seeker_args': seeker_args, 'net_seeker': sd}
    d = tmp_path_factory.mktemp('refckpt') / 'tref'
    os.makedirs(d, exist_ok=True)
    fp = str(d / 'checkpoint.pth')
    torch.save(ckpt, fp)
    return fp, ref, seeker_args


def test_pth_loads_and_matches_torch_backbone(reference_pth):
    torch = pytest.importorskip('torch')
    import reference_oracle
    from tcow_tpu.models import torch_import
    fp, ref, seeker_args = reference_pth
    params, cfg, ckpt = torch_import.load_tcow_checkpoint(fp)
    assert cfg.network_depth == 12 and cfg.causal_attention == 1
    assert ckpt['epoch'] == 4

    rng = np.random.RandomState(3)
    x = rng.randn(1, 4, 6, 32, 48).astype(np.float32)
    feats_ref, _ = reference_oracle.reference_dense_forward(ref, torch.from_numpy(x), 1)
    import jax.numpy as jnp
    from tcow_tpu.models import timesformer as tsf
    feats, _ = tsf.forward(params['backbone'], cfg.backbone_config(), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(feats), feats_ref.numpy(), rtol=1e-4, atol=1e-5)


def test_eval_cli_with_pth_resume(reference_pth, tmp_path):
    '''Full eval/test.py driver resuming from the reference-format .pth.'''
    fp, _, _ = reference_pth
    demo = os.path.join(conftest.REPO_ROOT, 'demo', 'rollball.mp4')
    if not os.path.exists(demo):
        pytest.skip('demo assets missing')
    from tcow_tpu import config as config_lib
    from tcow_tpu.evaluation import test_driver
    from tcow_tpu.utils.logvis import MyLogger
    args = config_lib.test_args([
        '--resume', fp, '--name', 'tpth', '--data_path', demo,
        '--checkpoint_root', os.path.dirname(os.path.dirname(fp)),
        '--log_root', str(tmp_path / 'logs'), '--num_queries', '1',
        '--num_workers', '1', '--compute_dtype', 'float32', '--avoid_wandb', '2'])
    logger = MyLogger(args, context='test_tpth')
    weighted, unweighted, df = test_driver.main(args, logger)
    assert len(df) > 0
    assert os.path.exists(os.path.join(args.log_path, 'itemized_results.csv'))


def test_train_bootstrap_from_pth(reference_pth, tmp_path):
    '''--resume <ref .pth> --name <new>: fine-tune a reference checkpoint into a fresh run
    (bootstrap mode, args.py:308-312).'''
    from tcow_tpu.data import synthetic
    from tcow_tpu import config as config_lib
    from tcow_tpu.train import driver
    from tcow_tpu.utils.logvis import MyLogger
    fp, _, _ = reference_pth
    root = tmp_path / 'kub'
    synthetic.write_synthetic_kubric_dataset(str(root), num_scenes=2, seed=51,
                                             T=8, H=48, W=64, K=4)
    args = config_lib.train_args([
        '--name', 'boot1', '--data_path', str(root), '--resume', fp,
        '--checkpoint_root', str(tmp_path / 'ck'), '--log_root', str(tmp_path / 'lg'),
        '--batch_size', '2', '--num_queries', '1', '--num_frames', '6',
        '--frame_height', '32', '--frame_width', '48', '--kubric_max_delay', '2',
        '--num_epochs', '6', '--do_val_aug', '0', '--tracker_pretrained', '0',
        '--network_depth', '12', '--num_workers', '1', '--compute_dtype', 'float32',
        '--seed', '4', '--allow_opt_reinit', '1'])
    logger = MyLogger(args, context='train')
    state = driver.main(args, logger)
    # Resumed at epoch 5 (ckpt epoch 4 + 1): only one epoch of steps ran.
    assert int(np.asarray(state.step)) == 1

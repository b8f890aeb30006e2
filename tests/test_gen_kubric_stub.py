'''
Executes the REAL Kubric exporters (tcow_tpu/gen_kubric/export_kub_{rand,cont}.py +
kubric_sim.py) against the pure-numpy stub backend (stub_backend/), then feeds the
generated scenes through the real dataset reader and a jitted train step.

This validates, without Blender/pybullet: exporter control flow (settle / perturb-view
multiplicity via saveState/restoreState, resume markers), the divided per-instance
re-render loop (/root/reference/gen_kubric/kubric_sim.py:618-672 semantics: scales zeroed
and restored, VALO ordering), the on-disk file layout + hue-palette codec round-trip, and
the generation -> annotation -> training hand-off.
'''

import json
import os
import sys

import numpy as np
import pytest

import conftest  # noqa: F401

STUB_DP = os.path.join(conftest.REPO_ROOT, 'tcow_tpu', 'gen_kubric', 'stub_backend')


@pytest.fixture()
def stub_backend():
    '''Makes the stub kubric/pybullet/bpy importable, and fully unloads them afterwards so
    test_gen_kubric.py::test_sim_import_gate still sees a kubric-free interpreter.'''
    sys.path.insert(0, STUB_DP)
    try:
        yield
    finally:
        sys.path.remove(STUB_DP)
        for name in list(sys.modules):
            if name == 'kubric' or name.startswith('kubric.') or \
                    name in ('pybullet', 'bpy'):
                del sys.modules[name]


def _rand_args(root_dp, num_scenes=2, **kw):
    base = dict(num_workers=0, frame_width=96, frame_height=72, num_frames=8,
                min_static=3, max_static=5, min_dynamic=2, max_dynamic=3)
    base.update(kw)
    argv = ['--sim_backend', 'stub', '--root_dp', str(root_dp),
            '--num_scenes', str(num_scenes)]
    for k, v in base.items():
        argv += [f'--{k}', str(v)]
    return argv


def test_export_kub_rand_stub_to_reader(stub_backend, tmp_path):
    from tcow_tpu.gen_kubric import export_kub_rand
    root = tmp_path / 'kub'
    export_kub_rand.main(_rand_args(root, num_scenes=2))

    scene_dns = sorted(dn for dn in os.listdir(root) if 'scn' in dn)
    assert len(scene_dns) == 2
    md = json.load(open(root / scene_dns[0] / f'{scene_dns[0]}.json'))
    K = md['scene']['num_valo_instances']
    T = md['scene']['num_frames']
    assert K >= 3 and T == 8
    assert len(md['instances']) >= K
    assert len(md['camera']['positions']) == T
    assert len(md['instances'][0]['bboxes_3d']) == T
    frames = os.listdir(root / scene_dns[0] / 'frames')
    assert sum(f.startswith('divided_segmentation_') for f in frames) == K * T

    # Resume: a second run with ignore_if_exist skips both scenes (completion markers).
    export_kub_rand.main(_rand_args(root, num_scenes=2))

    from tcow_tpu.data.kubric import KubricQueryDataset, collate_kubric
    ds = KubricQueryDataset(str(root), None, 'train', num_frames=6, frame_height=48,
                            frame_width=64, num_queries=1, use_cache=False)
    items = [ds[i] for i in range(2)]
    for it in items:
        assert it['retries'] == 0
        K = int(it['inst_count'])
        assert K >= 3
        assert (it['desirability'][:K, 0] > 0.0).sum() >= 1
    batch = collate_kubric(items, 1, 'train', rng=np.random.default_rng(0))
    assert batch['query_inds'].shape == (2, 1)


def test_export_kub_rand_stub_perturbs_views(stub_backend, tmp_path):
    '''Exercises the pybullet saveState/restoreState perturbation loop and the multi-view
    camera-yaw loop; variants must share object identity but differ in pixels.'''
    import cv2
    from tcow_tpu.gen_kubric import export_kub_rand
    root = tmp_path / 'kubpv'
    export_kub_rand.main(_rand_args(
        root, num_scenes=1, num_perturbs=2, num_views=2,
        perturbs_first_scenes=1, views_first_scenes=1))
    scene_dp = root / 'kubpv_scn00000'
    variants = sorted(dn for dn in os.listdir(scene_dp) if dn.startswith('frames_'))
    assert variants == ['frames_p0_v0', 'frames_p0_v1', 'frames_p1_v0', 'frames_p1_v1']
    for suffix in ('p0_v0', 'p1_v1'):
        assert (scene_dp / f'kubpv_scn00000_{suffix}.json').exists()
    a = cv2.imread(str(scene_dp / 'frames_p0_v0' / 'rgba_00004.png'))
    b = cv2.imread(str(scene_dp / 'frames_p0_v1' / 'rgba_00004.png'))
    assert a.shape == b.shape and not np.array_equal(a, b)

    # The reader accepts the multi-variant layout via the frames_p0_v0 fallback.
    from tcow_tpu.data.kubric import KubricQueryDataset
    ds = KubricQueryDataset(str(root), None, 'train', num_frames=6, frame_height=48,
                            frame_width=64, num_queries=1, use_cache=False)
    assert ds[0]['retries'] == 0


def test_export_kub_cont_stub_scene_types(stub_backend, tmp_path):
    from tcow_tpu.gen_kubric import export_kub_cont
    root = tmp_path / 'kubcont'
    export_kub_cont.main([
        '--sim_backend', 'stub', '--root_dp', str(root),
        '--scene_types', 'fall_into_container', 'box_push_container_slide',
        '--num_scenes_per_type', '1', '--num_workers', '0',
        '--frame_width', '96', '--frame_height', '72', '--num_frames', '8'])
    dns = sorted(os.listdir(root))
    assert any('fall_into_container' in dn for dn in dns)
    assert any('box_push_container_slide' in dn for dn in dns)
    md = json.load(open(root / dns[0] / f'{dns[0]}.json'))
    assert md['scene_type'] in ('fall_into_container', 'box_push_container_slide')


def test_divided_rerender_semantics(stub_backend, tmp_path):
    '''The subtle piece (kubric_sim.py:618-672): K solo re-renders with all other scales
    zeroed; amodal masks must be supersets of the visible pixels, scales restored, and the
    VALO ordering must be by descending total visibility.'''
    from tcow_tpu.gen_kubric.kubric_sim import KubricSimulatorRenderer

    class _L:
        def info(self, *a):
            pass

        warning = error = info

    sim = KubricSimulatorRenderer(_L(), frame_width=96, frame_height=72, num_frames=6,
                                  motion_blur=False, render_samples_per_pixel=1,
                                  scratch_dir=str(tmp_path))
    sim.prepare_next_scene('train', 1234)
    sim.insert_static_objects(min_count=3, max_count=3, force_containers=1,
                              force_carriers=1)
    sim.simulate_frames(-30, -1)
    sim.reset_objects_velocity_friction_restitution()
    sim.insert_dynamic_objects(min_count=2, max_count=2)
    sim.simulate_frames(0, 6)
    data_stack, _ = sim.render_frames(0, 5)

    vis_totals = [int(np.sum(a.metadata['visibility'])) for a in sim.sorted_fg_assets]
    assert vis_totals == sorted(vis_totals, reverse=True)
    K = len(sim.sorted_valo_fg_assets)
    assert K >= 2
    scales_before = [a.scale for a in sim.sorted_valo_fg_assets]

    div_data, _ = sim.render_frames_divided_objects(0, 5)
    assert [a.scale for a in sim.sorted_valo_fg_assets] == scales_before
    seg = data_stack['segmentation'][..., 0]           # (T, H, W) visible, VALO ids
    div = div_data['segmentation'][..., 0, :]          # (T, H, W, K) solo renders
    for k in range(K):
        visible = seg == k + 1
        amodal = div[..., k] > 0
        assert not np.any(visible & ~amodal), f'visible pixels outside amodal mask, k={k}'
        assert amodal.sum() >= visible.sum()


def test_stub_scenes_train(stub_backend, tmp_path):
    '''Full hand-off: stub-generated scenes -> reader -> collate -> one jitted train step.'''
    import jax
    import jax.numpy as jnp
    from tcow_tpu.gen_kubric import export_kub_rand
    from tcow_tpu.data.kubric import KubricQueryDataset, collate_kubric
    from tcow_tpu.models import timesformer as tsf
    from tcow_tpu.models.mask_tracker import SeekerConfig
    from tcow_tpu.objectives.losses import LossConfig
    from tcow_tpu.train import optim, step as step_lib

    root = tmp_path / 'kubtrain'
    export_kub_rand.main(_rand_args(root, num_scenes=2))
    ds = KubricQueryDataset(str(root), None, 'train', num_frames=4, frame_height=32,
                            frame_width=32, num_queries=2, max_objects=16,
                            use_cache=False)
    batch = collate_kubric([ds[0], ds[1]], 2, 'train', rng=np.random.default_rng(0))

    old = dict(tsf.DEPTH_PRESETS)
    tsf.DEPTH_PRESETS[2] = (32, 4)
    try:
        seeker = SeekerConfig(num_total_frames=4, frame_height=32, frame_width=32,
                              causal_attention=1, drop_path_rate=0.0, network_depth=2)
        cfg = step_lib.StepConfig(seeker=seeker, loss=LossConfig(), num_queries=2)
        tx = optim.make_optimizer('adamw', learn_rate=1e-3, num_epochs=2,
                                  steps_per_epoch=2)
        state = step_lib.init_train_state(jax.random.key(0), cfg, tx)
        train_step = jax.jit(step_lib.make_train_step(cfg, tx))
        state, aux = train_step(state, {k: jnp.asarray(v) for k, v in batch.items()},
                                jnp.float32(0.0))
        assert np.isfinite(float(aux['total_seeker']))
        assert float(aux['skipped_nonfinite']) == 0.0
    finally:
        tsf.DEPTH_PRESETS.clear()
        tsf.DEPTH_PRESETS.update(old)


def test_eval_cli_on_stub_containers_benchmark(stub_backend, tmp_path):
    '''BASELINE.json config #2 end-to-end without Blender: export_kub_cont (stub backend)
    generates a Kubric-Containers-style benchmark, and the REAL eval driver scores it
    (checkpoint -> test protocol -> itemized CSV + weighted/unweighted aggregates).'''
    import jax
    from tcow_tpu import config as config_lib
    from tcow_tpu.evaluation import test_driver
    from tcow_tpu.gen_kubric import export_kub_cont
    from tcow_tpu.models import mask_tracker
    from tcow_tpu.models import timesformer as tsf
    from tcow_tpu.models.mask_tracker import SeekerConfig
    from tcow_tpu.train import checkpoint as ckpt_lib
    from tcow_tpu.utils.logvis import MyLogger

    root = tmp_path / 'kubcont_bench'
    export_kub_cont.main([
        '--sim_backend', 'stub', '--root_dp', str(root),
        '--scene_types', 'fall_into_container', 'box_push_container_slide',
        '--num_scenes_per_type', '1', '--num_workers', '0',
        '--frame_width', '96', '--frame_height', '72', '--num_frames', '10'])

    old = dict(tsf.DEPTH_PRESETS)
    tsf.DEPTH_PRESETS[2] = (32, 4)
    try:
        seeker_args = dict(num_total_frames=6, frame_height=32, frame_width=48,
                           patch_size=16, attention_type='divided_space_time',
                           causal_attention=1, norm_embeddings=False, drop_path_rate=0.1,
                           network_depth=2, track_map_stride=4,
                           track_map_resize='bilinear', query_channels=1,
                           output_channels=3, flag_channels=3, tracker_pretrained='0')
        dset_args = dict(num_frames=6, frame_height=32, frame_width=48, frame_rate=12,
                         frame_stride=1, max_delay=2, use_data_frac=1.0, augs_2d=True,
                         num_queries=1, query_time=0.0, max_objects=16,
                         front_occl_thres=0.95, outer_cont_thres=0.75)
        cfg = SeekerConfig(num_total_frames=6, frame_height=32, frame_width=48,
                           causal_attention=1, drop_path_rate=0.0, network_depth=2)
        params = mask_tracker.init_params(jax.random.key(0), cfg)
        ckpt_root = tmp_path / 'ckpts'
        ckpt_lib.save_checkpoint(str(ckpt_root / 'cev1'), epoch=0, name='cev1',
                                 params=params, train_args={'seed': 900, 'num_frames': 6},
                                 dset_args={'kubric': dset_args},
                                 seeker_args=seeker_args)

        argv = ['--resume', 'cev1', '--name', 'ev_cont', '--data_path', str(root),
                '--checkpoint_root', str(ckpt_root), '--log_root', str(tmp_path / 'logs'),
                '--num_queries', '1', '--num_workers', '1',
                '--compute_dtype', 'float32', '--avoid_wandb', '2']
        test_args = config_lib.test_args(argv)
        logger = MyLogger(test_args, context='test_' + test_args.name)
        weighted, unweighted, df = test_driver.main(test_args, logger)
    finally:
        tsf.DEPTH_PRESETS.clear()
        tsf.DEPTH_PRESETS.update(old)

    assert len(df) == 2   # one clip per generated scene (batch 1, test protocol)
    assert weighted['count_snitch_iou'] > 0
    assert 0.0 <= weighted['mean_snitch_iou'] <= 1.0
    # Scene-type provenance survives into the itemized results.
    assert any('fall_into_container' in str(s) for s in df['scene_dn'])
    # Test results land under the trained model's log dir (reference convention:
    # eval/test.py reuses the resumed run's name for the log subtree).
    csv_fp = os.path.join(str(tmp_path / 'logs'), 'cev1',
                          'test_ev_cont_e0', 'itemized_results.csv')
    assert os.path.exists(csv_fp)

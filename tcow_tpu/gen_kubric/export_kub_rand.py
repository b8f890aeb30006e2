'''
Kubric Random training-set exporter.

Capability port of /root/reference/gen_kubric/export_kub_rand.py: N scenes of 36 frames @
480x360, 4-24 static objects (2 forced containers, 1 forced carrier) + 2-12 dynamic objects,
optional perturbation/viewpoint multiplicity via PyBullet saveState/restoreState, resumable
per-scene (metadata JSON written last as completion marker), multiprocess workers with a
restart cap against /tmp exhaustion. Module-level constants became argparse flags.

Run inside a kubric+Blender environment:
  python -m tcow_tpu.gen_kubric.export_kub_rand --root_dp /data/kubcon_v10 --num_scenes 4000
'''

import argparse
import multiprocessing as mp
import os
import time


def get_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--root_dp', required=True, type=str)
    p.add_argument('--num_scenes', default=4000, type=int)
    p.add_argument('--global_start_idx', default=0, type=int)
    p.add_argument('--num_workers', default=10, type=int)
    p.add_argument('--num_perturbs', default=3, type=int)
    p.add_argument('--num_views', default=3, type=int)
    p.add_argument('--perturbs_first_scenes', default=0, type=int)
    p.add_argument('--views_first_scenes', default=0, type=int)
    p.add_argument('--test_first_scenes', default=0, type=int)
    p.add_argument('--mass_est_fp', default=None, type=str)
    p.add_argument('--ignore_if_exist', default=1, type=int)
    p.add_argument('--seed_offset', default=32103210, type=int)
    p.add_argument('--frame_width', default=480, type=int)
    p.add_argument('--frame_height', default=360, type=int)
    p.add_argument('--num_frames', default=36, type=int)
    p.add_argument('--frame_rate', default=12, type=int)
    p.add_argument('--render_samples_per_pixel', default=32, type=int)
    p.add_argument('--min_static', default=4, type=int)
    p.add_argument('--max_static', default=24, type=int)
    p.add_argument('--min_dynamic', default=2, type=int)
    p.add_argument('--max_dynamic', default=12, type=int)
    p.add_argument('--max_scene_count', default=100, type=int,
                   help='Per-run scene budget; restart the script to empty /tmp between '
                        'runs (export_kub_rand.py:57-59).')
    p.add_argument('--sim_backend', default='kubric', choices=('kubric', 'stub'),
                   help="'kubric' needs the real kubric+Blender stack; 'stub' uses the "
                        'pure-numpy emulation in stub_backend/ (format/control-flow '
                        'validation without Blender).')
    return p.parse_args(argv)


def activate_sim_backend(backend: str):
    '''For --sim_backend stub, prepend stub_backend/ to sys.path so `import kubric`/
    `pybullet`/`bpy` resolve to the emulation (workers inherit via fork).'''
    if backend == 'stub':
        import sys
        stub_dp = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               'stub_backend')
        if stub_dp not in sys.path:
            sys.path.insert(0, stub_dp)


def do_scene(a, scene_idx, scene_dp, scene_dn, logger):
    '''One full scene in a fresh process (bpy must be imported in the owning process).'''
    # Re-activate here: mp.Process children only inherit the parent's sys.path under the
    # fork start method; spawn/forkserver children start clean.
    activate_sim_backend(a.sim_backend)
    from tcow_tpu.gen_kubric.kubric_sim import KubricSimulatorRenderer
    import pybullet as pb
    import kubric as kb

    render_cpu_threads = int(-(-mp.cpu_count() // max(a.num_workers, 2)))
    sim = KubricSimulatorRenderer(
        logger, frame_width=a.frame_width, frame_height=a.frame_height,
        num_frames=a.num_frames, frame_rate=a.frame_rate,
        render_samples_per_pixel=a.render_samples_per_pixel,
        render_cpu_threads=render_cpu_threads, mass_est_fp=a.mass_est_fp)

    os.makedirs(scene_dp, exist_ok=True)
    start_time = time.time()
    phase = 'test' if scene_idx < a.test_first_scenes else 'train'
    sim.prepare_next_scene(phase, a.seed_offset + scene_idx)
    sim.insert_static_objects(min_count=a.min_static, max_count=a.max_static,
                              force_containers=2, force_carriers=1)
    sim.simulate_frames(-60, -1)  # settle statics
    sim.reset_objects_velocity_friction_restitution()
    sim.insert_dynamic_objects(min_count=a.min_dynamic, max_count=a.max_dynamic)

    used_perturbs = a.num_perturbs if scene_idx < a.perturbs_first_scenes else 1
    used_views = a.num_views if scene_idx < a.views_first_scenes else 1
    start_yaw = sim.rng.uniform(0.0, 360.0)

    pb_state = None
    for perturb_idx in range(used_perturbs):
        if perturb_idx == 0 and used_perturbs >= 2:
            pb.setPhysicsEngineParameter(deterministicOverlappingPairs=0)
            pb_state = pb.saveState()
        elif perturb_idx >= 1:
            pb.restoreState(pb_state)
        sim.simulate_frames(-1, 0)  # refresh kubric's internal positions
        if used_perturbs >= 2:
            sim.perturb_object_positions(max_offset_meters=0.005)
        sim.simulate_frames(0, a.num_frames)

        for view_idx in range(used_views):
            yaw = view_idx * 360.0 / used_views + start_yaw
            sim.set_camera_yaw(yaw)
            sim.render_frames(0, a.num_frames - 1)
            metadata, _ = sim.get_metadata(exclude_collisions=view_idx > 0)
            sim.render_frames_divided_objects(0, a.num_frames - 1)
            suffix = f'p{perturb_idx}_v{view_idx}'
            if used_perturbs == 1 and used_views == 1:
                sim.write_all_data(os.path.join(scene_dp, 'frames'))
                dst_json = os.path.join(scene_dp, f'{scene_dn}.json')
            else:
                sim.write_all_data(os.path.join(scene_dp, f'frames_{suffix}'))
                dst_json = os.path.join(scene_dp, f'{scene_dn}_{suffix}.json')
            # Metadata is written LAST as the completion marker (export_kub_rand.py:178-181).
            kb.write_json(metadata, dst_json)
            logger.info(f'Scene {scene_dn} {suffix} done '
                        f'({time.time() - start_time:.1f}s so far)')


def marker_path(a, scene_dp, scene_dn, scene_idx):
    used_perturbs = a.num_perturbs if scene_idx < a.perturbs_first_scenes else 1
    used_views = a.num_views if scene_idx < a.views_first_scenes else 1
    if used_perturbs == 1 and used_views == 1:
        return os.path.join(scene_dp, f'{scene_dn}.json')
    return os.path.join(scene_dp, f'{scene_dn}_p{used_perturbs - 1}_v{used_views - 1}.json')


def worker(a, worker_idx, total_scn_cnt):
    from tcow_tpu.utils.logvis import Logger
    root_dn = os.path.basename(a.root_dp.rstrip('/'))
    logger = Logger(context=f'{root_dn}_worker{worker_idx}')
    for scene_idx in range(worker_idx + a.global_start_idx,
                           a.global_start_idx + a.num_scenes, max(a.num_workers, 1)):
        scene_dn = f'{root_dn}_scn{scene_idx:05d}'
        scene_dp = os.path.join(a.root_dp, scene_dn)
        if a.ignore_if_exist and os.path.exists(marker_path(a, scene_dp, scene_dn,
                                                            scene_idx)):
            logger.info(f'{scene_dn} already exists, skipping.')
            continue
        with total_scn_cnt.get_lock():
            total_scn_cnt.value += 1
            count = total_scn_cnt.value
        if count > a.max_scene_count:
            logger.warning('Reached max allowed scene count, exiting (restart to continue).')
            break
        # Fresh process per scene to contain bpy memory leaks (export_kub_rand.py:225-229).
        p = mp.Process(target=do_scene, args=(a, scene_idx, scene_dp, scene_dn, logger))
        p.start()
        p.join()


def main(argv=None):
    a = get_args(argv)
    activate_sim_backend(a.sim_backend)
    os.makedirs(a.root_dp, exist_ok=True)
    total = mp.Value('i', 0)
    if a.num_workers <= 0:
        worker(a, 0, total)
    else:
        procs = [mp.Process(target=worker, args=(a, i, total))
                 for i in range(a.num_workers)]
        for p in procs:
            p.start()
        for p in procs:
            p.join()


if __name__ == '__main__':
    main()

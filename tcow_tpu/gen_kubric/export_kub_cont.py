'''
Kubric Containers benchmark exporter.

Capability port of /root/reference/gen_kubric/export_kub_cont.py: benchmark scenes from the
named scene types (7 implemented, see scene_types.py), num_scenes_per_type each, 36 frames @
480x360, resumable + multiprocess like export_kub_rand.

Run inside a kubric+Blender environment:
  python -m tcow_tpu.gen_kubric.export_kub_cont --root_dp /data/kubbench_v3 \
      --scene_types box_push_container_slide fall_into_container
'''

import argparse
import multiprocessing as mp
import os
import time

from tcow_tpu.gen_kubric.scene_types import SCENE_TYPES


def get_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--root_dp', required=True, type=str)
    p.add_argument('--scene_types', default=list(SCENE_TYPES.keys()), type=str, nargs='+')
    p.add_argument('--num_scenes_per_type', default=30, type=int)
    p.add_argument('--num_workers', default=10, type=int)
    p.add_argument('--mass_est_fp', default=None, type=str)
    p.add_argument('--ignore_if_exist', default=1, type=int)
    p.add_argument('--seed_offset', default=3333333, type=int)
    p.add_argument('--frame_width', default=480, type=int)
    p.add_argument('--frame_height', default=360, type=int)
    p.add_argument('--num_frames', default=36, type=int)
    p.add_argument('--frame_rate', default=12, type=int)
    p.add_argument('--render_samples_per_pixel', default=32, type=int)
    p.add_argument('--max_scene_count', default=100, type=int)
    p.add_argument('--sim_backend', default='kubric', choices=('kubric', 'stub'))
    return p.parse_args(argv)


def do_scene(a, scene_idx, scene_dp, scene_dn, scene_type, logger):
    # Re-activate here: mp.Process children only inherit sys.path under fork (see
    # export_kub_rand.do_scene).
    from tcow_tpu.gen_kubric.export_kub_rand import activate_sim_backend
    activate_sim_backend(a.sim_backend)
    from tcow_tpu.gen_kubric.kubric_sim import KubricSimulatorRenderer
    from tcow_tpu.gen_kubric import scene_types as st
    import kubric as kb

    render_cpu_threads = int(-(-mp.cpu_count() // max(a.num_workers, 2)))
    sim = KubricSimulatorRenderer(
        logger, frame_width=a.frame_width, frame_height=a.frame_height,
        num_frames=a.num_frames, frame_rate=a.frame_rate,
        render_samples_per_pixel=a.render_samples_per_pixel,
        render_cpu_threads=render_cpu_threads, mass_est_fp=a.mass_est_fp)

    os.makedirs(scene_dp, exist_ok=True)
    start_time = time.time()
    sim.prepare_next_scene('train', a.seed_offset + scene_idx)
    # The main differentiation between scene types happens here.
    st.apply_setup_for_type(logger, sim, scene_type)
    sim.simulate_frames(0, a.num_frames)
    sim.render_frames(0, a.num_frames - 1)
    metadata, _ = sim.get_metadata()
    metadata['scene_type'] = scene_type
    sim.render_frames_divided_objects(0, a.num_frames - 1)
    sim.write_all_data(os.path.join(scene_dp, 'frames'))
    kb.write_json(metadata, os.path.join(scene_dp, f'{scene_dn}.json'))
    logger.info(f'Scene {scene_dn} ({scene_type}) done in {time.time() - start_time:.1f}s')


def worker(a, worker_idx, total_scn_cnt):
    from tcow_tpu.utils.logvis import Logger
    root_dn = os.path.basename(a.root_dp.rstrip('/'))
    logger = Logger(context=f'{root_dn}_worker{worker_idx}')
    num_total = len(a.scene_types) * a.num_scenes_per_type
    for scene_idx in range(worker_idx, num_total, max(a.num_workers, 1)):
        scene_type = a.scene_types[scene_idx // a.num_scenes_per_type]
        scene_dn = f'{root_dn}_{scene_type}_scn{scene_idx:05d}'
        scene_dp = os.path.join(a.root_dp, scene_dn)
        marker = os.path.join(scene_dp, f'{scene_dn}.json')
        if a.ignore_if_exist and os.path.exists(marker):
            logger.info(f'{scene_dn} already exists, skipping.')
            continue
        with total_scn_cnt.get_lock():
            total_scn_cnt.value += 1
            count = total_scn_cnt.value
        if count > a.max_scene_count:
            logger.warning('Reached max allowed scene count, exiting (restart to continue).')
            break
        p = mp.Process(target=do_scene,
                       args=(a, scene_idx, scene_dp, scene_dn, scene_type, logger))
        p.start()
        p.join()


def main(argv=None):
    a = get_args(argv)
    from tcow_tpu.gen_kubric.export_kub_rand import activate_sim_backend
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

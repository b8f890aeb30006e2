'''
Synthetic data generation, two flavors:

  1. `synthetic_device_batch`: a structured random device batch matching the train-step
     schema (moving rectangles with a consistent depth order, real visible-vs-amodal
     occlusion relationships). Used by bench.py, __graft_entry__.py and tests — no dataset
     on disk required.

  2. `write_synthetic_kubric_scene(s)`: writes scenes to disk in the reference Kubric export
     layout (frames/ rgba_*.png, segmentation_*.png, divided_segmentation_*_*.png +
     <scene>.json metadata; see /root/reference/gen_kubric/kubric_sim.py:702-714 and
     data/data_kubric.py:227-339) so the full host data pipeline can be exercised end-to-end
     without Blender/Kubric. The real generator lives in tcow_tpu/gen_kubric/.
'''

import json
import os
from typing import Dict

import numpy as np


def _moving_rects(rng: np.random.RandomState, T: int, H: int, W: int, K: int,
                  sizes: np.ndarray = None):
    '''Returns amodal masks (K, T, H, W) uint8 and per-frame depth order (far -> near is
    ascending instance index for simplicity), plus 3-D-ish positions for metadata.'''
    div = np.zeros((K, T, H, W), np.uint8)
    centers = np.zeros((K, T, 2), np.float32)
    if sizes is None:
        sizes = rng.randint(max(4, H // 8), max(6, H // 3), size=(K, 2))
    pos0 = np.stack([rng.uniform(0, H, K), rng.uniform(0, W, K)], axis=1)
    vel = rng.uniform(-2.5, 2.5, size=(K, 2))
    for t in range(T):
        p = pos0 + vel * t
        for k in range(K):
            cy, cx = p[k]
            cy = int(abs(cy)) % H
            cx = int(abs(cx)) % W
            hh, ww = sizes[k]
            y0, y1 = max(0, cy - hh // 2), min(H, cy + hh // 2 + 1)
            x0, x1 = max(0, cx - ww // 2), min(W, cx + ww // 2 + 1)
            div[k, t, y0:y1, x0:x1] = 1
            centers[k, t] = (cy, cx)
    return div, centers


def _apply_rich_events(rng: np.random.RandomState, T: int, H: int, W: int, K: int,
                       div: np.ndarray, centers: np.ndarray, sizes: np.ndarray,
                       cont_episodes: int = 0):
    '''Scripted occlusion + containment episodes on top of the random rect motion.

    Instance 0 is the "snitch" (small); instance K-2 a large occluder, K-1 a large
    container. With per-episode probability the snitch snaps to the host's center for a
    random frame span: behind the occluder it is fully occluded (mask-subset, painter
    order puts K-2 in front), inside the container its metadata position and 3-D box
    nest inside the container's enlarged box, so get_thing_occl_cont_dag's OBB
    containment (data/geometry.py, mirroring /root/reference/utils/geometry.py) reports
    c[0, K-1] = 1.0 >= outer_cont_thres and the supervision builder emits channel-2
    container targets + 'contained' flags — the reference's defining event type
    (/root/reference/data/data_utils.py:458-490). The container keeps moving while the
    snitch rides inside: tracking-through-containment, the tcow headline behavior.

    Returns (div, centers, z_pos (K, T), bbox_half (K,)) — z/bbox feed the metadata.
    '''
    assert K >= 4, 'rich events need >= 4 instances (snitch + occluder + container + 1)'
    z_pos = np.tile(np.arange(K, dtype=np.float32)[:, None], (1, T))   # default z = k
    bbox_half = np.full(K, 0.1, np.float32)
    occluder, container = K - 2, K - 1
    bbox_half[container] = 0.5
    sh, sw = sizes[0]

    def stamp(t, cy, cx):
        div[0, t] = 0
        y0, y1 = max(0, int(cy) - sh // 2), min(H, int(cy) + sh // 2 + 1)
        x0, x1 = max(0, int(cx) - sw // 2), min(W, int(cx) + sw // 2 + 1)
        div[0, t, y0:y1, x0:x1] = 1
        centers[0, t] = (int(cy), int(cx))

    # Random non-overlapping spans, each present with high probability and bracketed by
    # visible frames at both clip ends. Default (cont_episodes=0, the round-3/4 rich
    # datasets): [occl episode][gap][containment episode]. cont_episodes=N>0 is the
    # containment-HEAVY variant (VERDICT r4 task 1 data axis: ~1 containment episode per
    # scene was memorized, not generalized): 1 occl slot + N containment slots partition
    # the usable range, so a 40-frame scene carries several independent containment
    # events with distinct spans/trajectories.
    spans = []
    lo = max(1, int(T * 0.1))
    hi = max(lo + 2, int(T * 0.9))
    if cont_episodes > 0:
        bounds = np.linspace(lo, hi, 2 + cont_episodes).astype(int)
        for i in range(1 + cont_episodes):
            a0, a1 = int(bounds[i]), int(bounds[i + 1]) - 1   # gap frame between slots
            if a1 - a0 >= 2 and rng.rand() < 0.9:
                a = rng.randint(a0, a1 - 1)
                spans.append(('occl' if i == 0 else 'cont', a, rng.randint(a + 1, a1)))
    else:
        mid = rng.randint(lo + 1, hi - 1) if hi - lo > 2 else (lo + hi) // 2
        if rng.rand() < 0.85 and mid - lo >= 2:
            a = rng.randint(lo, mid - 1)
            spans.append(('occl', a, rng.randint(a + 1, mid)))
        if rng.rand() < 0.85 and hi - mid >= 2:
            a = rng.randint(mid, hi - 1)
            spans.append(('cont', a, rng.randint(a + 1, hi)))
    for kind, t0, t1 in spans:
        host = occluder if kind == 'occl' else container
        for t in range(t0, t1 + 1):
            stamp(t, *centers[host, t])
            if kind == 'cont':
                # Nest the 3-D box inside the container's; stay just behind it in z so
                # the metadata camera order matches the ascending-k painter order.
                z_pos[0, t] = z_pos[container, t] - 0.2
    return div, centers, z_pos, bbox_half


def make_synthetic_scene_arrays(seed: int, T: int = 8, H: int = 64, W: int = 64,
                                K: int = 4, rich_events: bool = False,
                                cont_episodes: int = 0) -> Dict[str, np.ndarray]:
    '''Builds consistent (rgb, segm, div_segm) arrays: visible segm is the front-most
    instance at each pixel (higher index = closer to camera). rich_events=True adds
    scripted full-occlusion and containment episodes (see _apply_rich_events).'''
    rng = np.random.RandomState(seed)
    sizes = None
    if rich_events:
        sizes = rng.randint(max(4, H // 8), max(6, H // 3), size=(K, 2))
        sizes[0] = (max(4, H // 10), max(4, W // 10))                  # small snitch
        sizes[K - 2] = (max(8, H // 3), max(8, W // 3))                # large occluder
        sizes[K - 1] = (max(8, H // 3), max(8, W // 3))                # large container
    div, centers = _moving_rects(rng, T, H, W, K, sizes=sizes)
    z_pos = bbox_half = None
    if rich_events:
        div, centers, z_pos, bbox_half = _apply_rich_events(rng, T, H, W, K, div,
                                                            centers, sizes,
                                                            cont_episodes=cont_episodes)
    segm = np.zeros((T, H, W), np.int32)
    for k in range(K):  # ascending: later (nearer) instances overwrite
        segm[div[k] == 1] = k + 1
    colors = rng.uniform(0.1, 0.9, size=(K + 1, 3)).astype(np.float32)
    rgb = colors[segm]  # (T, H, W, 3)
    rgb += rng.normal(0, 0.02, rgb.shape).astype(np.float32)
    rgb = np.clip(rgb, 0.0, 1.0)
    out = {'rgb': rgb, 'segm': segm, 'div_segm': div, 'centers': centers}
    if rich_events:
        out['z_pos'] = z_pos          # (K, T) metadata z per frame
        out['bbox_half'] = bbox_half  # (K,) metadata 3-D box half-extent
    return out


def synthetic_device_batch(seed: int, B: int = 2, Q: int = 2, T: int = 8, H: int = 64,
                           W: int = 64, M: int = 8, K: int = 4,
                           query_time: int = 0) -> Dict[str, np.ndarray]:
    '''Generates a batch in the train-step schema with physically-consistent occlusion
    fractions and a plausible occlusion/containment DAG.'''
    from tcow_tpu.data import data_utils
    rng = np.random.RandomState(seed)
    batch = {
        'rgb': np.zeros((B, 3, T, H, W), np.float32),
        'segm': np.zeros((B, T, H, W), np.int32),
        'div_segm': np.zeros((B, M, T, H, W), np.uint8),
        'query_inds': np.zeros((B, Q), np.int32),
        'query_time': np.int32(query_time),
        'occl_fracs': np.zeros((B, M, T, 3), np.float32),
        'occl_cont_dag': np.zeros((B, T, M, M, 3), np.float32),
    }
    for b in range(B):
        scene = make_synthetic_scene_arrays(seed * 997 + b, T, H, W, K)
        batch['rgb'][b] = scene['rgb'].transpose(3, 0, 1, 2)
        batch['segm'][b] = scene['segm']
        batch['div_segm'][b, :K] = scene['div_segm']
        occl_fracs = data_utils.get_thing_occl_fracs(
            scene['segm'][..., None], scene['div_segm'].transpose(1, 2, 3, 0))
        batch['occl_fracs'][b, :K] = occl_fracs
        # Random-but-valid DAG values (zero diagonal, zero padding).
        dag = rng.rand(T, K, K, 3).astype(np.float32) * 0.5
        dag[:, np.arange(K), np.arange(K)] = 0.0
        batch['occl_cont_dag'][b, :, :K, :K] = dag
        # Queries must be visible at query_time; pick the instances with most visible pixels.
        vis = np.array([(scene['segm'][query_time] == k + 1).sum() for k in range(K)])
        batch['query_inds'][b] = np.argsort(vis)[::-1][:Q].astype(np.int32)
    return batch


# ---------------------------------------------------------------------------
# On-disk synthetic Kubric-format scenes
# ---------------------------------------------------------------------------

def write_synthetic_kubric_scene(scene_dp: str, seed: int, T: int = 12, H: int = 64,
                                 W: int = 96, K: int = 4,
                                 rich_events: bool = False,
                                 cont_episodes: int = 0) -> None:
    '''Writes one scene directory in the reference export layout (kubric_sim.py:702-714):
      <scene>/frames/rgba_00000.png ...
      <scene>/frames/segmentation_00000.png (hue-palette instance colors)
      <scene>/frames/divided_segmentation_<k>_<t>.png
      <scene>/<scene>.json  (camera + instance metadata, written last as completion marker)
    '''
    import cv2
    from tcow_tpu.data import vis_codec
    name = os.path.basename(scene_dp.rstrip('/'))
    frames_dp = os.path.join(scene_dp, 'frames')
    os.makedirs(frames_dp, exist_ok=True)
    scene = make_synthetic_scene_arrays(seed, T, H, W, K, rich_events=rich_events,
                                        cont_episodes=cont_episodes)
    rng = np.random.RandomState(seed + 1)

    fast_png = [cv2.IMWRITE_PNG_COMPRESSION, 1]   # lossless; the per-pixel noise makes
    for t in range(T):                            # higher zlib effort very slow on 1 core
        rgba = (np.concatenate([scene['rgb'][t],
                                np.ones((H, W, 1), np.float32)], axis=-1) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(frames_dp, f'rgba_{t:05d}.png'), rgba[..., [2, 1, 0, 3]],
                    fast_png)
        segm_rgb = vis_codec.segm_ids_to_rgb_kubric(scene['segm'][t], K)
        cv2.imwrite(os.path.join(frames_dp, f'segmentation_{t:05d}.png'),
                    (segm_rgb * 255).astype(np.uint8)[..., ::-1], fast_png)
        for k in range(K):
            mask = (scene['div_segm'][k, t] * 255).astype(np.uint8)
            cv2.imwrite(os.path.join(frames_dp, f'divided_segmentation_{k:03d}_{t:05d}.png'),
                        mask, fast_png)
        # Depth as uint16 tiff-style png (loader tolerates absence; keep minimal).

    # Metadata: camera at z=10 looking down; depth z = k so larger k is closer to the
    # camera, consistent with the painter's order used for the visible segmentation.
    instances = []
    z_pos = scene.get('z_pos')
    bbox_half = scene.get('bbox_half')
    for k in range(K):
        positions = []
        bboxes_3d = []
        for t in range(T):
            cy, cx = scene['centers'][k, t]
            z = float(z_pos[k, t]) if z_pos is not None else float(k)
            pos = [float(cx) / W, float(cy) / H, z]
            positions.append(pos)
            s = float(bbox_half[k]) if bbox_half is not None else 0.1
            corners = [[pos[0] + dx, pos[1] + dy, pos[2] + dz]
                       for dx in (-s, s) for dy in (-s, s) for dz in (-s, s)]
            bboxes_3d.append(corners)
        instances.append({'positions': positions, 'bboxes_3d': bboxes_3d,
                          'asset_id': f'synthetic_{k}', 'mass': 1.0, 'scale': 1.0})
    metadata = {
        'scene': {'num_frames': T, 'frame_rate': 12, 'resolution': [W, H],
                  'num_valo_instances': K},
        'camera': {'positions': [[0.0, 0.0, 10.0]] * T,
                   'field_of_view': 0.9},
        'instances': instances,
    }
    with open(os.path.join(scene_dp, f'{name}.json'), 'w') as f:
        json.dump(metadata, f)


def write_synthetic_kubric_dataset(root_dp: str, num_scenes: int = 3, seed: int = 0,
                                   **scene_kwargs) -> None:
    for i in range(num_scenes):
        scene_dn = f'{os.path.basename(root_dp.rstrip("/"))}_scn{i:05d}'
        write_synthetic_kubric_scene(os.path.join(root_dp, scene_dn), seed + i,
                                     **scene_kwargs)


if __name__ == '__main__':
    import argparse
    parser = argparse.ArgumentParser()
    parser.add_argument('--out', required=True)
    parser.add_argument('--num_scenes', type=int, default=3)
    parser.add_argument('--frames', type=int, default=12)
    parser.add_argument('--height', type=int, default=64)
    parser.add_argument('--width', type=int, default=96)
    parser.add_argument('--seed', type=int, default=0)
    # Objects per scene. Keep this comfortably above the --num_queries you plan to train
    # with: an instance fully occluded at the (augmentation-shifted) query frame scores a
    # hard -256 desirability and becomes unsampleable, and a scene with fewer than Q
    # sampleable instances triggers the [SkipCache] re-preprocess retry EVERY epoch
    # (measured ~60 s/retry at 480x360x40). K=6 keeps Q=3 robust; check with
    # tools/validate_dataset.py.
    parser.add_argument('--objects', type=int, default=6)
    parser.add_argument('--rich', action='store_true',
                        help='scripted full-occlusion + containment episodes so the '
                             'occl/cont supervision channels and the during_occl/'
                             'during_cont metric families are populated')
    parser.add_argument('--rich_cont_episodes', type=int, default=0,
                        help='with --rich: containment-heavy scheduling — 1 occlusion '
                             'slot + N independent containment episodes per scene '
                             '(default 0 keeps the legacy 1-occl + 1-cont layout and its '
                             'exact RNG stream, so existing datasets regenerate '
                             'bit-identically)')
    a = parser.parse_args()
    write_synthetic_kubric_dataset(a.out, a.num_scenes, a.seed, T=a.frames, H=a.height,
                                   W=a.width, K=a.objects, rich_events=a.rich,
                                   cont_episodes=a.rich_cont_episodes)
    print(f'Wrote {a.num_scenes} synthetic scenes to {a.out}')

'''Stub `kubric` package (see ../README.md): pure-numpy emulation of the API surface that
tcow_tpu/gen_kubric consumes, so the real exporters run without Blender/pybullet.'''

import json
import os

import numpy as np

from . import post_processing  # noqa: F401  (kb.post_processing.*)
from . import renderer  # noqa: F401         (kb.renderer.Blender)
from . import simulator  # noqa: F401        (kb.simulator.PyBullet)
from .core import (Asset, AssetSource, PerspectiveCamera, Scene,  # noqa: F401
                   position_sampler, resample_while, rotation_sampler,
                   sample_point_in_half_sphere_shell)

__version__ = '0.0-tcow-stub'


# ---------------------------------------------------------------------------
# Post-render bookkeeping
# ---------------------------------------------------------------------------

def compute_visibility(segmentation, assets):
    '''Sets asset.metadata['visibility'] = per-frame visible pixel counts; segmentation
    carries raw ids = 1 + index into `assets`.'''
    seg = np.asarray(segmentation)[..., 0]
    for i, a in enumerate(assets):
        a.metadata['visibility'] = (seg == i + 1).sum(axis=(1, 2)).astype(np.int64)


def adjust_segmentation_idxs(segmentation, assets, subset):
    '''Remaps raw ids (1 + index into `assets`) to 1 + index into `subset`; everything
    else (background, dome, assets outside the subset) becomes 0.'''
    seg = np.asarray(segmentation)
    lut = np.zeros(len(assets) + 1, seg.dtype)
    index_of = {id(a): j for j, a in enumerate(subset)}
    for i, a in enumerate(assets):
        if id(a) in index_of:
            lut[i + 1] = index_of[id(a)] + 1
    return lut[seg]


# ---------------------------------------------------------------------------
# Metadata
# ---------------------------------------------------------------------------

def _scene_frames(scene):
    return list(range(scene.frame_start, scene.frame_end + 1))


def get_scene_metadata(scene):
    md = {
        'num_frames': scene.frame_end - scene.frame_start + 1,
        'frame_rate': scene.frame_rate,
        'resolution': list(scene.resolution),
    }
    md.update(_jsonable(scene.metadata))
    return md


def get_camera_info(camera):
    frames = _scene_frames(camera._scene) if camera._scene is not None else \
        sorted(f for f in camera._frames if f >= 0)
    positions, rotations = [], []
    for f in frames:
        pos, R = camera.frame_pose(f)
        positions.append([float(x) for x in pos])
        rotations.append([[float(x) for x in row] for row in R])
    return {
        'focal_length': camera.focal_length,
        'sensor_width': camera.sensor_width,
        'field_of_view': 2.0 * float(np.arctan(camera.sensor_width /
                                               (2.0 * camera.focal_length))),
        'positions': positions,
        'R': rotations,
    }


def get_instance_info(scene, assets):
    frames = _scene_frames(scene)
    out = []
    for a in assets:
        positions, bboxes_3d = [], []
        s = float(np.max(a.scale)) if np.ndim(a.scale) else float(a.scale)
        half = s * (a.bounds[1] - a.bounds[0]) / 2.0
        for f in frames:
            p = a.frame_position(f)
            positions.append([float(x) for x in p])
            corners = [[float(p[0] + dx * half[0]), float(p[1] + dy * half[1]),
                        float(p[2] + dz * half[2])]
                       for dx in (-1, 1) for dy in (-1, 1) for dz in (-1, 1)]
            bboxes_3d.append(corners)
        info = {
            'asset_id': a.asset_id,
            'name': a.name,
            'mass': float(a.mass),
            'scale': s,
            'friction': float(a.friction),
            'restitution': float(a.restitution),
            'positions': positions,
            'bboxes_3d': bboxes_3d,
        }
        info.update(_jsonable(a.metadata))
        out.append(info)
    return out


def process_collisions(collisions, scene, assets_subset=None):
    if assets_subset is None:
        return _jsonable(collisions)
    names = {a.name for a in assets_subset}
    return _jsonable([c for c in collisions
                      if c['instances'][0] in names and c['instances'][1] in names])


# ---------------------------------------------------------------------------
# Output writing
# ---------------------------------------------------------------------------

def write_image_dict(data_stack, output_dir, is_divided=False):
    '''Writes the on-disk layout tcow_tpu/data/kubric.py reads: rgba_%05d.png, hue-palette
    segmentation_%05d.png, depth_%05d.tiff; divided stacks (trailing K axis) become
    divided_segmentation_%03d_%05d.png amodal masks. Flow/normal layers are skipped (the
    tcow pipeline never reads them).'''
    import cv2
    os.makedirs(output_dir, exist_ok=True)
    if is_divided:
        seg = np.asarray(data_stack['segmentation'])  # (T, H, W, 1, K)
        T, K = seg.shape[0], seg.shape[-1]
        for k in range(K):
            for t in range(T):
                mask = (seg[t, :, :, 0, k] > 0).astype(np.uint8) * 255
                cv2.imwrite(os.path.join(output_dir,
                                         f'divided_segmentation_{k:03d}_{t:05d}.png'),
                            mask)
        return

    from tcow_tpu.data import vis_codec
    rgba = np.asarray(data_stack['rgba'])
    seg = np.asarray(data_stack['segmentation'])[..., 0]
    num_inst = max(1, int(seg.max()))
    for t in range(rgba.shape[0]):
        cv2.imwrite(os.path.join(output_dir, f'rgba_{t:05d}.png'),
                    rgba[t][..., [2, 1, 0, 3]])
        seg_rgb = vis_codec.segm_ids_to_rgb_kubric(seg[t].astype(np.int64), num_inst)
        cv2.imwrite(os.path.join(output_dir, f'segmentation_{t:05d}.png'),
                    (seg_rgb[..., ::-1] * 255.0).astype(np.uint8))
        if 'depth' in data_stack:
            cv2.imwrite(os.path.join(output_dir, f'depth_{t:05d}.tiff'),
                        np.asarray(data_stack['depth'])[t, :, :, 0].astype(np.float32))


def _jsonable(obj):
    if isinstance(obj, dict):
        return {str(k): _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    return obj


def write_json(data, path):
    os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
    with open(path, 'w') as f:
        json.dump(_jsonable(data), f)

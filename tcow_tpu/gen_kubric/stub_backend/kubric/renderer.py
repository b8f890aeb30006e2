'''Stub renderer: painter's-algorithm sphere rasterizer with per-object constant depth.

Per-object (not per-pixel) depth makes the z-order identical to the camera-distance
painter model assumed by tcow's occlusion/containment DAG builder
(tcow_tpu/data/data_utils.py:get_thing_occl_cont_dag), so reconstruction error is ~0 by
construction.
'''

import numpy as np

from .core import _hash_fracs


def _asset_color(asset_id: str) -> np.ndarray:
    return (0.15 + 0.7 * _hash_fracs(asset_id, 3)).astype(np.float32)


class Blender:

    def __init__(self, scene, scratch_dir=None, adaptive_sampling=False,
                 use_denoising=True, samples_per_pixel=32, motion_blur=0.0,
                 **unused_kwargs):
        self.scene = scene
        self.scratch_dir = scratch_dir
        self.samples_per_pixel = samples_per_pixel
        self.motion_blur = motion_blur

    def _set_ambient_light_hdri(self, filename):
        self._hdri_filename = filename

    def _background(self, H, W):
        hdri = str(self.scene.metadata.get('background', 'default'))
        sky = 0.35 + 0.5 * _hash_fracs(f'sky:{hdri}', 3).astype(np.float32)
        ground = 0.2 + 0.4 * _hash_fracs(f'ground:{hdri}', 3).astype(np.float32)
        ramp = np.linspace(0.0, 1.0, H, dtype=np.float32)[:, None, None]
        return (1.0 - ramp) * sky[None, None] + ramp * ground[None, None]  # (H, W~1, 3)

    def render(self, frames, return_layers=('rgba', 'segmentation')):
        scene = self.scene
        W, H = scene.resolution
        cam = scene.camera
        T = len(frames)
        fx = cam.focal_length / cam.sensor_width * W

        rgba = np.zeros((T, H, W, 4), np.uint8)
        segm = np.zeros((T, H, W, 1), np.uint32)
        depth = np.full((T, H, W, 1), 1e6, np.float32)
        bg = np.broadcast_to(self._background(H, W), (H, W, 3))

        yy = np.arange(H, dtype=np.float32)[:, None]
        xx = np.arange(W, dtype=np.float32)[None, :]

        for ti, frame in enumerate(frames):
            cam_pos, R = cam.frame_pose(frame)
            rgb = bg.copy()
            zbuf = depth[ti, :, :, 0]
            ids = segm[ti, :, :, 0]
            # Painter order: far to near by EUCLIDEAN camera distance of the object
            # center — the same ordering data_utils.get_thing_occl_cont_dag uses to
            # decide occlusion direction, so rendered pixels and the annotation DAG
            # agree by construction (forward depth -xc[2] can invert the order for
            # laterally-offset objects and contradict the od/rel_order supervision).
            drawables = []
            for idx, a in enumerate(scene.assets):
                s = float(np.max(a.scale)) if np.ndim(a.scale) else float(a.scale)
                if a.background or s <= 0.0:
                    continue
                p = a.frame_position(frame)
                xc = R @ (np.asarray(p, np.float64) - cam_pos)
                d = -xc[2]
                if d <= 0.2:
                    continue
                dist = float(np.linalg.norm(np.asarray(p, np.float64) - cam_pos))
                drawables.append((dist, d, idx, a, xc))
            for _dist, d, idx, a, xc in sorted(drawables, key=lambda e: -e[0]):
                u = fx * xc[0] / d + W / 2.0
                v = H / 2.0 - fx * xc[1] / d
                rad = max(fx * a.world_radius / d, 1.0)
                y0, y1 = int(max(0, np.floor(v - rad))), int(min(H, np.ceil(v + rad) + 1))
                x0, x1 = int(max(0, np.floor(u - rad))), int(min(W, np.ceil(u + rad) + 1))
                if y0 >= y1 or x0 >= x1:
                    continue
                inside = ((yy[y0:y1] - v) ** 2 + (xx[:, x0:x1] - u) ** 2) <= rad * rad
                shade = np.float32(np.clip(1.1 - 0.03 * d, 0.4, 1.0))
                color = _asset_color(a.asset_id) * shade
                region_rgb = rgb[y0:y1, x0:x1]
                region_rgb[inside] = color
                ids[y0:y1, x0:x1][inside] = idx + 1
                zbuf[y0:y1, x0:x1][inside] = np.float32(d)
            rgba[ti, :, :, :3] = np.clip(rgb * 255.0, 0, 255).astype(np.uint8)
            rgba[ti, :, :, 3] = 255

        out = {}
        for layer in return_layers:
            if layer == 'rgba':
                out[layer] = rgba
            elif layer == 'segmentation':
                out[layer] = segm
            elif layer == 'depth':
                out[layer] = depth
            elif layer == 'forward_flow':
                out[layer] = np.zeros((T, H, W, 2), np.float32)
            elif layer == 'normal':
                out[layer] = np.zeros((T, H, W, 3), np.float32)
            elif layer == 'object_coordinates':
                out[layer] = np.zeros((T, H, W, 3), np.uint16)
            else:
                raise ValueError(f'unknown layer {layer}')
        return out

'''
Qualitative overlay renderers (numpy).

Reimplements /root/reference/utils/visualization.py with the same color conventions:
snitch = green, frontmost occluder = red, outermost container = blue, query border = white
(or green/magenta in single-channel views); magma heatmap for single-channel outputs,
viridis for loss-weight maps.
'''

import numpy as np


def draw_segm_borders(segm: np.ndarray, fill_white: bool = False) -> np.ndarray:
    '''(T, H, W, K) masks -> (T, H, W) boolean borders (visualization.py:33-57).'''
    assert segm.ndim == 4
    s = segm.astype(np.int16)
    border = (np.abs(s[:, 1:-1, 1:-1] - s[:, :-2, 1:-1]) +
              np.abs(s[:, 1:-1, 1:-1] - s[:, 2:, 1:-1]) +
              np.abs(s[:, 1:-1, 1:-1] - s[:, 1:-1, :-2]) +
              np.abs(s[:, 1:-1, 1:-1] - s[:, 1:-1, 2:]))
    border = np.any(border, axis=-1)
    border = np.pad(border, ((0, 0), (1, 1), (1, 1)), mode='constant')
    if fill_white:
        return np.repeat(border[..., None], 3, axis=-1).astype(np.float32)
    return border


def _to_gray(rgb):
    g = rgb[..., 0] * 0.2 + rgb[..., 1] * 0.6 + rgb[..., 2] * 0.2
    return np.stack([g, g, g], axis=-1)


def create_model_input_video(seeker_rgb, seeker_query_mask, query_border,
                             apply_pause: bool = True) -> np.ndarray:
    '''(T,H,W,3) rgb + (T,H,W) query mask + (T,H,W,3)-indexable query border bool
    -> input overlay video (visualization.py:99-121).'''
    query_time = int(seeker_query_mask.any(axis=(1, 2)).argmax())
    vis = seeker_rgb + seeker_query_mask[..., None]
    vis[query_time] *= 0.6
    vis[query_border, 0] = 0.0
    vis[query_border, 1] = 1.0
    vis[query_border, 2] = 0.0
    if apply_pause:
        vis = np.concatenate([vis[0:query_time]] +
                             [vis[query_time:query_time + 1]] * 3 +
                             [vis[query_time + 1:]], axis=0)
    return np.clip(vis, 0.0, 1.0)


def create_model_output_snitch_video(seeker_rgb, output_mask, query_border, snitch_border,
                                     grayscale: bool = False) -> np.ndarray:
    '''Magma-heatmap snitch view (visualization.py:124-151).'''
    import matplotlib.pyplot as plt
    rgb = _to_gray(seeker_rgb) if grayscale else seeker_rgb
    heat = plt.cm.magma(output_mask[0])[..., 0:3]
    vis = rgb * 0.6 + heat * 0.5
    vis[query_border] = 0.0
    vis[snitch_border] = 0.0
    vis[query_border, 0] = 1.0
    vis[query_border, 2] = 1.0
    vis[snitch_border, 1] = 1.0
    return np.clip(vis, 0.0, 1.0)


def create_model_output_snitch_occl_cont_video(
        seeker_rgb, output_mask, query_border, snitch_border, frontmost_border,
        outermost_border, grayscale: bool = False) -> np.ndarray:
    '''Three-channel hierarchy view (visualization.py:154-192).'''
    rgb = _to_gray(seeker_rgb) if grayscale else seeker_rgb
    vis = rgb * 0.6
    vis = vis.copy()
    vis[..., 1] += output_mask[0] * 0.5
    if output_mask.shape[0] >= 2:
        vis[..., 0] += output_mask[1] * 0.5
    if output_mask.shape[0] >= 3:
        vis[..., 2] += output_mask[2] * 0.5
    for border in (query_border, snitch_border, frontmost_border, outermost_border):
        vis[border] = 0.0
    vis[query_border] = 1.0
    vis[snitch_border, 1] = 1.0
    vis[frontmost_border, 0] = 1.0
    vis[outermost_border, 2] = 1.0
    return np.clip(vis, 0.0, 1.0)


def create_snitch_weights_video(seeker_rgb, snitch_weights) -> np.ndarray:
    '''Per-pixel loss-weight heatmap (visualization.py:195-206).'''
    import matplotlib.pyplot as plt
    norm = snitch_weights.max() + 1e-6
    heat = plt.cm.viridis(snitch_weights / norm)[..., 0:3]
    return np.clip(seeker_rgb * 0.6 + heat * 0.5, 0.0, 1.0)


def create_model_input_target_video(
        seeker_rgb, seeker_query_mask, target_mask, query_border, snitch_border,
        frontmost_border, outermost_border, grayscale: bool = False) -> np.ndarray:
    '''Ground-truth overlay (visualization.py:209-253).'''
    rgb = _to_gray(seeker_rgb) if grayscale else seeker_rgb
    vis = rgb.copy()
    vis += seeker_query_mask[..., None] * 0.3
    tm = np.clip(target_mask, 0.0, 1.0)
    vis[1:, ..., 1] += tm[0, 1:] * 0.2
    if tm.shape[0] >= 2:
        vis[..., 0] += tm[1] * 0.2
    if tm.shape[0] >= 3:
        vis[..., 2] += tm[2] * 0.2
    for border in (query_border, snitch_border, frontmost_border, outermost_border):
        vis[border] = 0.0
    vis[query_border] = 1.0
    vis[snitch_border, 1] = 1.0
    vis[frontmost_border, 0] = 1.0
    vis[outermost_border, 2] = 1.0
    return np.clip(vis, 0.0, 1.0)

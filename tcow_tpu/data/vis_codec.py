'''
Segmentation codecs: Kubric hue-palette PNGs <-> integer instance IDs.

Reimplements /root/reference/data/data_vis.py:13-89. Kubric writes visible-instance
segmentation as an HLS hue palette (hue 0 = background/black at rank 0, instances at evenly
spaced hues starting at 0.01); the decoder recovers IDs by outlier-tolerant hue-step
estimation so frame-subsampled scenes (where some IDs vanish) still decode.
'''

import matplotlib.colors
import numpy as np

HUE_START = 0.01


def _rgb_to_hue(rgb: np.ndarray) -> np.ndarray:
    '''(*, 3) float RGB in [0,1] -> hue in [0,1). Uses cv2 (C++) when available; ~20x
    matplotlib.colors.rgb_to_hsv on video-sized arrays.'''
    try:
        import cv2
        flat = np.ascontiguousarray(rgb.reshape(-1, 1, 3), np.float32)
        hsv = cv2.cvtColor(flat, cv2.COLOR_RGB2HSV)  # H in [0, 360)
        return (hsv[:, 0, 0] / 360.0).reshape(rgb.shape[:-1])
    except ImportError:
        return matplotlib.colors.rgb_to_hsv(rgb)[..., 0]


def segm_rgb_to_ids_kubric(segm_rgb: np.ndarray) -> np.ndarray:
    '''
    :param segm_rgb (*, 3) float RGB in [0, 1].
    :return segm_ids (*, 1) int32, 1-based instance IDs (0 = background).
    '''
    to_rank = _rgb_to_hue(segm_rgb)
    unique_hues = np.sort(np.unique(to_rank))
    assert np.isclose(unique_hues[0], 0.0, rtol=1e-3, atol=1e-3), str(unique_hues)

    # Smallest hue gap between instances estimates the palette step; tolerate integer
    # multiples from missing IDs (data_vis.py:51-61).
    hue_steps = unique_hues[2:] - unique_hues[1:-1]
    assert np.all(hue_steps >= 1e-2), str(hue_steps)
    adjacent = hue_steps[hue_steps <= np.min(hue_steps) * 1.5] if len(hue_steps) else \
        np.array([max(unique_hues[1], HUE_START)])
    hue_step = float(np.mean(adjacent)) if len(adjacent) else float(unique_hues[1])

    # NOTE: threshold at HUE_START/2 (not HUE_START like data_vis.py:65): uint8 PNG
    # quantization can land the first instance's hue at 0.0098 < 0.01, which the reference
    # would silently misdecode as background.
    nice_rank = to_rank.copy()
    nice_rank[nice_rank >= HUE_START / 2] += hue_step - HUE_START
    return np.round(nice_rank / hue_step)[..., None].astype(np.int32)


def segm_ids_to_rgb_kubric(segm_ids: np.ndarray, num_inst: int) -> np.ndarray:
    '''Encoder consistent with segm_rgb_to_ids_kubric: background black, instance k at hue
    HUE_START + (k-1) * step with full saturation/value. Used by the synthetic dataset
    writer and the Kubric exporter.
    :param segm_ids (*,) int, 0 = background.
    :return (*, 3) float RGB in [0, 1].'''
    num_inst = max(int(num_inst), 1)
    step = (1.0 - HUE_START) / (num_inst + 1)
    hues = np.concatenate([[0.0], HUE_START + np.arange(num_inst) * step])
    hsv = np.zeros(segm_ids.shape + (3,), np.float32)
    hsv[..., 0] = hues[segm_ids]
    hsv[..., 1] = np.where(segm_ids > 0, 1.0, 0.0)
    hsv[..., 2] = np.where(segm_ids > 0, 1.0, 0.0)
    return matplotlib.colors.hsv_to_rgb(hsv).astype(np.float32)


def segm_ids_to_rgb(segm_ids: np.ndarray, num_inst=None) -> np.ndarray:
    '''Visualization palette (NOT the Kubric codec; background maps to red like the
    reference's data_vis.py:72-89).
    :param segm_ids (*,) or (*, 1) int.
    :return (*, 3) float RGB in [0, 1].'''
    import matplotlib.pyplot as plt
    ids = segm_ids[..., 0] if segm_ids.ndim and segm_ids.shape[-1] == 1 else segm_ids
    if num_inst is None:
        num_inst = int(np.max(ids)) + 1
    num_inst = max(num_inst, 1)
    return plt.cm.hsv(ids / num_inst)[..., :3].astype(np.float32)


def depth_to_rgb_vis(depth: np.ndarray, max_depth=None) -> np.ndarray:
    '''(*, 1) float depth -> (*, 3) uint8 viridis visualization (data_vis.py:13-29).'''
    import matplotlib.pyplot as plt
    if max_depth is None:
        max_depth = max(float(np.max(depth)), 1e-6)
    d = np.clip(depth.squeeze(-1), 0.0, max_depth) / max_depth
    rgb = plt.cm.viridis(2.0 / (d + 1.0) - 1.0)[..., :3]
    return (rgb * 255.0).astype(np.uint8)

'''Stub of kubric.post_processing: 2-D bbox extraction from segmentation.'''

import numpy as np


def compute_bboxes(segmentation, assets):
    '''Per-asset normalized [y0, x0, y1, x1] bboxes over frames where the instance is
    visible; segmentation ids are 1 + index into `assets`.'''
    seg = np.asarray(segmentation)[..., 0] if segmentation.ndim == 4 else \
        np.asarray(segmentation)
    T, H, W = seg.shape
    for j, a in enumerate(assets):
        bboxes, bbox_frames = [], []
        for t in range(T):
            ys, xs = np.nonzero(seg[t] == j + 1)
            if len(ys) == 0:
                continue
            bboxes.append([float(ys.min()) / H, float(xs.min()) / W,
                           float(ys.max() + 1) / H, float(xs.max() + 1) / W])
            bbox_frames.append(t)
        a.metadata['bboxes'] = bboxes
        a.metadata['bbox_frames'] = bbox_frames

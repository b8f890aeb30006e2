'''
Generates the repo's demo assets: a synthetic clip (a ball that rolls behind an occluder and
into a container) plus sparse annotation masks in the plugin-dataset naming scheme
(<name>_<t>_query.png / _snitch / _occl / _cont), mirroring the reference's
demo/teaduck2.mp4 + PNG annotations (/root/reference/README.md:127-152) without copying any
reference media.

Usage: python tools/make_demo.py [--out demo/]
'''

import argparse
import os

import numpy as np


def ball_center(t: int, W: int, H: int):
    tt = min(t, 120)  # the ball comes to rest inside the container
    x = 30 + tt * (W - 60) / 120.0
    y = H * 0.62 + 18 * np.sin(tt * 0.07)
    return x, y


def render_scene(t: int, H: int, W: int):
    '''Returns (rgb uint8, ball amodal mask, occluder mask, container mask, ball visible).'''
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    rgb = np.zeros((H, W, 3), np.float32)
    rgb[..., :] = (0.55, 0.75, 0.95)                       # sky
    rgb[yy > H * 0.7] = (0.35, 0.6, 0.3)                   # ground

    bx, by = ball_center(t, W, H)
    r = H * 0.07
    ball = ((xx - bx) ** 2 + (yy - by) ** 2) < r ** 2      # amodal snitch

    # Static occluder wall in the middle of the path.
    ox0, ox1 = int(W * 0.40), int(W * 0.55)
    oy0, oy1 = int(H * 0.35), int(H * 0.80)
    occl = np.zeros((H, W), bool)
    occl[oy0:oy1, ox0:ox1] = True

    # Container box near the right edge; the ball ends inside it (open-top box drawn in
    # front of the ball so late frames show containment).
    cx0, cx1 = int(W * 0.80), int(W * 0.97)
    cy0, cy1 = int(H * 0.55), int(H * 0.85)
    cont = np.zeros((H, W), bool)
    cont[cy0:cy1, cx0:cx1] = True
    cont_hole = np.zeros((H, W), bool)
    cont_hole[cy0 + 6:cy1 - 6, cx0 + 6:cx1 - 6] = True

    rgb[ball] = (0.9, 0.25, 0.2)
    rgb[occl] = (0.45, 0.3, 0.55)
    cont_vis = np.logical_and(cont, ~cont_hole)
    # Ball visible when not behind occluder and not behind the container front wall.
    visible = np.logical_and(ball, ~occl)
    in_box = bx > cx0
    if in_box:
        visible = np.logical_and(visible, ~cont)
    rgb[cont_vis] = (0.85, 0.65, 0.2)
    vis_draw = np.logical_and(visible, ~cont_vis) if in_box else visible
    rgb[vis_draw] = (0.9, 0.25, 0.2)
    return (rgb * 255).astype(np.uint8), ball, occl, cont, visible


def main(out_dp: str, name: str = 'rollball', T: int = 200, H: int = 240, W: int = 320):
    import cv2
    os.makedirs(out_dp, exist_ok=True)
    vw = cv2.VideoWriter(os.path.join(out_dp, f'{name}.mp4'),
                         cv2.VideoWriter_fourcc(*'mp4v'), 30, (W, H))
    assert vw.isOpened(), 'cv2 VideoWriter failed to open (codec missing?)'
    annots = {}
    for t in range(T):
        rgb, ball, occl, cont, visible = render_scene(t, H, W)
        vw.write(rgb[..., ::-1])
        if t == 15:
            annots[f'{name}_{t}_query.png'] = visible
        if t in (55, 65):  # ball behind the occluder wall
            annots[f'{name}_{t}_occl.png'] = occl
        if t in (55, 95):
            annots[f'{name}_{t}_snitch.png'] = ball
        if t in (95, 115):  # ball inside the container
            annots[f'{name}_{t}_cont.png'] = cont
    vw.release()
    for fn, mask in annots.items():
        cv2.imwrite(os.path.join(out_dp, fn), mask.astype(np.uint8) * 255)
    print(f'Wrote {name}.mp4 ({T} frames {W}x{H}) + {len(annots)} annotation masks '
          f'to {out_dp}')


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--out', default='demo/')
    a = p.parse_args()
    main(a.out)

'''
Data augmentation pipeline (host-side numpy/cv2, explicit RNG).

Reimplements /root/reference/data/augs.py:12-210:
  - temporal: palindrome p, reverse p (0.35 inside palindrome), frame-stride doubling p=0.35
    inside palindrome, random clip offset within the loaded window (augs.py:76-97);
  - color (train only): jitter(0.2, 0.2, 0.2, 0.1) p=0.9, gaussian blur(5, sigma 0.1-3.5)
    p=0.2, grayscale p=0.05 (augs.py:116-119, 32-34);
  - spatial (train only, augs_2d): horizontal flip p=0.5, random crop of 0-20% per side
    (augs.py:121-127);
  - test-time center crop to the training aspect ratio (augs.py:166-174);
  - final resize: nearest for segmentation-like modalities, smooth (antialiased) otherwise
    (augs.py:199-205).

Randomness is drawn from an explicit numpy Generator for reproducibility (the reference uses
the global numpy RNG reseeded per worker, data.py:13-24; distributional parity is the goal,
SURVEY.md section 7.3 item 6).
'''

from typing import Dict, Optional

import numpy as np


def _rgb_to_gray(img: np.ndarray) -> np.ndarray:
    '''(..., 3, H, W) -> (..., 1, H, W), ITU-R 601 weights like torchvision.'''
    w = np.array([0.299, 0.587, 0.114], img.dtype)
    return np.einsum('c,...chw->...hw', w, img)[..., None, :, :]


def _blend(a, b, factor):
    '''a*factor + b*(1-factor), clipped to [0,1], IN PLACE on a (same per-element values
    and op order as the out-of-place expression, so results are bit-identical — in-place
    saves two (T,3,H,W) temporaries per call on the hot loader path).'''
    a *= factor
    a += b * (1.0 - factor)
    np.clip(a, 0.0, 1.0, out=a)
    return a


def _shift_hue(frames_tchw: np.ndarray, fh: float) -> np.ndarray:
    '''Exact hue rotation via cv2 HSV (C++; matplotlib's converter is ~20x slower on
    video-sized arrays). All T frames are stacked into one (T*H, W, 3) image so the
    round trip is 2 cvtColor calls total instead of 2 per frame (cvtColor is
    per-pixel, so the stacking changes nothing numerically).'''
    try:
        import cv2
        T, C, H, W = frames_tchw.shape
        hwc = np.clip(frames_tchw.transpose(0, 2, 3, 1), 0, 1).astype(
            np.float32).reshape(T * H, W, C)
        hsv = cv2.cvtColor(hwc, cv2.COLOR_RGB2HSV)
        hsv[..., 0] = (hsv[..., 0] + fh * 360.0) % 360.0
        return cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB).reshape(
            T, H, W, C).transpose(0, 3, 1, 2)
    except ImportError:
        import matplotlib.colors
        hwc = frames_tchw.transpose(0, 2, 3, 1)
        hsv = matplotlib.colors.rgb_to_hsv(np.clip(hwc, 0, 1))
        hsv[..., 0] = (hsv[..., 0] + fh) % 1.0
        return matplotlib.colors.hsv_to_rgb(hsv).transpose(0, 3, 1, 2).astype(np.float32)


def sample_jitter_factors(rng: np.random.Generator, brightness=0.2, contrast=0.2,
                          saturation=0.2, hue=0.1) -> Dict:
    '''Draws the per-video ColorJitter factors + op order. Consumes exactly the random
    values color_jitter() would, so deferring the application (device-side jitter) keeps
    every subsequent draw in the augmentation RNG stream identical.'''
    return {
        'fb': rng.uniform(max(0.0, 1 - brightness), 1 + brightness),
        'fc': rng.uniform(max(0.0, 1 - contrast), 1 + contrast),
        'fs': rng.uniform(max(0.0, 1 - saturation), 1 + saturation),
        'fh': rng.uniform(-hue, hue),
        'order': rng.permutation(4).astype(np.int32),
    }


def color_jitter(frames: np.ndarray, rng: np.random.Generator, brightness=0.2, contrast=0.2,
                 saturation=0.2, hue=0.1, factors: Optional[Dict] = None) -> np.ndarray:
    '''torchvision.ColorJitter semantics on (T, 3, H, W) float frames: factors sampled once
    per video, the four adjustments applied in a random order.'''
    if factors is None:
        factors = sample_jitter_factors(rng, brightness, contrast, saturation, hue)
    fb, fc, fs, fh = factors['fb'], factors['fc'], factors['fs'], factors['fh']
    out = frames.astype(np.float32)
    for op in factors['order']:
        if op == 0:
            out *= fb
            np.clip(out, 0.0, 1.0, out=out)
        elif op == 1:
            mean = _rgb_to_gray(out).mean(axis=(-3, -2, -1), keepdims=True)
            out = _blend(out, mean, fc)
        elif op == 2:
            gray = _rgb_to_gray(out)
            out = _blend(out, gray, fs)
        else:
            out = _shift_hue(out, fh)
    return out


def gaussian_blur(frames: np.ndarray, rng: np.random.Generator, ksize=5,
                  sigma_range=(0.1, 3.5), sigma: Optional[float] = None) -> np.ndarray:
    import cv2
    if sigma is None:
        sigma = float(rng.uniform(*sigma_range))
    out = np.empty_like(frames)
    for t in range(frames.shape[0]):
        img = frames[t].transpose(1, 2, 0)
        out[t] = cv2.GaussianBlur(img, (ksize, ksize), sigma).transpose(2, 0, 1)
    return out


def nearest_gather_inds(dst: int, src: int) -> np.ndarray:
    '''The cv2.INTER_NEAREST source index per destination pixel — same one-ulp-exact
    expression as the nearest branch of resize_frames (see the comment there).'''
    return np.minimum(np.floor(np.arange(dst) * (1.0 / (dst / src))).astype(np.int64),
                      src - 1)


def resize_frames(frames: np.ndarray, height: int, width: int, nearest: bool) -> np.ndarray:
    '''(C, T, H, W) -> (C, T, height, width). Channels are chunked in groups of 4 because
    cv2.resize rejects >4-channel images (instance-mask stacks go up to K = 36).'''
    import cv2
    C, T, H, W = frames.shape
    if (H, W) == (height, width):
        # Contiguous copy so no caller ever receives a view pinning the full-res buffer.
        return np.ascontiguousarray(frames)
    if nearest:
        # cv2.INTER_NEAREST maps dst (i, j) -> src floor(i / (height/H)) — note cv2
        # computes the scale as the double 1/(dst/src), NOT src/dst, which differs by
        # one ulp exactly at integer boundaries (e.g. 368->320 at j=100); replicating
        # that expression makes this gather bit-identical (pinned by tests incl.
        # upsampling). One whole-array gather replaces ceil(C/4)*T cv2 calls +
        # per-slice contiguous copies on the 36-channel mask stacks, and accepts
        # non-contiguous input.
        yi = nearest_gather_inds(height, H)
        xi = nearest_gather_inds(width, W)
        return frames[:, :, yi[:, None], xi]
    interp = cv2.INTER_AREA if height < H else cv2.INTER_LINEAR
    out = np.empty((C, T, height, width), frames.dtype)
    for t in range(T):
        for c0 in range(0, C, 4):
            img = np.ascontiguousarray(frames[c0:c0 + 4, t].transpose(1, 2, 0))
            r = cv2.resize(img, (width, height), interpolation=interp)
            if r.ndim == 2:
                r = r[..., None]
            out[c0:c0 + 4, t] = r.transpose(2, 0, 1)
    return out


class AugmentationPipeline:

    def __init__(self, num_frames_load: int, num_frames_clip: int, frame_height: int,
                 frame_width: int, frame_stride: int, do_random_augs: bool, augs_2d: bool,
                 reverse_prob: float, palindrome_prob: float, center_crop: bool,
                 defer_color_jitter: bool = False, time_stretch_max: float = 1.0):
        # defer_color_jitter: sample the color-chain parameters here (same RNG stream)
        # but leave ALL the pixel math (jitter + blur + grayscale) to the device
        # (tcow_tpu/ops/device_augs.py); factors land in params['jitter_factors'] and
        # params['blur_sigmas'] (resize-ratio-scaled).
        # time_stretch_max > 1 (train + rope_time_coords only): scale each example's rope
        # time coordinates by a random log-uniform factor in [1, max] — a pure coordinate
        # augmentation (no pixel change) that exercises LONG relative offsets so windowed
        # streaming far past the trained horizon stays in-distribution.
        self.defer_color_jitter = defer_color_jitter
        self.time_stretch_max = time_stretch_max
        self.num_frames_load = num_frames_load
        self.num_frames_clip = num_frames_clip
        self.frame_height = frame_height
        self.frame_width = frame_width
        self.frame_stride = frame_stride
        self.do_random_augs = do_random_augs
        self.augs_2d = augs_2d
        self.reverse_prob = reverse_prob
        self.palindrome_prob = palindrome_prob
        self.center_crop = center_crop

    def sample_augs_params(self, rng: Optional[np.random.Generator] = None) -> Dict:
        if rng is None:
            rng = np.random.default_rng()
        palindrome = False
        reverse = False
        frame_stride_factor = 1
        offset = (self.num_frames_load - self.num_frames_clip) // 2
        frame_inds_load = list(range(0, self.num_frames_load * self.frame_stride,
                                     self.frame_stride))
        frame_inds_clip = list(range(0, self.num_frames_clip))

        if self.do_random_augs:
            palindrome = rng.random() < self.palindrome_prob
            if palindrome:
                reverse = rng.random() < 0.35
                frame_stride_factor = 2 if rng.random() < 0.35 else 1
            else:
                reverse = rng.random() < self.reverse_prob
            if palindrome:
                frame_inds_clip = frame_inds_clip + frame_inds_clip[::-1][1:]
            if reverse:
                frame_inds_clip = frame_inds_clip[::-1]
            if frame_stride_factor > 1:
                frame_inds_clip = frame_inds_clip[::frame_stride_factor]
            num_avail = len(frame_inds_clip)
            assert num_avail >= self.num_frames_clip
            offset = int(rng.integers(0, num_avail - self.num_frames_clip + 1))
            frame_inds_clip = frame_inds_clip[offset:offset + self.num_frames_clip]

        params = {
            'palindrome': palindrome, 'reverse': reverse,
            'frame_stride_factor': frame_stride_factor, 'offset': offset,
            'frame_inds_load': np.array(frame_inds_load),
            'frame_inds_clip': np.array(frame_inds_clip),
            'color_jitter': False, 'rgb_blur': False, 'rgb_grayscale': False,
            'horz_flip': False, 'crop_rect': -np.ones(4),
        }
        if self.do_random_augs:
            params['color_jitter'] = rng.random() < 0.9
            params['rgb_blur'] = rng.random() < 0.2
            params['rgb_grayscale'] = rng.random() < 0.05
            if self.augs_2d:
                params['horz_flip'] = rng.random() < 0.5
                params['crop_rect'] = np.array([
                    rng.random() * 0.2, rng.random() * 0.2 + 0.8,
                    rng.random() * 0.2, rng.random() * 0.2 + 0.8])
            # Color parameters are sampled lazily inside apply (same rng), so stash it.
        params['time_stretch'] = 1.0
        if self.do_random_augs and self.time_stretch_max > 1.0:
            params['time_stretch'] = float(np.exp(
                rng.uniform(0.0, np.log(self.time_stretch_max))))
        params['_rng_state'] = rng.bit_generator.state
        return params

    def frame_times(self, params: Dict) -> np.ndarray:
        '''TRUE source timestamps (f32, len Tc) of the augmented clip for time-calibrated
        rope: load indices (which carry the base frame_stride) indexed by the temporally
        augmented clip order, times the optional stretch factor. Stride doubling yields
        doubled gaps, reversal decreasing times, palindrome mirror frames their genuinely
        repeated times.'''
        t = params['frame_inds_load'][params['frame_inds_clip']].astype(np.float32)
        return t * np.float32(params.get('time_stretch', 1.0))

    def nearest_index_maps(self, params: Dict, H: int, W: int):
        '''Compose frame-select + center-crop + flip + crop + nearest-resize into three
        per-axis int64 index maps (t_map, y_map, x_map) such that, for any nearest-path
        modality (segm / div / mask),
            apply_augs_2d_frames({m: raw})[m][c, t, y, x]
                == raw[c, t_map[t], y_map[y], x_map[x]]
        exactly. This lets the native fused gather (tcow_tpu/native.gather_div_bits)
        produce the augmented masks straight from the bit-packed cache in one pass; the
        integer arithmetic below mirrors apply_augs_2d_frames step for step (incl.
        cv2's one-ulp INTER_NEAREST scale expression, see resize_frames).'''
        t_map = np.asarray(params['frame_inds_clip'], np.int64)

        off_y, off_x = 0, 0
        H1, W1 = H, W
        if self.center_crop:
            cur_ar = W / H
            want_ar = self.frame_width / self.frame_height
            if cur_ar > want_ar:
                W1 = int(H * want_ar)
                off_x = (W - W1) // 2
            elif cur_ar < want_ar:
                H1 = int(W / want_ar)
                off_y = (H - H1) // 2

        y1c, x1c = 0, 0
        H2, W2 = H1, W1
        crop_rect = params['crop_rect']
        if crop_rect is not None and np.all(np.asarray(crop_rect) >= 0.0):
            ry1, ry2, rx1, rx2 = crop_rect
            y1c, x1c = int(ry1 * H1), int(rx1 * W1)
            H2, W2 = int(ry2 * H1) - y1c, int(rx2 * W1) - x1c

        y_map = off_y + y1c + nearest_gather_inds(self.frame_height, H2)
        x_cc = x1c + nearest_gather_inds(self.frame_width, W2)   # in post-flip coords
        if params['horz_flip']:
            x_cc = W1 - 1 - x_cc
        x_map = off_x + x_cc
        return t_map, y_map, x_map

    def apply_augs_2d_frames(self, modalities: Dict[str, np.ndarray],
                             params: Dict) -> Dict[str, np.ndarray]:
        '''
        :param modalities: maps name (rgb / depth / segm / div_segm / mask...) to
            (C|K, Tv, H, W) arrays.
        :return dict of (C|K, Tc, frame_height, frame_width) arrays.
        '''
        rng = np.random.default_rng()
        if '_rng_state' in params:
            rng.bit_generator.state = params['_rng_state']
        out = {}
        for modality, raw in modalities.items():
            if raw.ndim < 4:
                out[modality] = raw.copy()
                continue
            frame_inds_clip = params['frame_inds_clip']
            assert len(frame_inds_clip) == self.num_frames_clip
            frames = raw[:, frame_inds_clip]          # (C, Tc, H, W)
            C, T, H, W = frames.shape
            # Channel-count sanity: only instance-mask stacks may exceed 3 channels. The
            # reference asserts (C > 3) == ('div' in name) (augs.py:162), which wrongly
            # rejects scenes with <= 3 VALO instances; allow those.
            assert ('div' in modality) or C <= 3, (modality, C)
            x = frames.transpose(1, 0, 2, 3)          # (T, C, H, W)

            if self.center_crop:
                cur_ar = W / H
                want_ar = self.frame_width / self.frame_height
                if cur_ar > want_ar:
                    cw = int(H * want_ar)
                    x0 = (W - cw) // 2
                    x = x[..., :, x0:x0 + cw]
                elif cur_ar < want_ar:
                    ch = int(W / want_ar)
                    y0 = (H - ch) // 2
                    x = x[..., y0:y0 + ch, :]

            if 'rgb' in modality:
                # uint8 input (kubric cache): frame-select/crop/flip are pure index ops
                # that commute with the /255 conversion, so convert only when the first
                # float pixel op actually runs — here if jitter/blur/grayscale execute
                # on host, else just before the resize. Identical numerics, 4x fewer
                # bytes copied through the aug chain.
                if self.defer_color_jitter:
                    # Full device deferral: the host only SAMPLES (consuming exactly the
                    # draws the host ops would, so the augmentation RNG stream is
                    # identical either way); jitter + blur + grayscale all run on device
                    # post-resize in the same relative order as the host chain
                    # (ops/device_augs.py). rgb stays uint8 through the whole host chain
                    # — no float conversion, no pixel math on the loader core.
                    if params['color_jitter']:
                        params['jitter_factors'] = sample_jitter_factors(rng)
                    if params['rgb_blur']:
                        sigma = float(rng.uniform(0.1, 3.5))
                        # The host blur runs at source resolution BEFORE crop/resize;
                        # deferred it runs post-resize, so scale sigma by the
                        # crop->target spatial ratio to preserve blur strength relative
                        # to content (distributional parity; crop is an index op that
                        # commutes with blur away from borders).
                        Hc, Wc = x.shape[-2:]
                        ch, cw = Hc, Wc
                        cr = params['crop_rect']
                        if cr is not None and np.all(np.asarray(cr) >= 0.0):
                            y1, y2, x1, x2 = cr
                            ch = max(1, int(y2 * Hc) - int(y1 * Hc))
                            cw = max(1, int(x2 * Wc) - int(x1 * Wc))
                        params['blur_sigmas'] = (sigma * self.frame_height / ch,
                                                 sigma * self.frame_width / cw)
                else:
                    if x.dtype == np.uint8 and (params['color_jitter']
                                                or params['rgb_blur']
                                                or params['rgb_grayscale']):
                        x = x.astype(np.float32) / 255.0
                    if params['color_jitter']:
                        x = color_jitter(x, rng)
                    if params['rgb_blur']:
                        x = gaussian_blur(x, rng)
                    if params['rgb_grayscale']:
                        # (T,1,H,W) -> (T,3,H,W)
                        x = np.repeat(_rgb_to_gray(x), 3, axis=1)

            if params['horz_flip']:
                x = x[..., ::-1]

            crop_rect = params['crop_rect']
            if crop_rect is not None and np.all(np.asarray(crop_rect) >= 0.0):
                y1, y2, x1, x2 = crop_rect
                Hc, Wc = x.shape[-2:]
                x = x[..., int(y1 * Hc):int(y2 * Hc), int(x1 * Wc):int(x2 * Wc)]

            nearest = ('segm' in modality or 'mask' in modality)
            # (T,C,H,W) -> (C,T,H,W) as a view: the nearest path gathers from strided
            # input directly, the smooth (cv2) path copies per (frame, 4-chan) slice
            # inside resize_frames anyway — an up-front full-array contiguous copy here
            # was pure overhead either way.
            x = x.transpose(1, 0, 2, 3)
            if 'rgb' in modality and x.dtype == np.uint8 and not self.defer_color_jitter:
                x = x.astype(np.float32)  # same pixels as converting up front
                x /= 255.0
            # Deferred mode keeps rgb uint8 THROUGH the resize (cv2 resizes uint8 in
            # rounded fixed point vs the float path's later truncating quantization in
            # the collate — a <=1-LSB difference on a value the model only ever sees
            # 1/255-quantized) and all the way to the device, skipping the f32
            # conversion, the float resize, and the collate re-quantization.
            x = resize_frames(x, self.frame_height, self.frame_width, nearest)
            out[modality] = x
        return out

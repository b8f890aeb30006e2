'''
On-device color augmentation: torchvision-ColorJitter-semantics jitter applied inside the
jitted train step.

The reference jitters on the host inside torch DataLoader workers
(/root/reference/data/augs.py:32-34,116-119 via torchvision.transforms.ColorJitter). At
240x320xT=30 the host-side jitter costs ~0.56 s/item (BASELINE.md) — the single largest
host cost per item. Here the HOST only samples the per-item factors + op order (keeping
the augmentation RNG stream identical to the host path, data/augs.py:58-79) and the
elementwise math runs on device where it fuses into the input-unpacking pass for free.

Note the deferred ops apply AFTER spatial crop/flip/resize (the host path applies them
before). Brightness/contrast/saturation/flip/crop commute exactly; hue-vs-bilinear-resize
commutes only approximately, and the blur moves from source to target resolution (sigma is
pre-scaled by the resize ratio to preserve strength) — equivalent-strength augmentations,
not bit-identical ones (augmentations only need distributional parity, SURVEY.md
section 7.3). Within the deferred chain the relative op order (jitter -> blur ->
grayscale) matches the reference.
'''

import jax
import jax.numpy as jnp


def _rgb_to_hsv(rgb):
    '''(..., 3) channels-last floats in [0, 1] -> (h, s, v) each (...).'''
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = jnp.max(rgb, axis=-1)
    mn = jnp.min(rgb, axis=-1)
    diff = mx - mn
    safe = jnp.where(diff > 0, diff, 1.0)
    rc = (mx - r) / safe
    gc = (mx - g) / safe
    bc = (mx - b) / safe
    h = jnp.where(mx == r, bc - gc,
                  jnp.where(mx == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(diff > 0, (h / 6.0) % 1.0, 0.0)
    s = jnp.where(mx > 0, diff / jnp.where(mx > 0, mx, 1.0), 0.0)
    return h, s, mx


def _hsv_to_rgb(h, s, v):
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [v, q, p, p, t], v)
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [t, v, v, q, p], p)
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [p, p, t, v, v], q)
    return jnp.stack([r, g, b], axis=-1)


def _gray(x):
    '''(3, T, H, W) -> (1, T, H, W), ITU-R 601 weights (matches data/augs.py:25-29).'''
    w = jnp.asarray([0.299, 0.587, 0.114], x.dtype)
    return jnp.einsum('c,cthw->thw', w, x)[None]


def _jitter_one(rgb, fb, fc, fs, fh, order):
    '''rgb (3, T, H, W) float in [0, 1]; factors scalar; order (4,) int32 op sequence.'''

    def brightness(x):
        return jnp.clip(x * fb, 0.0, 1.0)

    def contrast(x):
        mean = jnp.mean(_gray(x), axis=(-2, -1), keepdims=True)   # per-frame (1, T, 1, 1)
        return jnp.clip(x * fc + mean * (1.0 - fc), 0.0, 1.0)

    def saturation(x):
        g = _gray(x)
        return jnp.clip(x * fs + g * (1.0 - fs), 0.0, 1.0)

    def hue(x):
        hwc = jnp.clip(x, 0.0, 1.0).transpose(1, 2, 3, 0)          # (T, H, W, 3)
        h, s, v = _rgb_to_hsv(hwc)
        out = _hsv_to_rgb((h + fh) % 1.0, s, v)
        return out.transpose(3, 0, 1, 2)

    branches = [brightness, contrast, saturation, hue]

    def body(j, x):
        return jax.lax.switch(order[j], branches, x)

    return jax.lax.fori_loop(0, 4, body, rgb)


def apply_color_jitter(rgb, factors, order):
    '''Batched jitter inside the jitted step.

    :param rgb (B, 3, T, H, W) float32 in [0, 1].
    :param factors (B, 5) float32: (fb, fc, fs, fh, apply) per example.
    :param order (B, 4) int32: per-example op application order.
    :return (B, 3, T, H, W) float32.
    '''

    def one(r, f, o):
        jit = _jitter_one(r, f[0], f[1], f[2], f[3], o)
        return jnp.where(f[4] > 0.5, jit, r)

    return jax.vmap(one)(rgb, factors, order)


def _gauss5(sigma):
    '''5-tap gaussian weights, cv2.getGaussianKernel(5, sigma) semantics
    (w_i = exp(-(i-2)^2 / (2 sigma^2)), normalized).'''
    d = jnp.arange(5.0) - 2.0
    w = jnp.exp(-(d * d) / (2.0 * sigma * sigma))
    return w / jnp.sum(w)


def _blur5(x, wy, wx):
    '''Separable 5x5 gaussian on (3, T, H, W) with reflect-101 borders (cv2's
    BORDER_DEFAULT; jnp.pad mode='reflect' is exactly reflect-101).'''
    H, W = x.shape[-2], x.shape[-1]
    xp = jnp.pad(x, ((0, 0), (0, 0), (2, 2), (0, 0)), mode='reflect')
    x = sum(wy[i] * xp[..., i:i + H, :] for i in range(5))
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (2, 2)), mode='reflect')
    return sum(wx[i] * xp[..., :, i:i + W] for i in range(5))


def apply_blur_gray(rgb, blur_gray):
    '''Deferred gaussian blur + grayscale inside the jitted step (the tail of the
    reference's host color chain, /root/reference/data/augs.py:32-34,116-119: jitter ->
    blur(ksize 5, sigma U(0.1, 3.5)) p=0.2 -> grayscale p=0.05; called AFTER
    apply_color_jitter so the relative op order matches the host path).

    The host samples sigma (same RNG stream position as its own blur) and pre-scales it
    by the crop->resize spatial ratio, so the blur strength relative to image content
    matches the reference's pre-resize blur (data/augs.py sets blur_sigmas).

    :param rgb (B, 3, T, H, W) float32 in [0, 1].
    :param blur_gray (B, 3) float32: (sigma_y, sigma_x, grayscale) per example;
        sigma <= 0 means no blur, grayscale > 0.5 replicates the ITU-R 601 luma.
    :return (B, 3, T, H, W) float32.
    '''

    def one(r, bg):
        sy, sx, g = bg[0], bg[1], bg[2]
        wy = _gauss5(jnp.where(sy > 0, sy, 1.0))
        wx = _gauss5(jnp.where(sx > 0, sx, 1.0))
        r = jnp.where(sy > 0, _blur5(r, wy, wx), r)
        return jnp.where(g > 0.5, jnp.broadcast_to(_gray(r), r.shape), r)

    return jax.vmap(one)(rgb, blur_gray)

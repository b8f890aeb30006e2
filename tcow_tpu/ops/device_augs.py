'''
On-device color augmentation: torchvision-ColorJitter-semantics jitter applied inside the
jitted train step.

The reference jitters on the host inside torch DataLoader workers
(/root/reference/data/augs.py:32-34,116-119 via torchvision.transforms.ColorJitter). At
240x320xT=30 the host-side jitter costs ~0.56 s/item (BASELINE.md) — the single largest
host cost per item. Here the HOST only samples the per-item factors + op order (keeping
the augmentation RNG stream identical to the host path, data/augs.py:58-79) and the
elementwise math runs on device where it fuses into the input-unpacking pass for free.

Note the deferred jitter applies AFTER spatial crop/flip/resize (the host path applies it
before). Brightness/contrast/saturation/flip/crop commute exactly; hue-vs-bilinear-resize
commutes only approximately — an equivalent-strength augmentation, not a bit-identical one
(augmentations only need distributional parity, SURVEY.md section 7.3).
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

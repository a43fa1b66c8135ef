"""Device-resident augmentation pipeline with explicit PRNG keys.

Re-expresses the reference's albumentations policy (reference:
src/models/smp/dataset.py:160-207) as pure JAX transforms that run inside the
jitted train step on batched NHWC data, replacing the per-worker CPU path.
Probabilities and parameter ranges match the reference; randomness is
reproducible under a fixed key (distribution parity, per SURVEY.md §7).

Policy (images float32 in [0,255], masks float32 {0,1}):
  1. HorizontalFlip            p=0.50
  2. ShiftScaleRotate          p=0.20  shift ±6.25%, scale ±10%, rotate ±15°
  3. RandomCrop + PadIfNeeded  p=0.20  crop U(0.8,0.9)·size, re-padded centered
  4. GaussNoise                p=0.15  var U(1.5,6.5), per-channel
  5. Perspective               p=0.20  corner jitter scale U(0.05,0.1)
  6. RandomBrightnessContrast  p=0.15  ±0.15
  7. HueSaturationValue        p=0.15  h±15, s±20, v±15 (uint8 units)
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from octseg.ops.warp import affine_matrix, perspective_from_corners, warp_single


def _rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    """RGB [0,255] -> HSV with cv2 uint8 ranges (H in [0,180), S,V in [0,255])."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-6) * 255.0, 0.0)
    safe = jnp.maximum(delta, 1e-6)
    hr = (g - b) / safe
    hg = 2.0 + (b - r) / safe
    hb = 4.0 + (r - g) / safe
    h = jnp.where(maxc == r, hr, jnp.where(maxc == g, hg, hb))
    h = (h * 30.0) % 180.0  # cv2: H in [0, 180)
    h = jnp.where(delta == 0, 0.0, h)
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    h, s, v = hsv[..., 0] / 30.0, hsv[..., 1] / 255.0, hsv[..., 2]
    i = jnp.floor(h)
    f = h - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def augment_pair(img: jnp.ndarray, mask: jnp.ndarray, key: jax.Array
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Augment one (H,W,3) image + (H,W,C) mask pair. Returns same shapes."""
    h, w, _ = img.shape
    keys = jax.random.split(key, 16)

    # 1. horizontal flip
    do = jax.random.uniform(keys[0]) < 0.5
    img = jnp.where(do, img[:, ::-1, :], img)
    mask = jnp.where(do, mask[:, ::-1, :], mask)

    # 2. shift-scale-rotate (border constant 0)
    do = jax.random.uniform(keys[1]) < 0.20
    shift_x = jax.random.uniform(keys[2], minval=-0.0625, maxval=0.0625) * w
    shift_y = jax.random.uniform(keys[3], minval=-0.0625, maxval=0.0625) * h
    scale = 1.0 + jax.random.uniform(keys[4], minval=-0.1, maxval=0.1)
    angle = jax.random.uniform(keys[5], minval=-15.0, maxval=15.0) * jnp.pi / 180.0
    m = affine_matrix(shift_x, shift_y, scale, angle, (w - 1) / 2.0, (h - 1) / 2.0)
    ident = jnp.eye(3)
    m = jnp.where(do, m, ident)
    img = warp_single(img, m, 'bilinear')
    mask = warp_single(mask, m, 'nearest')

    # 3. random crop to U(0.8,0.9)*size then center pad back (border 0).
    #    Equivalent to a translation plus a rectangular validity mask.
    do = jax.random.uniform(keys[6]) < 0.20
    ch = jax.random.uniform(keys[7], minval=0.8, maxval=0.9) * h
    cw = jax.random.uniform(keys[8], minval=0.8, maxval=0.9) * w
    ch = jnp.floor(ch)
    cw = jnp.floor(cw)
    y0 = jax.random.uniform(keys[9]) * (h - ch)
    x0 = jax.random.uniform(keys[10]) * (w - cw)
    y0 = jnp.floor(y0)
    x0 = jnp.floor(x0)
    pad_top = jnp.floor((h - ch) / 2.0)
    pad_left = jnp.floor((w - cw) / 2.0)
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    inside = (
        (ys >= pad_top) & (ys < pad_top + ch) & (xs >= pad_left) & (xs < pad_left + cw)
    )
    src_y = jnp.clip(ys - pad_top + y0, 0, h - 1).astype(jnp.int32)
    src_x = jnp.clip(xs - pad_left + x0, 0, w - 1).astype(jnp.int32)
    crop_img = img[src_y.squeeze(-1)][:, src_x.squeeze(0)] * inside[..., None]
    crop_mask = mask[src_y.squeeze(-1)][:, src_x.squeeze(0)] * inside[..., None]
    img = jnp.where(do, crop_img, img)
    mask = jnp.where(do, crop_mask, mask)

    # 4. gaussian noise on the image
    do = jax.random.uniform(keys[11]) < 0.15
    var = jax.random.uniform(keys[12], minval=1.5, maxval=6.5)
    noise = jax.random.normal(keys[13], img.shape) * jnp.sqrt(var)
    img = jnp.where(do, jnp.clip(img + noise, 0.0, 255.0), img)

    # 5. perspective: jitter the 4 corners by N(0, scale)·dim, keep size
    do = jax.random.uniform(keys[14]) < 0.20
    pkeys = jax.random.split(keys[15], 3)
    pscale = jax.random.uniform(pkeys[0], minval=0.05, maxval=0.1)
    jitter = jax.random.normal(pkeys[1], (4, 2)) * pscale
    corners = jnp.array([[0.0, 0.0], [w - 1.0, 0.0], [w - 1.0, h - 1.0], [0.0, h - 1.0]])
    sign = jnp.array([[1, 1], [-1, 1], [-1, -1], [1, -1]], dtype=jnp.float32)
    src_pts = corners + jnp.abs(jitter) * sign * jnp.array([w, h], jnp.float32)
    pm = perspective_from_corners(src_pts, corners)
    pm = jnp.where(do, pm, jnp.eye(3))
    img = warp_single(img, pm, 'bilinear')
    mask = warp_single(mask, pm, 'nearest')

    # 6. brightness / contrast (brightness relative to max=255, cv2 convention)
    bkeys = jax.random.split(pkeys[2], 6)
    do = jax.random.uniform(bkeys[0]) < 0.15
    alpha = 1.0 + jax.random.uniform(bkeys[1], minval=-0.15, maxval=0.15)
    beta = jax.random.uniform(bkeys[2], minval=-0.15, maxval=0.15) * 255.0
    img = jnp.where(do, jnp.clip(img * alpha + beta, 0.0, 255.0), img)

    # 7. hue / saturation / value shifts (uint8 units; H on cv2's 0-180 scale)
    do = jax.random.uniform(bkeys[3]) < 0.15
    h_shift = jax.random.uniform(bkeys[4], minval=-15.0, maxval=15.0)
    sv_key1, sv_key2 = jax.random.split(bkeys[5])
    s_shift = jax.random.uniform(sv_key1, minval=-20.0, maxval=20.0)
    v_shift = jax.random.uniform(sv_key2, minval=-15.0, maxval=15.0)
    hsv = _rgb_to_hsv(img)
    hsv = jnp.stack(
        [
            (hsv[..., 0] + h_shift) % 180.0,
            jnp.clip(hsv[..., 1] + s_shift, 0.0, 255.0),
            jnp.clip(hsv[..., 2] + v_shift, 0.0, 255.0),
        ],
        axis=-1,
    )
    img_hsv = jnp.clip(_hsv_to_rgb(hsv), 0.0, 255.0)
    img = jnp.where(do, img_hsv, img)

    return img, mask


@partial(jax.jit, static_argnames=())
def augment_batch(imgs: jnp.ndarray, masks: jnp.ndarray, key: jax.Array
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Augment a batch of NHWC images + masks with independent per-sample keys."""
    keys = jax.random.split(key, imgs.shape[0])
    return jax.vmap(augment_pair)(imgs, masks, keys)

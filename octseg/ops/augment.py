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

All geometric transforms compose into ONE homography + one rectangular
validity mask, so the whole pipeline costs a single warp pass. Two samplers
implement that warp: the gather-based one (octseg.ops.warp, the portable
reference) and the gather-free Pallas two-pass kernel
(octseg.ops.pallas.resample) that augment_batch uses on TPU — XLA's TPU
gather costs ~30-60 ns/index, which made the warp ~70% of the train step.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from octseg.ops.warp import (
    _sample_pair_fused,
    affine_matrix,
    perspective_from_corners,
)


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


def _geom_params(key: jax.Array, h: int, w: int):
    """Draw the geometric policy: returns (m_pre, m_persp, rect, phot_keys).

    m_pre maps crop-space coords to source coords (flip ∘ ssr ∘ crop);
    m_persp maps output coords to crop-space; rect is the crop validity
    rectangle [top, bottom, left, right] in crop-space. The composed
    output->source homography is m_pre @ m_persp. phot_keys feed
    _photometric. The key schedule is shared by both sampler paths so a
    fixed key draws identical transforms on either.
    """
    keys = jax.random.split(key, 16)
    ident = jnp.eye(3)

    # 1. horizontal flip as a matrix (inverse map: x -> w-1-x)
    do_flip = jax.random.uniform(keys[0]) < 0.5
    m_flip = jnp.array([[-1.0, 0.0, w - 1.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    m_flip = jnp.where(do_flip, m_flip, ident)

    # 2. shift-scale-rotate (inverse map, border constant 0)
    do = jax.random.uniform(keys[1]) < 0.20
    shift_x = jax.random.uniform(keys[2], minval=-0.0625, maxval=0.0625) * w
    shift_y = jax.random.uniform(keys[3], minval=-0.0625, maxval=0.0625) * h
    scale = 1.0 + jax.random.uniform(keys[4], minval=-0.1, maxval=0.1)
    angle = jax.random.uniform(keys[5], minval=-15.0, maxval=15.0) * jnp.pi / 180.0
    m_ssr = affine_matrix(shift_x, shift_y, scale, angle, (w - 1) / 2.0, (h - 1) / 2.0)
    m_ssr = jnp.where(do, m_ssr, ident)

    # 3. random crop to U(0.8,0.9)*size then center pad back (border 0):
    #    a translation (inverse map: crop coords -> pre-crop coords) plus a
    #    rectangular validity region in post-crop coordinates.
    do_crop = jax.random.uniform(keys[6]) < 0.20
    ch = jnp.floor(jax.random.uniform(keys[7], minval=0.8, maxval=0.9) * h)
    cw = jnp.floor(jax.random.uniform(keys[8], minval=0.8, maxval=0.9) * w)
    y0 = jnp.floor(jax.random.uniform(keys[9]) * (h - ch))
    x0 = jnp.floor(jax.random.uniform(keys[10]) * (w - cw))
    pad_top = jnp.floor((h - ch) / 2.0)
    pad_left = jnp.floor((w - cw) / 2.0)
    m_crop = jnp.array(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    ).at[0, 2].set(x0 - pad_left).at[1, 2].set(y0 - pad_top)
    m_crop = jnp.where(do_crop, m_crop, ident)
    rect = jnp.where(
        do_crop,
        jnp.array([pad_top, pad_top + ch, pad_left, pad_left + cw]),
        jnp.array([-1.0, h + 1.0, -1.0, w + 1.0]),
    )

    # 5. perspective: jitter the 4 corners by N(0, scale)·dim, keep size
    do = jax.random.uniform(keys[14]) < 0.20
    pkeys = jax.random.split(keys[15], 3)
    pscale = jax.random.uniform(pkeys[0], minval=0.05, maxval=0.1)
    jitter = jax.random.normal(pkeys[1], (4, 2)) * pscale
    corners = jnp.array([[0.0, 0.0], [w - 1.0, 0.0], [w - 1.0, h - 1.0], [0.0, h - 1.0]])
    sign = jnp.array([[1, 1], [-1, 1], [-1, -1], [1, -1]], dtype=jnp.float32)
    src_pts = corners + jnp.abs(jitter) * sign * jnp.array([w, h], jnp.float32)
    m_persp = jnp.where(do, perspective_from_corners(src_pts, corners), ident)

    # crop coords -> source coords; highest precision: bf16-precision 3x3
    # matmuls quantize the translation entries (up to the image size) by
    # up to 2 px on TPU (see _apply_homography)
    m_pre = jnp.matmul(
        jnp.matmul(m_flip, m_ssr, precision='highest'), m_crop,
        precision='highest',
    )
    phot_keys = (keys[11], keys[12], keys[13], pkeys[2])
    return m_pre, m_persp, rect, phot_keys


def _validity(m_persp: jnp.ndarray, rect: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """(H, W, 1) {0,1} mask of output pixels whose crop-space position falls
    inside the crop validity rectangle."""
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
        indexing='ij',
    )
    cx, cy = _apply_homography(m_persp, xs, ys)
    inside = (
        (cy >= rect[0] - 0.5) & (cy < rect[1] - 0.5)
        & (cx >= rect[2] - 0.5) & (cx < rect[3] - 0.5)
    )[..., None]
    return inside.astype(jnp.float32)


def _apply_homography(m: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray):
    """Exact-f32 homogeneous transform of pixel coordinates.

    Written elementwise on purpose: a ``coords @ m.T`` matmul runs at TPU
    default (bfloat16) matmul precision, which quantizes coordinates >255 by
    up to 2 px — measured as 21% flipped mask pixels at 512² (r2)."""
    px = m[0, 0] * xs + m[0, 1] * ys + m[0, 2]
    py = m[1, 0] * xs + m[1, 1] * ys + m[1, 2]
    pw = m[2, 0] * xs + m[2, 1] * ys + m[2, 2]
    return px / pw, py / pw


def _photometric(img: jnp.ndarray, phot_keys) -> jnp.ndarray:
    """Steps 4/6/7: gaussian noise, brightness/contrast, HSV shifts."""
    k_do_noise, k_var, k_noise, bc_key = phot_keys

    # 4. gaussian noise on the image (post-warp; i.i.d. ⇒ same distribution)
    do = jax.random.uniform(k_do_noise) < 0.15
    var = jax.random.uniform(k_var, minval=1.5, maxval=6.5)
    noise = jax.random.normal(k_noise, img.shape) * jnp.sqrt(var)
    img = jnp.where(do, jnp.clip(img + noise, 0.0, 255.0), img)

    # 6. brightness / contrast (brightness relative to max=255, cv2 convention)
    bkeys = jax.random.split(bc_key, 6)
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
    return jnp.where(do, img_hsv, img)


def augment_pair(img: jnp.ndarray, mask: jnp.ndarray, key: jax.Array
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Augment one (H,W,3) image + (H,W,C) mask pair. Returns same shapes.

    Portable path: the composed homography is sampled with the packed
    single-gather sampler (octseg.ops.warp._sample_pair_fused). On TPU prefer
    augment_batch, which swaps in the gather-free Pallas kernel.
    """
    h, w, _ = img.shape
    m_pre, m_persp, rect, phot_keys = _geom_params(key, h, w)

    # --- one fused warp: out --P--> crop coords (validity) --T∘A∘F--> src ---
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
        indexing='ij',
    )
    cx, cy = _apply_homography(m_persp, xs, ys)
    inside = _validity(m_persp, rect, h, w)
    sx, sy = _apply_homography(m_pre, cx, cy)
    # one gather for both tensors (bilinear image taps + nearest mask tap
    # packed as channels — see _sample_pair_fused)
    img, mask = _sample_pair_fused(img, mask, sx, sy)
    img = img * inside
    mask = mask * inside

    img = _photometric(img, phot_keys)
    return img, mask


def _use_pallas_warp() -> bool:
    """Compiled Pallas path only on TPU (the kernel uses pltpu memory spaces
    and TPU grid semantics — on GPU it would fail at trace time, so GPU takes
    the portable gather path). Tests monkeypatch this to drive the kernel in
    interpret mode on the CPU mesh."""
    return jax.devices()[0].platform.lower() == 'tpu'


# interpret-mode escape hatch for CPU-mesh tests of the pallas path
_INTERPRET = False


def augment_batch(imgs: jnp.ndarray, masks: jnp.ndarray, key: jax.Array,
                  mesh=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Augment a batch of NHWC images + masks with independent per-sample keys.

    On TPU the geometric warp runs through the Pallas two-pass kernel
    (~10x the gather path, measured r2); elsewhere it falls back to the
    vmapped gather sampler. A fixed key draws the same transform parameters
    on both paths. ``mesh`` (optional, >1 devices) shard_maps the kernel over
    the batch axis so it composes with a pjit-sharded train step.
    """
    n, h, w, _ = imgs.shape
    keys = jax.random.split(key, n)
    if not _use_pallas_warp() or h != w:
        return jax.vmap(augment_pair)(imgs, masks, keys)

    from octseg.ops.pallas.resample import warp_pair_2pass

    m_pre, m_persp, rect, phot_keys = jax.vmap(
        lambda k: _geom_params(k, h, w)
    )(keys)
    # highest precision: translation entries reach the image size, and bf16
    # matmul quantization there shifts every sampled coordinate (see
    # _apply_homography)
    mats = jnp.einsum('nij,njk->nik', m_pre, m_persp, precision='highest')
    if mesh is not None and mesh.devices.size > 1:
        from jax.sharding import PartitionSpec as P

        axis = mesh.axis_names[0]
        import functools

        warp = jax.shard_map(
            functools.partial(warp_pair_2pass, interpret=_INTERPRET), mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P(axis)),
            check_vma=False,
        )
        img_w, mask_w = warp(imgs, masks, mats)
    else:
        img_w, mask_w = warp_pair_2pass(imgs, masks, mats, interpret=_INTERPRET)
    inside = jax.vmap(lambda mp, rc: _validity(mp, rc, h, w))(m_persp, rect)
    img_w = img_w * inside
    mask_w = mask_w * inside
    img_w = jax.vmap(_photometric)(img_w, phot_keys)
    return img_w, mask_w

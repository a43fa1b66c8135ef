"""Batched projective/affine warping on device (the augmentation sampler).

Replaces the cv2.warpAffine / cv2.warpPerspective calls inside albumentations'
ShiftScaleRotate and Perspective transforms (reference:
src/models/smp/dataset.py:168-194) with a gather-based sampler that runs
inside the jitted train step. Inverse mapping: ``matrix`` maps output pixel
coordinates (x, y, 1) to input coordinates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _flat_take(img_flat: jnp.ndarray, yi: jnp.ndarray, xi: jnp.ndarray,
               h: int, w: int) -> jnp.ndarray:
    """Single-axis gather from a (H*W, C) buffer — lowers much better on TPU
    than 2-D advanced indexing."""
    idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
    c = img_flat.shape[-1]
    return jnp.take(img_flat, idx.reshape(-1), axis=0).reshape(*idx.shape, c)


def _sample_bilinear(img: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray,
                     border_value: float, tap_dtype=None) -> jnp.ndarray:
    """tap_dtype=jnp.bfloat16 halves gather bandwidth (~20% faster warps);
    the ≤0.5/255 quantization it introduces is below uint8 source precision,
    so the augmentation path uses it while parity paths stay f32."""
    h, w, c = img.shape
    out_dtype = img.dtype
    if tap_dtype is not None:
        img = img.astype(tap_dtype)
    flat = img.reshape(h * w, c)
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    wx = (xs - x0)[..., None]
    wy = (ys - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        v = _flat_take(flat, yi, xi, h, w).astype(out_dtype)
        return jnp.where(valid[..., None], v, border_value)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def _sample_nearest(img: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray,
                    border_value: float) -> jnp.ndarray:
    h, w, c = img.shape
    flat = img.reshape(h * w, c)
    xi = jnp.round(xs).astype(jnp.int32)
    yi = jnp.round(ys).astype(jnp.int32)
    valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    v = _flat_take(flat, yi, xi, h, w)
    return jnp.where(valid[..., None], v, border_value)


def _sample_pair_fused(img: jnp.ndarray, mask: jnp.ndarray, xs: jnp.ndarray,
                       ys: jnp.ndarray) -> tuple:
    """Bilinear-sample ``img`` and nearest-sample ``mask`` with ONE gather.

    TPU gathers cost ~per-index, not per-byte, so the 5 gathers of the naive
    path (4 bilinear taps + 1 nearest) are folded into one: a packed buffer
    holds the 2x2 tap neighborhood of every pixel ([y,x],[y,x+1],[y+1,x],
    [y+1,x+1]) as extra channels (shifted copies — vectorized slices XLA
    fuses), one gather fetches all taps for both tensors, then the image
    channels are bilinear-combined and the mask channels tap-selected by the
    fractional parts (nearest = the tap the rounded coordinate lands on).

    Border semantics match the 4-tap sampler with border_value=0: the packed
    buffer is zero-padded by 1px so half-outside taps read 0, and positions
    fully outside [-1, size-1] are masked to 0. Taps are bf16 (see
    _sample_bilinear tap_dtype note); outputs are f32.
    """
    h, w, ci = img.shape
    cm = mask.shape[-1]
    packed = jnp.concatenate(
        [img.astype(jnp.bfloat16), mask.astype(jnp.bfloat16)], axis=-1
    )
    p = jnp.pad(packed, ((1, 2), (1, 2), (0, 0)))
    quad = jnp.concatenate(
        [p[:-1, :-1], p[:-1, 1:], p[1:, :-1], p[1:, 1:]], axis=-1
    )  # (h+2, w+2, 4*(ci+cm)): quad[y+1, x+1] = taps of (y, x)
    qh, qw = h + 2, w + 2
    flat = quad.reshape(qh * qw, -1)

    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    wx = (xs - x0)[..., None]
    wy = (ys - y0)[..., None]
    x0i = jnp.clip(x0.astype(jnp.int32) + 1, 0, qw - 2)
    y0i = jnp.clip(y0.astype(jnp.int32) + 1, 0, qh - 2)
    taps = jnp.take(flat, (y0i * qw + x0i).reshape(-1), axis=0) \
        .reshape(*x0i.shape, 4, ci + cm).astype(jnp.float32)

    # fully-outside positions -> 0 (half-outside handled by the zero pad)
    valid = ((x0 >= -1) & (x0 <= w - 1) & (y0 >= -1) & (y0 <= h - 1))[..., None]

    img_taps = taps[..., :ci]
    top = img_taps[..., 0, :] * (1 - wx) + img_taps[..., 1, :] * wx
    bot = img_taps[..., 2, :] * (1 - wx) + img_taps[..., 3, :] * wx
    out_img = (top * (1 - wy) + bot * wy) * valid

    mask_taps = taps[..., ci:]
    tap_idx = ((wy >= 0.5) * 2 + (wx >= 0.5)).astype(jnp.int32)  # (H,W,1)
    out_mask = jnp.take_along_axis(mask_taps, tap_idx[..., None], axis=-2)
    out_mask = out_mask[..., 0, :] * valid
    return out_img, out_mask


def warp_single(img: jnp.ndarray, matrix: jnp.ndarray, interp: str = 'bilinear',
                border_value: float = 0.0) -> jnp.ndarray:
    """Warp one HWC image by a 3x3 inverse-mapping homography."""
    h, w, _ = img.shape
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing='ij'
    )
    # elementwise on purpose: a coords @ matrix.T matmul runs at TPU default
    # (bf16) matmul precision, quantizing coordinates >255 by up to 2 px
    sw = matrix[2, 0] * xs + matrix[2, 1] * ys + matrix[2, 2]
    sx = (matrix[0, 0] * xs + matrix[0, 1] * ys + matrix[0, 2]) / sw
    sy = (matrix[1, 0] * xs + matrix[1, 1] * ys + matrix[1, 2]) / sw
    if interp == 'bilinear':
        return _sample_bilinear(img, sx, sy, border_value)
    return _sample_nearest(img, sx, sy, border_value)


def warp_batch(imgs: jnp.ndarray, matrices: jnp.ndarray, interp: str = 'bilinear',
               border_value: float = 0.0) -> jnp.ndarray:
    """Warp (N,H,W,C) by per-sample (N,3,3) inverse homographies."""
    return jax.vmap(lambda im, m: warp_single(im, m, interp, border_value))(imgs, matrices)


def affine_matrix(shift_x, shift_y, scale, angle_rad, center_x, center_y) -> jnp.ndarray:
    """Inverse-mapping matrix for shift+scale+rotate about an image center.

    Forward op: rotate by angle & scale about center, then translate by shift.
    Positive angle rotates counter-clockwise in image (y-down) coordinates,
    matching cv2.getRotationMatrix2D. Returns the inverse (output→input)
    3x3 matrix for warp_single.
    """
    cos = jnp.cos(angle_rad) / scale
    sin = -jnp.sin(angle_rad) / scale
    # inverse of [R*s | t] is [R^T/s | -R^T/s (t)] with t = shift + (I-R*s)c
    # build directly: src = R^T/s (dst - c - shift) + c
    m00, m01 = cos, sin
    m10, m11 = -sin, cos
    tx = center_x - m00 * (center_x + shift_x) - m01 * (center_y + shift_y)
    ty = center_y - m10 * (center_x + shift_x) - m11 * (center_y + shift_y)
    return jnp.array([[m00, m01, tx], [m10, m11, ty], [0.0, 0.0, 1.0]])


def perspective_from_corners(src_pts: jnp.ndarray, dst_pts: jnp.ndarray) -> jnp.ndarray:
    """Solve the 3x3 homography mapping dst_pts -> src_pts (inverse mapping),
    from 4 point pairs ((4,2) each). Standard DLT with an 8x8 solve."""
    # We want M with src = M @ dst (homogeneous).
    x = dst_pts[:, 0]
    y = dst_pts[:, 1]
    u = src_pts[:, 0]
    v = src_pts[:, 1]
    zeros = jnp.zeros(4)
    ones = jnp.ones(4)
    a_u = jnp.stack([x, y, ones, zeros, zeros, zeros, -u * x, -u * y], axis=1)
    a_v = jnp.stack([zeros, zeros, zeros, x, y, ones, -v * x, -v * y], axis=1)
    a = jnp.concatenate([a_u, a_v], axis=0)
    b = jnp.concatenate([u, v], axis=0)
    h = jnp.linalg.solve(a, b)
    return jnp.concatenate([h, jnp.ones(1)]).reshape(3, 3)

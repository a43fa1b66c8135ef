"""Device-side binary morphology and blur with OpenCV-parity semantics.

Replaces the host cv2 calls in the reference's postprocessing overlay chain
(reference: src/data/utils.py:208-233 — close(5x5 ellipse), dilate/erode(7x7
ellipse), GaussianBlur(5x5)) and the mask smoother (src/data/mask_processor.py).

Binary masks make morphology a convolution problem, which XLA maps well:
dilate(x, SE) = conv(x, SE) > 0; erode(x, SE) = conv(x, SE) == sum(SE).
Border semantics match cv2 defaults: erode sees +inf outside (ones padding),
dilate sees -inf (zeros padding); GaussianBlur uses REFLECT_101.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (5,5)) — verified byte-equal.
ELLIPSE_5 = np.array(
    [
        [0, 0, 1, 0, 0],
        [1, 1, 1, 1, 1],
        [1, 1, 1, 1, 1],
        [1, 1, 1, 1, 1],
        [0, 0, 1, 0, 0],
    ],
    dtype=np.float32,
)

# cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (7,7)) — verified byte-equal.
ELLIPSE_7 = np.array(
    [
        [0, 0, 0, 1, 0, 0, 0],
        [0, 1, 1, 1, 1, 1, 0],
        [1, 1, 1, 1, 1, 1, 1],
        [1, 1, 1, 1, 1, 1, 1],
        [1, 1, 1, 1, 1, 1, 1],
        [0, 1, 1, 1, 1, 1, 0],
        [0, 0, 0, 1, 0, 0, 0],
    ],
    dtype=np.float32,
)

# cv2.getGaussianKernel(5, 0) — binomial taps for sigma derived from ksize.
GAUSS_5 = np.array([0.0625, 0.25, 0.375, 0.25, 0.0625], dtype=np.float32)


def ellipse_kernel(size: int) -> np.ndarray:
    """cv2.getStructuringElement(MORPH_ELLIPSE, (size, size)) semantics."""
    if size == 5:
        return ELLIPSE_5.copy()
    if size == 7:
        return ELLIPSE_7.copy()
    # cv2's ellipse rasterization: per-row horizontal extent of an inscribed
    # ellipse with radii r = size//2, evaluated at dy = |i - r| - (1 - size%2)
    r = size // 2
    inv_r2 = 1.0 / (r * r) if r > 0 else 0.0
    k = np.zeros((size, size), dtype=np.float32)
    for i in range(size):
        dy = i - r
        if abs(dy) <= r:
            dx = int(round(r * np.sqrt(max(0.0, 1.0 - dy * dy * inv_r2))))
            k[i, max(0, r - dx):min(size, r + dx + 1)] = 1
    return k


def _conv2d_same(x: jnp.ndarray, kernel: np.ndarray, pad_value: float) -> jnp.ndarray:
    """Depthwise 2D conv on (..., H, W) with constant padding."""
    orig_shape = x.shape
    h, w = x.shape[-2], x.shape[-1]
    x2 = x.reshape(-1, 1, h, w)
    kh, kw = kernel.shape
    ph, pw = kh // 2, kw // 2
    x2 = jnp.pad(
        x2, ((0, 0), (0, 0), (ph, ph), (pw, pw)), mode='constant', constant_values=pad_value
    )
    k = jnp.asarray(kernel, x.dtype)[None, None]
    y = jax.lax.conv_general_dilated(
        x2, k, window_strides=(1, 1), padding='VALID',
        dimension_numbers=('NCHW', 'OIHW', 'NCHW'),
    )
    return y.reshape(orig_shape)


def dilate(mask: jnp.ndarray, kernel: np.ndarray = ELLIPSE_7) -> jnp.ndarray:
    """Binary dilation; mask is {0,1} float, any leading batch/channel dims."""
    y = _conv2d_same(mask.astype(jnp.float32), kernel, pad_value=0.0)
    return (y > 0.5).astype(mask.dtype)


def erode(mask: jnp.ndarray, kernel: np.ndarray = ELLIPSE_7) -> jnp.ndarray:
    """Binary erosion (cv2 border parity: outside counts as foreground)."""
    ksum = float(kernel.sum())
    y = _conv2d_same(mask.astype(jnp.float32), kernel, pad_value=1.0)
    return (y > ksum - 0.5).astype(mask.dtype)


def close(mask: jnp.ndarray, kernel: np.ndarray = ELLIPSE_5) -> jnp.ndarray:
    return erode(dilate(mask, kernel), kernel)


def open_(mask: jnp.ndarray, kernel: np.ndarray = ELLIPSE_5) -> jnp.ndarray:
    return dilate(erode(mask, kernel), kernel)


def gaussian_blur5(x: jnp.ndarray) -> jnp.ndarray:
    """cv2.GaussianBlur(x, (5,5), 0) parity (separable, REFLECT_101 border)."""
    orig_shape = x.shape
    h, w = x.shape[-2], x.shape[-1]
    x2 = x.reshape(-1, 1, h, w).astype(jnp.float32)
    x2 = jnp.pad(x2, ((0, 0), (0, 0), (2, 2), (2, 2)), mode='reflect')
    kcol = jnp.asarray(GAUSS_5)[None, None, :, None]
    krow = jnp.asarray(GAUSS_5)[None, None, None, :]
    dn = ('NCHW', 'OIHW', 'NCHW')
    y = jax.lax.conv_general_dilated(x2, kcol, (1, 1), 'VALID', dimension_numbers=dn)
    y = jax.lax.conv_general_dilated(y, krow, (1, 1), 'VALID', dimension_numbers=dn)
    return y.reshape(orig_shape)

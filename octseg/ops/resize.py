"""Device-side image resize with OpenCV-parity semantics.

The reference resizes with cv2.INTER_LINEAR for images and cv2.INTER_NEAREST
for masks on the host per frame (reference: src/models/smp/dataset.py:110-112,
src/predict.py:92-96). Here both run batched on device. DSC parity is
sensitive to the index conventions, so they are matched exactly:

- INTER_LINEAR: half-pixel centers, src = (dst + 0.5) * scale - 0.5, no
  antialiasing on downscale (cv2 does none).
- INTER_NEAREST: src = floor(dst * scale).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def resize_bilinear(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Resize NHWC (or HWC) to (H, W) = size with cv2.INTER_LINEAR semantics."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, c = x.shape
    out = jax.image.resize(x, (n, size[0], size[1], c), method='linear', antialias=False)
    return out[0] if squeeze else out


def _nearest_indices(out_size: int, in_size: int) -> jnp.ndarray:
    """cv2 resizeNN source index per output index, bit-exact.

    OpenCV computes inv_scale = double(out)/in, then the mapping scale as
    1.0/inv_scale — the DOUBLE-ROUNDED reciprocal, not in/out — and takes
    cvFloor(x*scale) (modules/imgproc/src/resize.cpp resizeNN). Both the
    reciprocal trick and the double precision matter: floor(x*(in/out)) or
    any float32 form is off by one row/col for hundreds of size pairs
    (e.g. 63->35 at x=15: cv2 26, exact rational 27). Sizes are static, so
    the indices are computed on host in float64 and constant-folded."""
    import numpy as np

    scale = 1.0 / (out_size / in_size)
    idx = np.floor(np.arange(out_size, dtype=np.float64) * scale).astype(np.int32)
    return jnp.asarray(np.clip(idx, 0, in_size - 1))


def resize_nearest(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Resize NHWC (or HWC) to size with cv2.INTER_NEAREST semantics."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, c = x.shape
    rows = _nearest_indices(size[0], h)
    cols = _nearest_indices(size[1], w)
    out = x[:, rows][:, :, cols]
    return out[0] if squeeze else out

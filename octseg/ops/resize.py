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
    scale = in_size / out_size
    idx = jnp.floor(jnp.arange(out_size, dtype=jnp.float32) * scale).astype(jnp.int32)
    return jnp.clip(idx, 0, in_size - 1)


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

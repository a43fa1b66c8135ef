"""Color-space conversion parity for the device augmentation pipeline."""

import cv2
import jax.numpy as jnp
import numpy as np

from octseg.ops.augment import _hsv_to_rgb, _rgb_to_hsv


def test_rgb_hsv_roundtrip(rng):
    rgb = rng.integers(0, 256, (32, 32, 3)).astype(np.float32)
    hsv = np.asarray(_rgb_to_hsv(jnp.asarray(rgb)))
    back = np.asarray(_hsv_to_rgb(jnp.asarray(hsv)))
    np.testing.assert_allclose(back, rgb, atol=1.5)


def test_rgb_to_hsv_matches_cv2(rng):
    rgb8 = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    ours = np.asarray(_rgb_to_hsv(jnp.asarray(rgb8, jnp.float32)))
    ref = cv2.cvtColor(rgb8, cv2.COLOR_RGB2HSV).astype(np.float32)
    # hue wraps at 180; compare circularly. cv2 quantizes to uint8, so allow
    # ~1.5 levels on each channel.
    dh = np.abs(ours[..., 0] - ref[..., 0])
    dh = np.minimum(dh, 180 - dh)
    assert dh.max() <= 1.5, dh.max()
    np.testing.assert_allclose(ours[..., 1], ref[..., 1], atol=1.5)
    np.testing.assert_allclose(ours[..., 2], ref[..., 2], atol=0.51)

"""SegmentationModel: encoder → decoder → segmentation head.

The octseg equivalent of smp.create_model-produced torch modules (reference:
src/models/smp/model.py:38-44). NHWC in, NHWC multilabel logits out — one
channel per selected class, channel order = the order of ``classes`` in the
model config (reference contract: src/models/smp/dataset.py:114-118).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from octseg.models.common import resize_bilinear_torch


class SegmentationHead(nn.Module):
    classes: int
    upsampling: int = 1
    kernel: int = 3  # SMP default; Linknet/FPN/DeepLab use 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel
        x = nn.Conv(
            self.classes, (k, k), padding=((k // 2, k // 2), (k // 2, k // 2)),
            dtype=self.dtype,
        )(x)
        if self.upsampling > 1:
            # SMP SegmentationHead upsamples with nn.UpsamplingBilinear2d,
            # i.e. align_corners=True — not jax.image.resize's half-pixel
            x = resize_bilinear_torch(
                x, (x.shape[1] * self.upsampling, x.shape[2] * self.upsampling),
                align_corners=True,
            )
        return x.astype(jnp.float32)  # logits always fp32 for stable loss


class SegmentationModel(nn.Module):
    encoder: nn.Module
    decoder: nn.Module
    classes: int
    head_upsampling: int = 1
    head_kernel: int = 3
    dtype: Any = jnp.float32

    def setup(self):
        self.head = SegmentationHead(
            self.classes, self.head_upsampling, self.head_kernel, dtype=self.dtype
        )

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.decode(self.encoder(x, train=train), train=train)

    def encode(self, x: jnp.ndarray, train: bool = False):
        """Feature pyramid only (CAM explainability taps these activations)."""
        return self.encoder(x, train=train)

    def decode(self, features, train: bool = False) -> jnp.ndarray:
        """Decoder + head over a (possibly perturbed) feature pyramid.

        Gradients of a target w.r.t. features[k] through this function are
        exactly d(target)/d(activation) — the quantity grad-CAM methods need —
        because all other pyramid levels are upstream of the tapped layer.
        """
        return self.head(self.decoder(features, train=train))

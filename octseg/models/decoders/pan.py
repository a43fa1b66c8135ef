"""PAN decoder: Feature Pyramid Attention + Global Attention Upsample blocks.

Capability parity target: SMP PAN (decoder_channels=32, upsampling=4 with a
stride-16 encoder — reference search space configs/tune.yaml:17).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from octseg.models.common import ConvBNAct, resize_to


class FPABlock(nn.Module):
    """Feature Pyramid Attention over the deepest feature map."""

    out_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, c = x.shape
        # global pooling branch
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = ConvBNAct(self.out_features, (1, 1), act=None, dtype=self.dtype)(g, train)
        g = jnp.broadcast_to(g, (n, h, w, self.out_features))
        # mid branch
        mid = ConvBNAct(self.out_features, (1, 1), act=None, dtype=self.dtype)(x, train)
        # pyramid branch: 7x7 / 5x5 / 3x3 at decreasing scales
        d1 = ConvBNAct(1, (7, 7), (2, 2), dtype=self.dtype)(x, train)  # 1/2
        d2 = ConvBNAct(1, (5, 5), (2, 2), dtype=self.dtype)(d1, train)  # 1/4
        d3 = ConvBNAct(1, (3, 3), (2, 2), dtype=self.dtype)(d2, train)  # 1/8
        d3 = ConvBNAct(1, (3, 3), dtype=self.dtype)(d3, train)
        d3 = resize_to(d3, d2.shape[1:3])
        d2 = ConvBNAct(1, (5, 5), dtype=self.dtype)(d2, train) + d3
        d2 = resize_to(d2, d1.shape[1:3])
        d1 = ConvBNAct(1, (7, 7), dtype=self.dtype)(d1, train) + d2
        attn = resize_to(d1, (h, w))
        return mid * attn + g


class GAUBlock(nn.Module):
    """Global Attention Upsample: gate low-level features by pooled high-level."""

    out_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, high, low, train: bool = False):
        low_p = ConvBNAct(self.out_features, (3, 3), dtype=self.dtype)(low, train)
        g = jnp.mean(high, axis=(1, 2), keepdims=True)
        g = ConvBNAct(self.out_features, (1, 1), act='sigmoid', dtype=self.dtype)(g, train)
        high_up = resize_to(high, low.shape[1:3], method='bilinear')
        if high_up.shape[-1] != self.out_features:
            high_up = ConvBNAct(self.out_features, (1, 1), act=None, dtype=self.dtype)(
                high_up, train
            )
        return high_up + low_p * g


class PANDecoder(nn.Module):
    decoder_channels: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, train: bool = False):
        x = FPABlock(self.decoder_channels, dtype=self.dtype)(features[5], train)
        for skip in (features[4], features[3], features[2]):
            x = GAUBlock(self.decoder_channels, dtype=self.dtype)(x, skip, train)
        return x  # 1/4 resolution

    @property
    def upsampling(self) -> int:
        return 4

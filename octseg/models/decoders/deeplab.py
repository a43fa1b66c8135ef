"""DeepLabV3 / DeepLabV3+ decoders with ASPP.

Capability parity targets: SMP DeepLabV3 (encoder output_stride=8,
upsampling=8) and DeepLabV3Plus (output_stride=16, low-level fusion at 1/4,
upsampling=4) — reference search space configs/tune.yaml:12-13.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from octseg.models.common import ConvBNAct, resize_to


class ASPP(nn.Module):
    out_features: int = 256
    atrous_rates: Sequence[int] = (12, 24, 36)
    separable: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, c = x.shape
        branches = [ConvBNAct(self.out_features, (1, 1), dtype=self.dtype)(x, train)]
        for rate in self.atrous_rates:
            if self.separable:
                y = ConvBNAct(
                    c, (3, 3), dilation=(rate, rate), groups=c, dtype=self.dtype
                )(x, train)
                y = ConvBNAct(self.out_features, (1, 1), dtype=self.dtype)(y, train)
            else:
                y = ConvBNAct(
                    self.out_features, (3, 3), dilation=(rate, rate), dtype=self.dtype
                )(x, train)
            branches.append(y)
        # image-level pooling branch
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = ConvBNAct(self.out_features, (1, 1), dtype=self.dtype)(g, train)
        g = jnp.broadcast_to(g, (n, h, w, self.out_features))
        branches.append(g)

        y = jnp.concatenate(branches, axis=-1)
        y = ConvBNAct(self.out_features, (1, 1), dtype=self.dtype)(y, train)
        y = nn.Dropout(0.5, deterministic=not train)(y)
        return y


class DeepLabV3Decoder(nn.Module):
    out_channels: int = 256
    dtype: Any = jnp.float32

    # encoder must run with output_stride=8
    @nn.compact
    def __call__(self, features, train: bool = False):
        x = ASPP(self.out_channels, dtype=self.dtype)(features[5], train)
        x = ConvBNAct(self.out_channels, (3, 3), dtype=self.dtype)(x, train)
        return x  # 1/8 resolution (encoder dilated)

    @property
    def upsampling(self) -> int:
        return 8


class DeepLabV3PlusDecoder(nn.Module):
    out_channels: int = 256
    low_level_channels: int = 48
    dtype: Any = jnp.float32

    # encoder must run with output_stride=16
    @nn.compact
    def __call__(self, features, train: bool = False):
        aspp = ASPP(self.out_channels, separable=True, dtype=self.dtype)(features[5], train)
        low = features[2]  # 1/4
        aspp = resize_to(aspp, low.shape[1:3], method='bilinear')
        low = ConvBNAct(self.low_level_channels, (1, 1), dtype=self.dtype)(low, train)
        x = jnp.concatenate([aspp, low], axis=-1)
        x = ConvBNAct(self.out_channels, (3, 3), dtype=self.dtype)(x, train)
        x = ConvBNAct(self.out_channels, (3, 3), dtype=self.dtype)(x, train)
        return x  # 1/4 resolution

    @property
    def upsampling(self) -> int:
        return 4

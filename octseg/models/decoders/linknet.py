"""LinkNet decoder: channel-reduced transposed-conv blocks with additive skips.

Capability parity target: SMP Linknet (winning FC_LC model in the reference is
LinkNet/efficientnet-b7 — BASELINE.md).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from octseg.models.rematutil import maybe_remat
from octseg.models.common import ConvBNAct


class LinkNetDecoderBlock(nn.Module):
    """1x1 reduce -> ConvTranspose(4, stride 2) upsample -> 1x1 expand.

    Op-for-op the SMP Linknet DecoderBlock (Conv2dReLU + TransposeX2 +
    Conv2dReLU), so torch checkpoints convert exactly. The transposed conv
    uses torch's (kernel 4, stride 2, padding 1) output geometry: flax
    padding (k-1-p) = 2 per side.
    """

    out_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_features = x.shape[-1]
        y = ConvBNAct(in_features // 4, (1, 1), dtype=self.dtype)(x, train)
        y = nn.ConvTranspose(
            in_features // 4,
            (4, 4),
            strides=(2, 2),
            padding=((2, 2), (2, 2)),
            transpose_kernel=True,
            use_bias=False,
            dtype=self.dtype,
        )(y)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype,
        )(y)
        y = nn.relu(y)
        y = ConvBNAct(self.out_features, (1, 1), dtype=self.dtype)(y, train)
        return y


class LinkNetDecoder(nn.Module):
    prefinal_channels: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, train: bool = False):
        skips = [features[4], features[3], features[2], features[1]]
        x = features[5]
        for skip in skips:
            x = maybe_remat(LinkNetDecoderBlock)(skip.shape[-1], dtype=self.dtype)(x, train)
            x = x + skip
        x = LinkNetDecoderBlock(self.prefinal_channels, dtype=self.dtype)(x, train)
        return x  # full resolution

    @property
    def upsampling(self) -> int:
        return 1

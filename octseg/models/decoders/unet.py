"""U-Net and U-Net++ decoders over the 6-level encoder pyramid.

Capability parity targets: SMP Unet / UnetPlusPlus as used by the reference
(configs/tune.yaml:10-19; winning Lumen config is U-Net++/resnet101 —
BASELINE.md). Built NHWC with broadcast-trick nearest upsampling.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from octseg.models.rematutil import maybe_remat
from octseg.models.common import Attention2D, ConvBNAct, upsample


class DecoderBlock(nn.Module):
    features: int
    use_attention: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None, train: bool = False):
        x = upsample(x, 2)
        if skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)
        # SMP's DecoderBlock applies attention TWICE: attention1 on the
        # upsample+skip concatenation, attention2 after conv2
        if self.use_attention:
            x = Attention2D(dtype=self.dtype)(x)
        x = ConvBNAct(self.features, (3, 3), dtype=self.dtype)(x, train)
        x = ConvBNAct(self.features, (3, 3), dtype=self.dtype)(x, train)
        if self.use_attention:
            x = Attention2D(dtype=self.dtype)(x)
        return x


class UnetDecoder(nn.Module):
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    use_attention: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, train: bool = False):
        # features: [f0(1x), f1(1/2), f2(1/4), f3(1/8), f4(1/16), f5(1/32)]
        head = features[5]
        skips = [features[4], features[3], features[2], features[1], None]
        x = head
        for ch, skip in zip(self.decoder_channels, skips):
            x = maybe_remat(DecoderBlock, static_argnums=(3,))(
                ch, self.use_attention, dtype=self.dtype)(x, skip, train)
        return x  # full resolution

    @property
    def upsampling(self) -> int:
        return 1


class UnetPlusPlusDecoder(nn.Module):
    """Nested dense-skip decoder (U-Net++).

    Structurally isomorphic to SMP's UnetPlusPlusDecoder (the reference's
    Lumen winner wraps it, src/models/smp/model.py:38-44): node (i, j) here is
    SMP's ``x_{4-i-j}_{3-i}`` and the final full-res block is ``x_0_4``.
    Channel policy and concat order follow SMP so torch checkpoints convert
    weight-for-weight (octseg.models.convert_torch):
    - nodes on the last column of each level (j == 4-i) output
      decoder_channels[3-i]; all other grid nodes output the encoder channel
      count of their level,
    - concatenation is [upsampled-below, column j-1, ..., column 1, encoder].
    """

    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, train: bool = False):
        # Encoder levels used by the grid: e1..e5 at 1/2..1/32 (e0 = input
        # resolution level has no encoder feature; final block upsamples to 1x).
        enc = [features[1], features[2], features[3], features[4], features[5]]
        # grid[i][j]: node at pyramid level i (spatial 1/2**(i+1)), column j.
        # column 0 is the encoder feature itself.
        depth = 4  # number of up-steps inside the grid (to level of e1)
        grid = {(i, 0): enc[i] for i in range(5)}
        # dense nested columns
        for j in range(1, depth + 1):
            for i in range(0, 5 - j):
                below = grid[(i + 1, j - 1)]
                same_level = [grid[(i, k)] for k in range(j - 1, -1, -1)]
                if j == 4 - i:  # last column at this level
                    ch = self.decoder_channels[3 - i]
                else:
                    ch = enc[i].shape[-1]
                x = upsample(below, 2)
                x = jnp.concatenate([x] + same_level, axis=-1)
                x = ConvBNAct(ch, (3, 3), dtype=self.dtype)(x, train)
                x = ConvBNAct(ch, (3, 3), dtype=self.dtype)(x, train)
                grid[(i, j)] = x
        # final up-step from 1/2 to full resolution
        x = upsample(grid[(0, depth)], 2)
        x = ConvBNAct(self.decoder_channels[-1], (3, 3), dtype=self.dtype)(x, train)
        x = ConvBNAct(self.decoder_channels[-1], (3, 3), dtype=self.dtype)(x, train)
        return x

    @property
    def upsampling(self) -> int:
        return 1

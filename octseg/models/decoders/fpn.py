"""FPN decoder — SMP-channel-exact.

Mirrors smp.decoders.fpn.decoder.FPNDecoder as the reference creates it via
smp.create_model('FPN', ...) with all defaults (reference:
src/models/smp/model.py:38-44; search space configs/tune.yaml:10-19):
p5 lateral 1x1 (bias), FPNBlocks p4/p3/p2 (nearest x2 up + 1x1 skip conv),
four SegmentationBlocks of Conv3x3(no bias)+GroupNorm(32)+ReLU with nearest
x2 upsampling AFTER each block (n_upsamples = 3/2/1/0), merge policy 'add',
spatial Dropout2d(0.2). Output at 1/4; the model head is 1x1 with
UpsamplingBilinear2d(4). Flax module names track the torch state-dict names
so octseg.models.convert_torch maps checkpoints weight-for-weight.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from octseg.models.common import ConvGNAct, upsample


class FPNDecoder(nn.Module):
    pyramid_channels: int = 256
    segmentation_channels: int = 128
    dropout: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, train: bool = False):
        c2, c3, c4, c5 = features[2], features[3], features[4], features[5]
        # lateral 1x1 convs (bias=True, torch nn.Conv2d default) + top-down
        # nearest-x2 pathway: FPNBlock adds AFTER upsampling the deeper map
        p5 = nn.Conv(self.pyramid_channels, (1, 1), name='p5', dtype=self.dtype)(c5)
        p4 = upsample(p5, 2) + nn.Conv(
            self.pyramid_channels, (1, 1), name='p4_skip', dtype=self.dtype)(c4)
        p3 = upsample(p4, 2) + nn.Conv(
            self.pyramid_channels, (1, 1), name='p3_skip', dtype=self.dtype)(c3)
        p2 = upsample(p3, 2) + nn.Conv(
            self.pyramid_channels, (1, 1), name='p2_skip', dtype=self.dtype)(c2)

        # SegmentationBlocks: n_upsamples upsample-after-conv stages; a block
        # with n_upsamples == 0 is a single conv with no upsampling
        outs = []
        for idx, (p, n_up) in enumerate(((p5, 3), (p4, 2), (p3, 1), (p2, 0))):
            s = p
            for j in range(max(n_up, 1)):
                s = ConvGNAct(self.segmentation_channels,
                              name=f'seg_{idx}_{j}', dtype=self.dtype)(s)
                if n_up > 0:
                    s = upsample(s, 2)
            outs.append(s)
        x = outs[0] + outs[1] + outs[2] + outs[3]  # MergeBlock policy 'add'
        # torch Dropout2d drops whole channel maps — broadcast over H, W
        x = nn.Dropout(self.dropout, broadcast_dims=(1, 2),
                       deterministic=not train)(x)
        return x  # 1/4 resolution

    @property
    def upsampling(self) -> int:
        return 4

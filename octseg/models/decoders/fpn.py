"""FPN decoder: lateral top-down pyramid + merged segmentation branches.

Capability parity target: SMP FPN (reference search space configs/tune.yaml:14).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from octseg.models.common import ConvBNAct, upsample


class FPNDecoder(nn.Module):
    pyramid_channels: int = 256
    segmentation_channels: int = 128
    dropout: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, train: bool = False):
        c2, c3, c4, c5 = features[2], features[3], features[4], features[5]
        # lateral connections + top-down pathway
        p5 = nn.Conv(self.pyramid_channels, (1, 1), dtype=self.dtype)(c5)
        p4 = nn.Conv(self.pyramid_channels, (1, 1), dtype=self.dtype)(c4) + upsample(p5, 2)
        p3 = nn.Conv(self.pyramid_channels, (1, 1), dtype=self.dtype)(c3) + upsample(p4, 2)
        p2 = nn.Conv(self.pyramid_channels, (1, 1), dtype=self.dtype)(c2) + upsample(p3, 2)

        # segmentation blocks: conv + upsample each pyramid level to 1/4
        outs = []
        for p, n_up in ((p5, 3), (p4, 2), (p3, 1), (p2, 0)):
            s = p
            for i in range(max(n_up, 1)):
                s = ConvBNAct(
                    self.segmentation_channels, (3, 3), use_bn=False, use_bias=True,
                    act='relu', dtype=self.dtype,
                )(s, train)
                # GroupNorm(32) is the SMP choice; BN-free conv keeps it simple
                s = nn.GroupNorm(num_groups=32, dtype=self.dtype)(s)
                s = nn.relu(s)
                if i < n_up:
                    s = upsample(s, 2)
            outs.append(s)
        x = sum(outs)  # merge policy 'add'
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x  # 1/4 resolution

    @property
    def upsampling(self) -> int:
        return 4

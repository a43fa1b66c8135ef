"""PSPNet decoder — SMP-channel-exact.

Mirrors smp.decoders.pspnet.decoder.PSPDecoder as the reference creates it
via smp.create_model('PSPNet', ...) with all defaults (reference:
src/models/smp/model.py:38-44; search space configs/tune.yaml:10-19):
encoder_depth=3 (the decoder consumes the 1/8 feature map; the deeper
encoder stages exist in the checkpoint but are unused), PSPModule with bins
(1, 2, 3, 6) where each branch has in_channels//4 channels — Conv1x1+BN+ReLU
except the 1-bin branch which drops BN (BatchNorm over a 1x1 map; SMP
disables it) and so has a conv bias — bilinear align_corners=True upsample
back, concat order [branch1, branch2, branch3, branch6, x], then
Conv1x1(2*in_channels -> 512)+BN+ReLU and spatial Dropout2d(0.2). Output at
1/8; the model head is 3x3 with UpsamplingBilinear2d(8).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from octseg.models.common import ConvBNAct, resize_bilinear_torch


def adaptive_avg_pool(x: jnp.ndarray, bins: int) -> jnp.ndarray:
    """Exact torch AdaptiveAvgPool2d semantics with static shapes."""
    n, h, w, c = x.shape
    rows = []
    for i in range(bins):
        cols = []
        h0, h1 = (i * h) // bins, ((i + 1) * h + bins - 1) // bins
        for j in range(bins):
            w0, w1 = (j * w) // bins, ((j + 1) * w + bins - 1) // bins
            cols.append(jnp.mean(x[:, h0:h1, w0:w1, :], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # (n, bins, bins, c)


class PSPDecoder(nn.Module):
    psp_out_channels: int = 512
    bins: Sequence[int] = (1, 2, 3, 6)
    dropout: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, train: bool = False):
        x = features[3]  # 1/8 (SMP PSPNet uses encoder_depth=3)
        n, h, w, c = x.shape
        branch_ch = c // len(self.bins)
        branches = []
        for bi, b in enumerate(self.bins):
            p = adaptive_avg_pool(x, b)
            # SMP disables BN on the 1-bin branch (1x1 spatial map), so that
            # branch's conv carries a bias
            p = ConvBNAct(branch_ch, (1, 1), use_bn=(b != 1),
                          name=f'psp_{bi}', dtype=self.dtype)(p, train)
            p = resize_bilinear_torch(p, (h, w), align_corners=True)
            branches.append(p)
        x = jnp.concatenate(branches + [x], axis=-1)
        x = ConvBNAct(self.psp_out_channels, (1, 1),
                      name='conv', dtype=self.dtype)(x, train)
        # torch Dropout2d: whole-channel dropout
        x = nn.Dropout(self.dropout, broadcast_dims=(1, 2),
                       deterministic=not train)(x)
        return x  # 1/8 resolution

    @property
    def upsampling(self) -> int:
        return 8

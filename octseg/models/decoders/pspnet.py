"""PSPNet decoder: pyramid scene parsing pooling over the 1/8 feature map.

Capability parity target: SMP PSPNet (encoder_depth=3, psp_out_channels=512,
upsampling=8 — reference search space configs/tune.yaml:16).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from octseg.models.common import ConvBNAct, resize_to


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


class PSPModule(nn.Module):
    out_features: int
    bins: Sequence[int] = (1, 2, 3, 6)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, c = x.shape
        branch_ch = self.out_features // len(self.bins)
        branches = [x]
        for b in self.bins:
            p = adaptive_avg_pool(x, b)
            p = ConvBNAct(branch_ch, (1, 1), dtype=self.dtype)(p, train)
            p = resize_to(p, (h, w), method='bilinear')
            branches.append(p)
        return jnp.concatenate(branches, axis=-1)


class PSPDecoder(nn.Module):
    psp_out_channels: int = 512
    dropout: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, train: bool = False):
        x = features[3]  # 1/8 (SMP PSPNet uses encoder_depth=3)
        x = PSPModule(self.psp_out_channels, dtype=self.dtype)(x, train)
        x = ConvBNAct(self.psp_out_channels, (1, 1), dtype=self.dtype)(x, train)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x  # 1/8 resolution

    @property
    def upsampling(self) -> int:
        return 8

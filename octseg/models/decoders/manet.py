"""MA-Net decoder: position-attention bottleneck + multiscale fusion blocks.

Capability parity target: SMP MAnet (decoder_channels (256,128,64,32,16),
reduction=16 — reference search space configs/tune.yaml:18).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from octseg.models.common import ConvBNAct, upsample


class PABlock(nn.Module):
    """Position attention block (spatial self-attention on the deepest map).

    The token count at 1/32 of a 512-896px input is 256-784, so the NxN
    attention matmul maps cleanly onto the MXU.
    """

    pab_channels: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, c = x.shape
        q = nn.Conv(self.pab_channels, (1, 1), dtype=self.dtype)(x).reshape(n, h * w, -1)
        k = nn.Conv(self.pab_channels, (1, 1), dtype=self.dtype)(x).reshape(n, h * w, -1)
        v = nn.Conv(c, (1, 1), dtype=self.dtype)(x).reshape(n, h * w, c)
        logits = jnp.einsum('nqc,nkc->nqk', q, k, preferred_element_type=jnp.float32)
        weights = nn.softmax(logits, axis=-1).astype(v.dtype)
        y = jnp.einsum('nqk,nkc->nqc', weights, v, preferred_element_type=jnp.float32)
        y = y.reshape(n, h, w, c).astype(x.dtype)
        return ConvBNAct(c, (3, 3), dtype=self.dtype)(x + y, train)


class MFABlock(nn.Module):
    """Multiscale fusion attention block: channel-attention gated skip fusion."""

    features: int
    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None, train: bool = False):
        x = upsample(x, 2)
        if skip is not None:
            # channel attention over the concatenated features
            cat = jnp.concatenate([x, skip], axis=-1)
            g = jnp.mean(cat, axis=(1, 2), keepdims=True)
            g = nn.Conv(max(cat.shape[-1] // self.reduction, 1), (1, 1), dtype=self.dtype)(g)
            g = nn.relu(g)
            g = nn.Conv(cat.shape[-1], (1, 1), dtype=self.dtype)(g)
            x = cat * nn.sigmoid(g)
        x = ConvBNAct(self.features, (3, 3), dtype=self.dtype)(x, train)
        x = ConvBNAct(self.features, (3, 3), dtype=self.dtype)(x, train)
        return x


class MAnetDecoder(nn.Module):
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, train: bool = False):
        x = PABlock(dtype=self.dtype)(features[5], train)
        skips = [features[4], features[3], features[2], features[1], None]
        for ch, skip in zip(self.decoder_channels, skips):
            x = MFABlock(ch, self.reduction, dtype=self.dtype)(x, skip, train)
        return x  # full resolution

    @property
    def upsampling(self) -> int:
        return 1

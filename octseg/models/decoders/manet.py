"""MA-Net decoder — SMP-channel-exact.

Mirrors smp.decoders.manet.decoder.MAnetDecoder as the reference creates it
via smp.create_model('MAnet', ...) with all defaults (reference:
src/models/smp/model.py:38-44; search space configs/tune.yaml:10-19):
PAB center block on the deepest map (pab_channels=64), then per level either
an MFAB (when an encoder skip exists) or a plain U-Net DecoderBlock (the
final, skip-less level). decoder_channels (256, 128, 64, 32, 16),
reduction=16, use_batchnorm=True.

Two SMP PAB quirks are reproduced bit-for-bit because trained checkpoints
bake them in:
- the attention softmax runs over the FLATTENED (hw*hw) logits, not per
  query row (smp: map_softmax(sp_map.view(b, -1)).view(b, hw, hw));
- the attended (b, hw, c) tensor is raw-reshaped to (b, c, h, w) without a
  transpose, scrambling the channel/space axes (smp:
  sp_map.reshape(bsize, in_channels, h, w)).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from octseg.models.common import ConvBNAct, upsample


class PABlock(nn.Module):
    """SMP PAB: position attention on the deepest map (names top/center/
    bottom/out mirror top_conv/center_conv/bottom_conv/out_conv)."""

    pab_channels: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, c = x.shape
        top = nn.Conv(self.pab_channels, (1, 1), name='top',
                      dtype=self.dtype)(x).reshape(n, h * w, -1)
        center = nn.Conv(self.pab_channels, (1, 1), name='center',
                         dtype=self.dtype)(x).reshape(n, h * w, -1)
        bottom = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)), name='bottom',
                         dtype=self.dtype)(x).reshape(n, h * w, c)
        # sp_map[q, k] = <center[q], top[k]>  (torch: x_center^T @ x_top)
        logits = jnp.einsum('nqc,nkc->nqk', center, top,
                            preferred_element_type=jnp.float32)
        # SMP softmaxes over the flattened hw*hw matrix, not per row
        weights = jax.nn.softmax(
            logits.reshape(n, -1), axis=-1).reshape(n, h * w, h * w)
        y = jnp.einsum('nqk,nkc->nqc', weights.astype(bottom.dtype), bottom,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        # SMP raw-reshapes (b, hw, c) -> (b, c, h, w); replicate the exact
        # element order, then convert to NHWC
        y = y.reshape(n, c, h, w).transpose(0, 2, 3, 1)
        x = x + y
        return nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)), name='out',
                       dtype=self.dtype)(x)


class MFABlock(nn.Module):
    """SMP MFAB: hl_conv (3x3 then 1x1 to skip channels), nearest x2 up,
    dual SE gates (SE_hl on x, SE_ll on skip) summed, concat, two 3x3."""

    features: int
    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        skip_ch = skip.shape[-1]
        x = ConvBNAct(x.shape[-1], (3, 3), name='hl_conv_0',
                      dtype=self.dtype)(x, train)
        x = ConvBNAct(skip_ch, (1, 1), name='hl_conv_1',
                      dtype=self.dtype)(x, train)
        x = upsample(x, 2)
        rd = max(1, skip_ch // self.reduction)

        def se(name, t):
            g = jnp.mean(t, axis=(1, 2), keepdims=True)
            g = nn.Conv(rd, (1, 1), name=f'{name}_fc1', dtype=self.dtype)(g)
            g = nn.relu(g)
            g = nn.Conv(skip_ch, (1, 1), name=f'{name}_fc2', dtype=self.dtype)(g)
            return jax.nn.sigmoid(g)

        attention = se('se_hl', x) + se('se_ll', skip)
        x = x * attention
        x = jnp.concatenate([x, skip], axis=-1)
        x = ConvBNAct(self.features, (3, 3), name='conv1',
                      dtype=self.dtype)(x, train)
        x = ConvBNAct(self.features, (3, 3), name='conv2',
                      dtype=self.dtype)(x, train)
        return x


class PlainDecoderBlock(nn.Module):
    """SMP Unet DecoderBlock (no skip) — MAnet's final, full-res level."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = upsample(x, 2)
        x = ConvBNAct(self.features, (3, 3), name='conv1',
                      dtype=self.dtype)(x, train)
        x = ConvBNAct(self.features, (3, 3), name='conv2',
                      dtype=self.dtype)(x, train)
        return x


class MAnetDecoder(nn.Module):
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    reduction: int = 16
    pab_channels: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, train: bool = False):
        x = PABlock(self.pab_channels, name='center',
                    dtype=self.dtype)(features[5], train)
        skips = [features[4], features[3], features[2], features[1]]
        for i, ch in enumerate(self.decoder_channels):
            if i < len(skips):
                x = MFABlock(ch, self.reduction, name=f'block{i}',
                             dtype=self.dtype)(x, skips[i], train)
            else:
                x = PlainDecoderBlock(ch, name=f'block{i}',
                                      dtype=self.dtype)(x, train)
        return x  # full resolution

    @property
    def upsampling(self) -> int:
        return 1

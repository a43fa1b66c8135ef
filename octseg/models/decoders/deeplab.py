"""DeepLabV3 / DeepLabV3+ decoders — SMP-channel-exact.

Mirrors smp.decoders.deeplabv3.decoder as the reference creates the models
via smp.create_model('DeepLabV3'/'DeepLabV3Plus', ...) with all defaults
(reference: src/models/smp/model.py:38-44; search space
configs/tune.yaml:10-19):

- DeepLabV3: encoder output_stride=8; decoder = ASPP(256, rates 12/24/36,
  dense convs) followed by Conv3x3(no bias)+BN+ReLU; head 1x1 with
  UpsamplingBilinear2d(8).
- DeepLabV3Plus: encoder output_stride=16; aspp = ASPP(separable=True) +
  SeparableConv3x3+BN+ReLU, UpsamplingBilinear2d(4) up, low-level 1/4
  features through Conv1x1(48)+BN+ReLU, concat, SeparableConv3x3+BN+ReLU;
  head 1x1 with UpsamplingBilinear2d(4).

ASPP structure (smp ASPP): convs = [Conv1x1+BN+ReLU, three (separable or
dense) dilated Conv3x3+BN+ReLU, pooling branch Conv1x1+BN+ReLU broadcast
back], concat (5*out), project Conv1x1+BN+ReLU+Dropout(0.5, elementwise).
All ASPP/decoder convs are bias-free except none (every conv before a BN and
the separable pointwise convs are created with bias=False in smp).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from octseg.models.common import ConvBNAct, resize_bilinear_torch


class SeparableConvBNAct(nn.Module):
    """smp SeparableConv2d (depthwise + pointwise 1x1, both bias-free)
    followed by BN + ReLU, as used in ASPPSeparableConv and the V3+ blocks."""

    features: int
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        d = self.dilation
        x = nn.Conv(c, (3, 3), kernel_dilation=(d, d), feature_group_count=c,
                    padding=((d, d), (d, d)), use_bias=False,
                    name='dw', dtype=self.dtype)(x)
        x = ConvBNAct(self.features, (1, 1), act='relu',
                      name='pw', dtype=self.dtype)(x, train)
        return x


class ASPP(nn.Module):
    out_features: int = 256
    atrous_rates: Sequence[int] = (12, 24, 36)
    separable: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, c = x.shape
        branches = [ConvBNAct(self.out_features, (1, 1), name='convs0',
                              dtype=self.dtype)(x, train)]
        for i, rate in enumerate(self.atrous_rates):
            if self.separable:
                y = SeparableConvBNAct(self.out_features, dilation=rate,
                                       name=f'convs{i + 1}',
                                       dtype=self.dtype)(x, train)
            else:
                y = ConvBNAct(self.out_features, (3, 3),
                              dilation=(rate, rate), name=f'convs{i + 1}',
                              dtype=self.dtype)(x, train)
            branches.append(y)
        # pooling branch: ASPPPooling upsamples the 1x1 map back with
        # bilinear align_corners=False — a broadcast from one pixel
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = ConvBNAct(self.out_features, (1, 1), name='convs4',
                      dtype=self.dtype)(g, train)
        branches.append(jnp.broadcast_to(g, (n, h, w, self.out_features)))

        y = jnp.concatenate(branches, axis=-1)
        y = ConvBNAct(self.out_features, (1, 1), name='project',
                      dtype=self.dtype)(y, train)
        # torch nn.Dropout: elementwise (NOT Dropout2d)
        y = nn.Dropout(0.5, deterministic=not train)(y)
        return y


class DeepLabV3Decoder(nn.Module):
    out_channels: int = 256
    dtype: Any = jnp.float32

    # encoder must run with output_stride=8
    @nn.compact
    def __call__(self, features, train: bool = False):
        x = ASPP(self.out_channels, name='aspp', dtype=self.dtype)(
            features[5], train)
        x = ConvBNAct(self.out_channels, (3, 3), name='conv',
                      dtype=self.dtype)(x, train)
        return x  # 1/8 resolution (encoder dilated)

    @property
    def upsampling(self) -> int:
        return 8


class DeepLabV3PlusDecoder(nn.Module):
    out_channels: int = 256
    low_level_channels: int = 48  # paper value, smp default
    dtype: Any = jnp.float32

    # encoder must run with output_stride=16
    @nn.compact
    def __call__(self, features, train: bool = False):
        x = ASPP(self.out_channels, separable=True, name='aspp',
                 dtype=self.dtype)(features[5], train)
        x = SeparableConvBNAct(self.out_channels, name='aspp_sep',
                               dtype=self.dtype)(x, train)
        low = features[2]  # 1/4
        # nn.UpsamplingBilinear2d(scale_factor=4): align_corners=True
        x = resize_bilinear_torch(x, low.shape[1:3], align_corners=True)
        low = ConvBNAct(self.low_level_channels, (1, 1), name='block1',
                        dtype=self.dtype)(low, train)
        x = jnp.concatenate([x, low], axis=-1)
        x = SeparableConvBNAct(self.out_channels, name='block2',
                               dtype=self.dtype)(x, train)
        return x  # 1/4 resolution

    @property
    def upsampling(self) -> int:
        return 4

"""PAN decoder — SMP-channel-exact.

Mirrors smp.decoders.pan.decoder.PANDecoder as the reference creates it via
smp.create_model('PAN', ...) with all defaults (reference:
src/models/smp/model.py:38-44; search space configs/tune.yaml:10-19):
encoder_output_stride=16 (last encoder stage dilated), decoder_channels=32.

FPABlock on features[-1]: global-pool branch (ConvBnRelu 1x1 -> broadcast
back), mid branch (ConvBnRelu 1x1), and a 1-channel pyramid: MaxPool2x2 +
ConvBnRelu7x7, MaxPool + ConvBnRelu5x5, MaxPool + two ConvBnRelu3x3, merged
bottom-up with bilinear align_corners=True upsampling through conv5/conv7
laterals; attention map multiplies mid, plus the global branch.

GAUBlock(x_low, y_high): y upsampled (bilinear align_corners=True) +
conv2(x_low) * sigmoid-gated pooled y (ConvBnRelu 1x1 without ReLU).
Output at 1/4; the model head is 3x3 with UpsamplingBilinear2d(4).

All ConvBnRelu convs carry a bias (torch nn.Conv2d default, bias=True).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from octseg.models.common import resize_bilinear_torch


class ConvBnRelu(nn.Module):
    """SMP PAN's ConvBnRelu: conv (with bias) -> BN -> optional ReLU."""

    features: int
    kernel_size: int = 1
    add_relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel_size
        x = nn.Conv(self.features, (k, k),
                    padding=((k // 2, k // 2), (k // 2, k // 2)),
                    use_bias=True, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        return nn.relu(x) if self.add_relu else x


def _maxpool2(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class FPABlock(nn.Module):
    """Feature Pyramid Attention over the deepest feature map."""

    out_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, c = x.shape
        # global pooling branch: AdaptiveAvgPool2d(1) + ConvBnRelu, then
        # bilinear back to (h, w) — from a 1x1 map that is a broadcast
        b1 = jnp.mean(x, axis=(1, 2), keepdims=True)
        b1 = ConvBnRelu(self.out_features, 1, name='branch1',
                        dtype=self.dtype)(b1, train)
        b1 = jnp.broadcast_to(b1, (n, h, w, self.out_features))
        # mid branch
        mid = ConvBnRelu(self.out_features, 1, name='mid',
                         dtype=self.dtype)(x, train)
        # 1-channel pyramid: maxpool BEFORE each conv
        x1 = ConvBnRelu(1, 7, name='down1', dtype=self.dtype)(_maxpool2(x), train)
        x2 = ConvBnRelu(1, 5, name='down2', dtype=self.dtype)(_maxpool2(x1), train)
        x3 = ConvBnRelu(1, 3, name='down3_0', dtype=self.dtype)(_maxpool2(x2), train)
        x3 = ConvBnRelu(1, 3, name='down3_1', dtype=self.dtype)(x3, train)
        x3 = resize_bilinear_torch(x3, (h // 4, w // 4), align_corners=True)
        x2 = ConvBnRelu(1, 5, name='conv2', dtype=self.dtype)(x2, train)
        a = x2 + x3
        a = resize_bilinear_torch(a, (h // 2, w // 2), align_corners=True)
        x1 = ConvBnRelu(1, 7, name='conv1', dtype=self.dtype)(x1, train)
        a = a + x1
        a = resize_bilinear_torch(a, (h, w), align_corners=True)
        return a * mid + b1  # 1-channel attention broadcasts over channels


class GAUBlock(nn.Module):
    """Global Attention Upsample: gate low-level features by pooled high-level."""

    out_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, high, low, train: bool = False):
        # conv1: pooled high -> ConvBnRelu(no relu) -> sigmoid gate
        g = jnp.mean(high, axis=(1, 2), keepdims=True)
        g = ConvBnRelu(self.out_features, 1, add_relu=False, name='conv1',
                       dtype=self.dtype)(g, train)
        g = jax.nn.sigmoid(g)
        low_p = ConvBnRelu(self.out_features, 3, name='conv2',
                           dtype=self.dtype)(low, train)
        high_up = resize_bilinear_torch(high, low.shape[1:3], align_corners=True)
        return high_up + low_p * g


class PANDecoder(nn.Module):
    decoder_channels: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, train: bool = False):
        x = FPABlock(self.decoder_channels, name='fpa',
                     dtype=self.dtype)(features[5], train)
        for i, skip in enumerate((features[4], features[3], features[2])):
            x = GAUBlock(self.decoder_channels, name=f'gau{3 - i}',
                         dtype=self.dtype)(x, skip, train)
        return x  # 1/4 resolution

    @property
    def upsampling(self) -> int:
        return 4

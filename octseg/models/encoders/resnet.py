"""ResNet encoder family (18/34/50/101/152) as a 6-level feature pyramid.

Capability parity with the reference's SMP resnet encoders (reference:
src/models/smp/model.py:38-44 instantiates smp encoders; configs/tune.yaml
lists resnet18/50/101). Designed NHWC/TPU-first rather than ported: dilation
support for DeepLab-style output strides is threaded through each stage.

Feature pyramid contract (shared by all octseg encoders):
    __call__(x, train) -> [f0, f1, f2, f3, f4, f5]
where f_i has spatial reduction 2**i (subject to output_stride capping) and
channel counts given by ``out_channels``.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from octseg.models.rematutil import maybe_remat
from octseg.models.common import ConvBNAct


class BasicBlock(nn.Module):
    features: int
    strides: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        residual = x
        y = ConvBNAct(self.features, (3, 3), self.strides, self.dilation, dtype=self.dtype)(
            x, train
        )
        y = ConvBNAct(self.features, (3, 3), (1, 1), self.dilation, act=None, dtype=self.dtype)(
            y, train
        )
        if residual.shape != y.shape:
            residual = ConvBNAct(
                self.features, (1, 1), self.strides, act=None, dtype=self.dtype
            )(x, train)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is 4x
    strides: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        residual = x
        y = ConvBNAct(self.features, (1, 1), dtype=self.dtype)(x, train)
        y = ConvBNAct(self.features, (3, 3), self.strides, self.dilation, dtype=self.dtype)(
            y, train
        )
        y = ConvBNAct(self.features * 4, (1, 1), act=None, dtype=self.dtype)(y, train)
        if residual.shape != y.shape:
            residual = ConvBNAct(
                self.features * 4, (1, 1), self.strides, act=None, dtype=self.dtype
            )(x, train)
        return nn.relu(y + residual)


_CONFIGS = {
    'resnet18': dict(block=BasicBlock, layers=(2, 2, 2, 2), widths=(64, 128, 256, 512)),
    'resnet34': dict(block=BasicBlock, layers=(3, 4, 6, 3), widths=(64, 128, 256, 512)),
    'resnet50': dict(block=Bottleneck, layers=(3, 4, 6, 3), widths=(64, 128, 256, 512)),
    'resnet101': dict(block=Bottleneck, layers=(3, 4, 23, 3), widths=(64, 128, 256, 512)),
    'resnet152': dict(block=Bottleneck, layers=(3, 8, 36, 3), widths=(64, 128, 256, 512)),
}


def resnet_out_channels(name: str) -> Sequence[int]:
    cfg = _CONFIGS[name]
    mult = 4 if cfg['block'] is Bottleneck else 1
    return (3, 64) + tuple(w * mult for w in cfg['widths'])


class ResNetEncoder(nn.Module):
    variant: str = 'resnet50'
    output_stride: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        cfg = _CONFIGS[self.variant]
        block, layers, widths = cfg['block'], cfg['layers'], cfg['widths']
        block = maybe_remat(block)  # per-block checkpointing when enabled

        features = [x]
        y = ConvBNAct(64, (7, 7), (2, 2), dtype=self.dtype)(x, train)  # 1/2
        features.append(y)
        # torch maxpool semantics: kernel 3, stride 2, symmetric padding 1
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))  # 1/4

        current_stride = 4
        dilation = 1
        for stage_idx, (n_blocks, width) in enumerate(zip(layers, widths)):
            stage_stride = 1 if stage_idx == 0 else 2
            if stage_stride == 2 and current_stride >= self.output_stride:
                # swap stride for dilation (DeepLab-style output_stride capping)
                dilation *= 2
                stage_stride = 1
            else:
                current_stride *= stage_stride
            for block_idx in range(n_blocks):
                y = block(
                    width,
                    strides=(stage_stride, stage_stride) if block_idx == 0 else (1, 1),
                    dilation=(dilation, dilation),
                    dtype=self.dtype,
                )(y, train)
            features.append(y)
        return features

"""RegNetX/Y encoder family as a 6-level feature pyramid.

Covers the timm-regnetx_002 / timm-regnetx_064 / timm-regnety_120 encoders in
the reference search space (reference: configs/tune.yaml:20-28). Stage widths,
depths and group widths follow the RegNet paper tabulations; RegNetY adds
squeeze-excitation.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from octseg.models.rematutil import maybe_remat
from octseg.models.common import ConvBNAct, SqueezeExcite

_CONFIGS = {
    # name: widths, depths, group width, use_se
    'timm-regnetx_002': dict(widths=(24, 56, 152, 368), depths=(1, 1, 4, 7), group=8, se=False),
    'timm-regnetx_064': dict(widths=(168, 392, 784, 1624), depths=(1, 3, 7, 6), group=56, se=False),
    'timm-regnety_120': dict(widths=(224, 448, 896, 2240), depths=(2, 5, 11, 1), group=112, se=True),
}

_STEM_WIDTH = 32


def regnet_out_channels(name: str) -> Sequence[int]:
    cfg = _CONFIGS[name]
    return (3, _STEM_WIDTH) + tuple(cfg['widths'])


class RegNetBlock(nn.Module):
    features: int
    group_width: int
    strides: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    use_se: bool = False
    se_in_width: int = 0  # SE reduction is relative to the block input width
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        residual = x
        groups = max(self.features // self.group_width, 1)
        y = ConvBNAct(self.features, (1, 1), dtype=self.dtype)(x, train)
        y = ConvBNAct(
            self.features, (3, 3), self.strides, self.dilation, groups=groups, dtype=self.dtype
        )(y, train)
        if self.use_se:
            y = SqueezeExcite(max(self.se_in_width // 4, 1), dtype=self.dtype)(y)
        y = ConvBNAct(self.features, (1, 1), act=None, dtype=self.dtype)(y, train)
        if residual.shape != y.shape:
            residual = ConvBNAct(
                self.features, (1, 1), self.strides, act=None, dtype=self.dtype
            )(x, train)
        return nn.relu(y + residual)


class RegNetEncoder(nn.Module):
    variant: str = 'timm-regnetx_002'
    output_stride: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        cfg = _CONFIGS[self.variant]
        features = [x]
        y = ConvBNAct(_STEM_WIDTH, (3, 3), (2, 2), dtype=self.dtype)(x, train)  # 1/2
        features.append(y)

        current_stride = 2
        dilation = 1
        in_width = _STEM_WIDTH
        for width, depth in zip(cfg['widths'], cfg['depths']):
            stage_stride = 2
            if current_stride >= self.output_stride:
                dilation *= 2
                stage_stride = 1
            else:
                current_stride *= 2
            for block_idx in range(depth):
                y = maybe_remat(RegNetBlock)(
                    width,
                    group_width=cfg['group'],
                    strides=(stage_stride, stage_stride) if block_idx == 0 else (1, 1),
                    dilation=(dilation, dilation),
                    use_se=cfg['se'],
                    se_in_width=in_width if block_idx == 0 else width,
                    dtype=self.dtype,
                )(y, train)
            in_width = width
            features.append(y)
        return features

"""EfficientNet encoder family (B0-B7) as a 6-level feature pyramid.

Covers the efficientnet-b0/b5/b7 encoders in the reference search space
(reference: configs/tune.yaml:22-28). Width/depth scaling and MBConv stage
layout follow the EfficientNet paper; pyramid taps are at the stage
boundaries where spatial reduction changes, matching the SMP encoder channel
contract, e.g. b0 -> (3, 32, 24, 40, 112, 320).
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from octseg.models.rematutil import maybe_remat
from octseg.models.common import ConvBNAct, SqueezeExcite

# efficientnet-pytorch (the package smp wraps for 'efficientnet-bX') uses
# TF-style SAME padding and batch_norm_epsilon=1e-3; both are kept so torch
# checkpoints convert numerically exactly (octseg.models.convert_torch).
BN_EPS = 1e-3

# (expand_ratio, kernel, stride, out_channels, repeats) — base (B0) stages
_BASE_STAGES = [
    (1, 3, 1, 16, 1),
    (6, 3, 2, 24, 2),
    (6, 5, 2, 40, 2),
    (6, 3, 2, 80, 3),
    (6, 5, 1, 112, 3),
    (6, 5, 2, 192, 4),
    (6, 3, 1, 320, 1),
]

_SCALING = {
    'efficientnet-b0': (1.0, 1.0),
    'efficientnet-b1': (1.0, 1.1),
    'efficientnet-b2': (1.1, 1.2),
    'efficientnet-b3': (1.2, 1.4),
    'efficientnet-b4': (1.4, 1.8),
    'efficientnet-b5': (1.6, 2.2),
    'efficientnet-b6': (1.8, 2.6),
    'efficientnet-b7': (2.0, 3.1),
}


def _round_channels(c: float, width_mult: float, divisor: int = 8) -> int:
    c *= width_mult
    new_c = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new_c < 0.9 * c:
        new_c += divisor
    return new_c


def _round_repeats(r: int, depth_mult: float) -> int:
    return int(math.ceil(depth_mult * r))


def flattened_blocks(name: str):
    """Per-block args in the flat order efficientnet-pytorch uses for
    ``_blocks.{i}`` (and the order MBConv modules are created here):
    [{'expand', 'kernel', 'stride', 'out'}]. Used by the weight converter."""
    width_mult, depth_mult = _SCALING[name]
    out = []
    for stage, (expand, kernel, stride, out_c, repeats) in enumerate(_BASE_STAGES):
        out_c = _round_channels(out_c, width_mult)
        repeats = _round_repeats(repeats, depth_mult)
        for block_idx in range(repeats):
            out.append({
                'stage': stage,
                'expand': expand,
                'kernel': kernel,
                'stride': stride if block_idx == 0 else 1,
                'out': out_c,
            })
    return out


def efficientnet_out_channels(name: str) -> Sequence[int]:
    width_mult, _ = _SCALING[name]
    stem = _round_channels(32, width_mult)
    taps = []
    for i in (1, 2, 4, 6):  # last stage of each reduction level
        taps.append(_round_channels(_BASE_STAGES[i][3], width_mult))
    return (3, stem, *taps)


class MBConv(nn.Module):
    out_features: int
    expand_ratio: int
    kernel: int
    strides: Tuple[int, int]
    dilation: Tuple[int, int] = (1, 1)
    se_ratio: float = 0.25
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_features = x.shape[-1]
        y = x
        expanded = in_features * self.expand_ratio
        if self.expand_ratio != 1:
            y = ConvBNAct(expanded, (1, 1), act='swish', padding='SAME',
                          bn_eps=BN_EPS, dtype=self.dtype)(y, train)
        y = ConvBNAct(
            expanded,
            (self.kernel, self.kernel),
            self.strides,
            self.dilation,
            groups=expanded,
            act='swish',
            padding='SAME',
            bn_eps=BN_EPS,
            dtype=self.dtype,
        )(y, train)
        y = SqueezeExcite(
            max(1, int(in_features * self.se_ratio)), act='swish', dtype=self.dtype
        )(y)
        y = ConvBNAct(self.out_features, (1, 1), act=None, padding='SAME',
                      bn_eps=BN_EPS, dtype=self.dtype)(y, train)
        if self.strides == (1, 1) and in_features == self.out_features:
            y = y + x
        return y


class EfficientNetEncoder(nn.Module):
    variant: str = 'efficientnet-b0'
    output_stride: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        width_mult, depth_mult = _SCALING[self.variant]
        features = [x]
        stem = _round_channels(32, width_mult)
        y = ConvBNAct(stem, (3, 3), (2, 2), act='swish', padding='SAME',
                      bn_eps=BN_EPS, dtype=self.dtype)(x, train)  # 1/2
        features.append(y)

        current_stride = 2
        dilation = 1
        for stage_idx, (expand, kernel, stride, out_c, repeats) in enumerate(_BASE_STAGES):
            out_c = _round_channels(out_c, width_mult)
            repeats = _round_repeats(repeats, depth_mult)
            stage_stride = stride
            if stride == 2 and current_stride >= self.output_stride:
                dilation *= 2
                stage_stride = 1
            elif stride == 2:
                current_stride *= 2
            for block_idx in range(repeats):
                y = maybe_remat(MBConv)(
                    out_c,
                    expand,
                    kernel,
                    (stage_stride, stage_stride) if block_idx == 0 else (1, 1),
                    dilation=(dilation, dilation),
                    dtype=self.dtype,
                )(y, train)
            # pyramid taps after stages 1 (1/4), 2 (1/8), 4 (1/16), 6 (1/32)
            if stage_idx in (1, 2, 4, 6):
                features.append(y)
        return features

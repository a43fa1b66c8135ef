"""Shared NHWC Flax building blocks for encoders and decoders.

All convolutions run in NHWC (TPU-native layout; XLA tiles the channel axis
onto the MXU lanes). Compute dtype is configurable (bfloat16 by default on
TPU) while parameters stay float32.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def get_activation(name: Optional[str]) -> Callable:
    if name is None or name == 'identity':
        return lambda x: x
    return {
        'relu': nn.relu,
        'swish': nn.swish,
        'silu': nn.swish,
        'sigmoid': jax.nn.sigmoid,
        'tanh': jnp.tanh,
        'gelu': nn.gelu,
    }[name]


class ConvBNAct(nn.Module):
    """Conv → BatchNorm → activation, the workhorse block."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    groups: int = 1
    act: Optional[str] = 'relu'
    use_bn: bool = True
    use_bias: bool = False
    # 'torch': symmetric pad = dilation*(k-1)//2 per side (torchvision/timm
    # semantics); 'SAME': XLA SAME (TF asymmetric — what efficientnet-pytorch's
    # Conv2dStaticSamePadding does). Both are identical for stride-1 odd
    # kernels; the choice pins stride-2 window alignment so converted torch
    # checkpoints (octseg.models.convert_torch) are numerically exact.
    padding: str = 'torch'
    bn_eps: float = 1e-5  # efficientnet-pytorch uses 1e-3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.padding == 'torch':
            padding = tuple(
                (d * (k - 1) // 2, d * (k - 1) // 2)
                for k, d in zip(self.kernel_size, self.dilation)
            )
        else:
            padding = self.padding
        x = nn.Conv(
            self.features,
            self.kernel_size,
            strides=self.strides,
            kernel_dilation=self.dilation,
            feature_group_count=self.groups,
            padding=padding,
            use_bias=self.use_bias or not self.use_bn,
            dtype=self.dtype,
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=self.bn_eps,
                dtype=self.dtype,
            )(x)
        return get_activation(self.act)(x)


class SqueezeExcite(nn.Module):
    """Squeeze-and-excitation channel gate."""

    reduced_features: int
    gate_act: str = 'sigmoid'
    act: str = 'relu'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduced_features, (1, 1), dtype=self.dtype)(s)
        s = get_activation(self.act)(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype)(s)
        return x * get_activation(self.gate_act)(s)


def upsample(x: jnp.ndarray, scale: int = 2, method: str = 'nearest') -> jnp.ndarray:
    """Spatial upsample by an integer factor (static shapes, XLA-friendly)."""
    n, h, w, c = x.shape
    if method == 'nearest':
        # broadcast-trick upsample: reshape-tile-reshape lowers to cheap
        # reshapes/broadcasts in XLA (no gather)
        x = jnp.broadcast_to(
            x[:, :, None, :, None, :], (n, h, scale, w, scale, c)
        ).reshape(n, h * scale, w * scale, c)
        return x
    return jax.image.resize(x, (n, h * scale, w * scale, c), method='bilinear')


def resize_to(x: jnp.ndarray, size: Tuple[int, int], method: str = 'bilinear') -> jnp.ndarray:
    n, _, _, c = x.shape
    if x.shape[1:3] == tuple(size):
        return x
    return jax.image.resize(x, (n, size[0], size[1], c), method=method)


class Attention2D(nn.Module):
    """scSE attention (spatial + channel squeeze-excitation) used by U-Net/MA-Net
    style decoders when attention_type='scse'."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # channel SE
        c = jnp.mean(x, axis=(1, 2), keepdims=True)
        c = nn.Conv(max(x.shape[-1] // 16, 1), (1, 1), dtype=self.dtype)(c)
        c = nn.relu(c)
        c = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype)(c)
        cse = x * jax.nn.sigmoid(c)
        # spatial SE
        s = nn.Conv(1, (1, 1), dtype=self.dtype)(x)
        sse = x * jax.nn.sigmoid(s)
        return cse + sse


def fixed_padding_pool(x: jnp.ndarray, window: int = 3, stride: int = 2) -> jnp.ndarray:
    """Max pool with SAME padding."""
    return nn.max_pool(x, (window, window), strides=(stride, stride), padding='SAME')


def _interp_matrix(in_size: int, out_size: int, align_corners: bool):
    """(out_size, in_size) bilinear interpolation matrix with torch
    F.interpolate semantics (host-side numpy — shapes are static under jit).

    align_corners=True:  src = i * (in-1)/(out-1)      (UpsamplingBilinear2d)
    align_corners=False: src = (i + 0.5) * in/out - 0.5, clamped to >= 0
    """
    import numpy as np

    m = np.zeros((out_size, in_size), np.float32)
    if in_size == 1:
        m[:, 0] = 1.0
        return m
    for i in range(out_size):
        if align_corners:
            src = i * (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
        else:
            src = max((i + 0.5) * in_size / out_size - 0.5, 0.0)
        lo = min(int(src), in_size - 1)
        hi = min(lo + 1, in_size - 1)
        frac = src - lo
        m[i, lo] += 1.0 - frac
        m[i, hi] += frac
    return m


def resize_bilinear_torch(x: jnp.ndarray, size: Tuple[int, int],
                          align_corners: bool = True) -> jnp.ndarray:
    """Exact torch-bilinear NHWC resize as two small matmuls (MXU-friendly:
    no gathers; HIGHEST precision so interpolation weights are not bf16-
    quantized). Covers the SMP decoder conventions jax.image.resize cannot:
    nn.UpsamplingBilinear2d / interpolate(align_corners=True) and torch's
    non-antialiased align_corners=False."""
    n, h, w, c = x.shape
    oh, ow = int(size[0]), int(size[1])
    if (h, w) == (oh, ow):
        return x
    dt = x.dtype
    mh = jnp.asarray(_interp_matrix(h, oh, align_corners))
    mw = jnp.asarray(_interp_matrix(w, ow, align_corners))
    y = jnp.einsum('oh,nhwc->nowc', mh, x.astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum('pw,nhwc->nhpc', mw, y,
                   precision=jax.lax.Precision.HIGHEST)
    return y.astype(dt)


class ConvGNAct(nn.Module):
    """Conv → GroupNorm → activation (SMP FPN's Conv3x3GNReLU block)."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    groups: int = 32
    act: Optional[str] = 'relu'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = tuple((k // 2, k // 2) for k in self.kernel_size)
        x = nn.Conv(self.features, self.kernel_size, padding=pad,
                    use_bias=False, dtype=self.dtype)(x)
        # torch nn.GroupNorm eps is 1e-5 (flax defaults to 1e-6 — a near-35%
        # per-channel divergence on low-variance channels if left unpinned)
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                         dtype=self.dtype)(x)
        return get_activation(self.act)(x)

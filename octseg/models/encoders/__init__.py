"""Encoder registry + preprocessing params (SMP-compatible interface)."""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax.numpy as jnp

from octseg.models.encoders.efficientnet import EfficientNetEncoder, efficientnet_out_channels
from octseg.models.encoders.regnet import RegNetEncoder, regnet_out_channels
from octseg.models.encoders.resnet import ResNetEncoder, resnet_out_channels

_FAMILIES = {
    'resnet': (ResNetEncoder, resnet_out_channels),
    'timm-regnet': (RegNetEncoder, regnet_out_channels),
    'efficientnet': (EfficientNetEncoder, efficientnet_out_channels),
}


def _family(encoder_name: str) -> str:
    if encoder_name.startswith('resnet'):
        return 'resnet'
    if encoder_name.startswith('timm-regnet'):
        return 'timm-regnet'
    if encoder_name.startswith('efficientnet'):
        return 'efficientnet'
    raise ValueError(f'Unknown encoder: {encoder_name!r}')


def create_encoder(encoder_name: str, output_stride: int = 32, dtype: Any = jnp.float32):
    cls, _ = _FAMILIES[_family(encoder_name)]
    return cls(variant=encoder_name, output_stride=output_stride, dtype=dtype)


def encoder_out_channels(encoder_name: str) -> Sequence[int]:
    _, fn = _FAMILIES[_family(encoder_name)]
    return fn(encoder_name)


def get_preprocessing_params(encoder_name: str) -> Dict[str, Any]:
    """ImageNet preprocessing stats, the contract the reference reads from
    smp.encoders.get_preprocessing_params (reference: src/models/smp/model.py:49-51)."""
    _family(encoder_name)  # validate
    return {
        'mean': [0.485, 0.456, 0.406],
        'std': [0.229, 0.224, 0.225],
        'input_range': [0, 1],
        'input_space': 'RGB',
    }


SUPPORTED_ENCODERS = [
    'resnet18',
    'resnet34',
    'resnet50',
    'resnet101',
    'resnet152',
    'timm-regnetx_002',
    'timm-regnetx_064',
    'timm-regnety_120',
    'efficientnet-b0',
    'efficientnet-b1',
    'efficientnet-b2',
    'efficientnet-b3',
    'efficientnet-b4',
    'efficientnet-b5',
    'efficientnet-b6',
    'efficientnet-b7',
]

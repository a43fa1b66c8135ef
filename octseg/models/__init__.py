"""Model registry: create_model(arch, encoder_name, ...) — SMP-compatible API.

Accepts the architecture spellings used across the reference configs
(configs/tune.yaml:10-19 uses 'Unet'/'UnetPlusPlus'/'DeepLabV3'/..., while
configs/train.yaml uses lowercase 'unet').
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from octseg.models.base import SegmentationModel
from octseg.models.decoders.deeplab import DeepLabV3Decoder, DeepLabV3PlusDecoder
from octseg.models.decoders.fpn import FPNDecoder
from octseg.models.decoders.linknet import LinkNetDecoder
from octseg.models.decoders.manet import MAnetDecoder
from octseg.models.decoders.pan import PANDecoder
from octseg.models.decoders.pspnet import PSPDecoder
from octseg.models.decoders.unet import UnetDecoder, UnetPlusPlusDecoder
from octseg.models.encoders import (
    SUPPORTED_ENCODERS,
    create_encoder,
    encoder_out_channels,
    get_preprocessing_params,
)

# arch key -> (decoder class, encoder output_stride, head kernel size).
# Head kernels are each smp model's SegmentationHead kernel_size: 3 for
# Unet/Unet++/MAnet/PSPNet/PAN, 1 for Linknet/FPN/DeepLabV3/DeepLabV3+.
_ARCHS = {
    'unet': (UnetDecoder, 32, 3),
    'unetplusplus': (UnetPlusPlusDecoder, 32, 3),
    'linknet': (LinkNetDecoder, 32, 1),
    'fpn': (FPNDecoder, 32, 1),
    'pspnet': (PSPDecoder, 32, 3),
    'pan': (PANDecoder, 16, 3),
    'manet': (MAnetDecoder, 32, 3),
    'deeplabv3': (DeepLabV3Decoder, 8, 1),
    'deeplabv3plus': (DeepLabV3PlusDecoder, 16, 1),
}

SUPPORTED_ARCHITECTURES = [
    'Unet',
    'UnetPlusPlus',
    'LinkNet',
    'FPN',
    'PSPNet',
    'PAN',
    'MAnet',
    'DeepLabV3',
    'DeepLabV3Plus',
]


def normalize_arch(arch: str) -> str:
    key = arch.lower().replace('_', '').replace('-', '').replace('++', 'plusplus')
    if key not in _ARCHS:
        raise ValueError(
            f'Unknown architecture {arch!r}; supported: {SUPPORTED_ARCHITECTURES}'
        )
    return key


def create_model(
    arch: str,
    encoder_name: str,
    in_channels: int = 3,
    classes: int = 1,
    dtype: Any = jnp.float32,
    **kwargs,
) -> SegmentationModel:
    """Build a segmentation model. ``classes`` is the number of output channels
    (the reference passes len(classes), src/models/smp/model.py:42)."""
    if in_channels != 3:
        raise NotImplementedError('Only 3-channel input is supported (ref parity)')
    key = normalize_arch(arch)
    decoder_cls, output_stride, head_kernel = _ARCHS[key]
    encoder = create_encoder(encoder_name, output_stride=output_stride, dtype=dtype)
    decoder = decoder_cls(dtype=dtype, **kwargs)
    return SegmentationModel(
        encoder=encoder,
        decoder=decoder,
        classes=classes,
        head_upsampling=decoder.upsampling,
        head_kernel=head_kernel,
        dtype=dtype,
    )


__all__ = [
    'create_model',
    'normalize_arch',
    'get_preprocessing_params',
    'encoder_out_channels',
    'SUPPORTED_ARCHITECTURES',
    'SUPPORTED_ENCODERS',
    'SegmentationModel',
]

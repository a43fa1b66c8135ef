"""Torch -> Flax weight converter for the reference checkpoint layout.

The reference ships Lightning checkpoints (``weights.ckpt``) whose
``state_dict`` wraps an SMP model: ``model.encoder.*`` (torchvision/timm
backbone), ``model.decoder.*`` (SMP decoder), ``model.segmentation_head.*``,
plus ``mean``/``std`` preprocessing buffers (reference:
src/models/smp/model.py:38-51, loaded by src/predict.py:31-50).  This module
maps those tensors weight-for-weight onto octseg's Flax models, which were
built op-isomorphic to SMP for the supported pairs, so converted checkpoints
are numerically exact (verified to ~1e-4 fp32 in tests/test_convert_torch.py
against torch forward passes).

Supported:
- encoders: resnet18/34/50/101/152 (torchvision naming: ``conv1``, ``bn1``,
  ``layer{1..4}.{b}.conv{i}/bn{i}/downsample``); timm-regnetx_002/064 and
  timm-regnety_120 (timm naming: ``stem.conv/bn``,
  ``s{1..4}.b{n}.conv{1,2,3}.{conv,bn}`` + ``se.fc{1,2}`` + ``downsample``);
  efficientnet-b0..b7 (efficientnet-pytorch naming — the package smp wraps:
  ``_conv_stem/_bn0``, flat ``_blocks.{i}._expand_conv/_depthwise_conv/
  _se_reduce/_se_expand/_project_conv`` with TF-SAME padding and BN eps 1e-3,
  both preserved by octseg's EfficientNetEncoder),
- decoders: all nine the reference sweeps (src/models/smp/model.py:38-44,
  configs/tune.yaml:10-19) — Unet (``decoder.blocks.{i}.conv{1,2}.{0,1}``),
  UnetPlusPlus (``decoder.blocks.x_{d}_{l}.conv{1,2}.{0,1}``), Linknet
  (``decoder.blocks.{i}.block.{0,2}.{0,1}`` + TransposeX2 ``block.1``), FPN,
  PSPNet, PAN, MAnet, DeepLabV3, DeepLabV3+ (each octseg decoder is
  SMP-channel-exact, incl. PAN's flattened-softmax PAB quirks and
  align_corners=True head upsampling),
- segmentation head (``segmentation_head.0``).

Any trained reference checkpoint — including the three shipped model dirs
(LM: U-Net++/resnet101, FC_LC: LinkNet/efficientnet-b7,
VV: U-Net/timm-regnetx_064) — converts in place:

    python -m octseg.models.convert_torch <ref_model_dir> <octseg_model_dir>

Layout conventions:
- torch Conv2d weight OIHW  -> flax kernel HWIO (transpose 2,3,1,0),
- torch ConvTranspose2d weight (I,O,H,W) -> flax ConvTranspose with
  ``transpose_kernel=True`` keeps torch's gradient-of-conv semantics; kernel
  stays (H,W,O,I) after transpose(2,3,1,0),
- BatchNorm weight/bias -> scale/bias; running_mean/var -> batch_stats.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

log = logging.getLogger(__name__)

_RESNET_LAYERS = {
    'resnet18': ((2, 2, 2, 2), 'BasicBlock', 2),
    'resnet34': ((3, 4, 6, 3), 'BasicBlock', 2),
    'resnet50': ((3, 4, 6, 3), 'Bottleneck', 3),
    'resnet101': ((3, 4, 23, 3), 'Bottleneck', 3),
    'resnet152': ((3, 8, 36, 3), 'Bottleneck', 3),
}


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch/Lightning checkpoint file into {name: np.ndarray}.

    Accepts a Lightning ckpt ({'state_dict': ...}), a bare state_dict, or an
    encoder-only state dict (torchvision/timm download format).
    """
    import torch

    raw = torch.load(path, map_location='cpu', weights_only=False)
    if isinstance(raw, dict) and 'state_dict' in raw:
        raw = raw['state_dict']
    return {k: v.numpy() if hasattr(v, 'numpy') else np.asarray(v)
            for k, v in raw.items()}


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


class _Builder:
    """Accumulates flax param/batch_stats leaves and tracks consumed keys."""

    def __init__(self, sd: Dict[str, np.ndarray]):
        self.sd = sd
        self.params: Dict[Tuple[str, ...], np.ndarray] = {}
        self.stats: Dict[Tuple[str, ...], np.ndarray] = {}
        self.consumed = set()

    def take(self, key: str) -> np.ndarray:
        if key not in self.sd:
            raise KeyError(f'torch checkpoint is missing {key!r}')
        self.consumed.add(key)
        return self.sd[key]

    def conv(self, tkey: str, fpath: str, bias: bool = False) -> None:
        w = self.take(tkey + '.weight')
        kernel = w.transpose(2, 3, 1, 0)
        self.params[tuple(fpath.split('/')) + ('kernel',)] = \
            np.ascontiguousarray(kernel)
        if bias or tkey + '.bias' in self.sd:
            self.params[tuple(fpath.split('/')) + ('bias',)] = self.take(tkey + '.bias')

    def bn(self, tkey: str, fpath: str) -> None:
        path = tuple(fpath.split('/'))
        self.params[path + ('scale',)] = self.take(tkey + '.weight')
        self.params[path + ('bias',)] = self.take(tkey + '.bias')
        self.stats[path + ('mean',)] = self.take(tkey + '.running_mean')
        self.stats[path + ('var',)] = self.take(tkey + '.running_var')
        self.consumed.add(tkey + '.num_batches_tracked')

    def conv_bn(self, tconv: str, tbn: str, fprefix: str) -> None:
        self.conv(tconv, fprefix + '/Conv_0')
        self.bn(tbn, fprefix + '/BatchNorm_0')


def _convert_encoder_family(b: _Builder, prefix: str, encoder_name: str,
                            scope: str) -> None:
    """Dispatch to the encoder family's converter; clear error otherwise."""
    if encoder_name in _RESNET_LAYERS:
        _convert_resnet(b, prefix, encoder_name, scope)
    elif encoder_name.startswith(('timm-regnet', 'regnet')):
        _convert_regnet(b, prefix, encoder_name, scope)
    elif 'efficientnet' in encoder_name:
        _convert_efficientnet(b, prefix, encoder_name, scope)
    else:
        raise NotImplementedError(f'no converter for encoder {encoder_name!r}')


def _convert_regnet(b: _Builder, prefix: str, variant: str, scope: str) -> None:
    """timm RegNet naming: stem.conv/stem.bn, s{k}.b{j}.conv{1,2,3}.{conv,bn},
    optional .se.fc{1,2} (regnety), .downsample.{conv,bn}."""
    from octseg.models.encoders.regnet import _CONFIGS

    if variant not in _CONFIGS:
        raise NotImplementedError(f'unknown regnet variant {variant!r}')
    cfg = _CONFIGS[variant]
    b.conv_bn(f'{prefix}stem.conv', f'{prefix}stem.bn', f'{scope}/ConvBNAct_0')
    n = 0
    for stage, depth in enumerate(cfg['depths'], start=1):
        for blk in range(1, depth + 1):
            t = f'{prefix}s{stage}.b{blk}'
            f = f'{scope}/RegNetBlock_{n}'
            b.conv_bn(f'{t}.conv1.conv', f'{t}.conv1.bn', f'{f}/ConvBNAct_0')
            b.conv_bn(f'{t}.conv2.conv', f'{t}.conv2.bn', f'{f}/ConvBNAct_1')
            if cfg['se']:
                b.conv(f'{t}.se.fc1', f'{f}/SqueezeExcite_0/Conv_0')
                b.conv(f'{t}.se.fc2', f'{f}/SqueezeExcite_0/Conv_1')
            b.conv_bn(f'{t}.conv3.conv', f'{t}.conv3.bn', f'{f}/ConvBNAct_2')
            if f'{t}.downsample.conv.weight' in b.sd:
                b.conv_bn(f'{t}.downsample.conv', f'{t}.downsample.bn',
                          f'{f}/ConvBNAct_3')
            n += 1
    for key in ('head.fc.weight', 'head.fc.bias'):  # classification head
        b.consumed.add(prefix + key)


def _convert_efficientnet(b: _Builder, prefix: str, variant: str,
                          scope: str) -> None:
    """efficientnet-pytorch naming (the package smp wraps for
    'efficientnet-bX'): _conv_stem/_bn0, then flat _blocks.{i} with
    _expand_conv/_bn0, _depthwise_conv/_bn1, _se_reduce, _se_expand,
    _project_conv/_bn2; model-level _conv_head/_bn1/_fc are dropped."""
    from octseg.models.encoders.efficientnet import flattened_blocks

    b.conv_bn(f'{prefix}_conv_stem', f'{prefix}_bn0', f'{scope}/ConvBNAct_0')
    for i, blk in enumerate(flattened_blocks(variant)):
        t = f'{prefix}_blocks.{i}'
        f = f'{scope}/MBConv_{i}'
        idx = 0
        if blk['expand'] != 1:
            b.conv_bn(f'{t}._expand_conv', f'{t}._bn0', f'{f}/ConvBNAct_0')
            idx = 1
        b.conv_bn(f'{t}._depthwise_conv', f'{t}._bn1', f'{f}/ConvBNAct_{idx}')
        b.conv(f'{t}._se_reduce', f'{f}/SqueezeExcite_0/Conv_0')
        b.conv(f'{t}._se_expand', f'{f}/SqueezeExcite_0/Conv_1')
        b.conv_bn(f'{t}._project_conv', f'{t}._bn2', f'{f}/ConvBNAct_{idx + 1}')
    # encoder-irrelevant tail of the classification net
    for key in ('_conv_head.weight', '_bn1.weight', '_bn1.bias',
                '_bn1.running_mean', '_bn1.running_var',
                '_bn1.num_batches_tracked', '_fc.weight', '_fc.bias'):
        b.consumed.add(prefix + key)


def _convert_resnet(b: _Builder, prefix: str, variant: str, scope: str) -> None:
    layers, block_name, nconv = _RESNET_LAYERS[variant]
    b.conv_bn(prefix + 'conv1', prefix + 'bn1', f'{scope}/ConvBNAct_0')
    k = 0
    for stage, n_blocks in enumerate(layers, start=1):
        for blk in range(n_blocks):
            t = f'{prefix}layer{stage}.{blk}'
            f = f'{scope}/{block_name}_{k}'
            for i in range(nconv):
                b.conv_bn(f'{t}.conv{i + 1}', f'{t}.bn{i + 1}', f'{f}/ConvBNAct_{i}')
            if f'{t}.downsample.0.weight' in b.sd:
                b.conv_bn(f'{t}.downsample.0', f'{t}.downsample.1',
                          f'{f}/ConvBNAct_{nconv}')
            k += 1
    # classification head of a bare torchvision state dict: not part of the
    # segmentation model
    for key in ('fc.weight', 'fc.bias'):
        b.consumed.add(prefix + key)


def _convert_unet_decoder(b: _Builder, prefix: str, scope: str) -> None:
    for i in range(5):
        t = f'{prefix}blocks.{i}'
        f = f'{scope}/DecoderBlock_{i}'
        b.conv_bn(f'{t}.conv1.0', f'{t}.conv1.1', f'{f}/ConvBNAct_0')
        b.conv_bn(f'{t}.conv2.0', f'{t}.conv2.1', f'{f}/ConvBNAct_1')


# our U-Net++ grid nodes in flax creation order (j outer, i inner; see
# octseg/models/decoders/unet.py) with their SMP block names x_{d}_{l}
# (d = 4-i-j, l = 3-i), followed by the full-resolution block x_0_4.
_UNETPP_NODES: List[Tuple[int, int]] = [
    (i, j) for j in range(1, 5) for i in range(0, 5 - j)
]


def _convert_unetpp_decoder(b: _Builder, prefix: str, scope: str) -> None:
    names = [f'x_{4 - i - j}_{3 - i}' for (i, j) in _UNETPP_NODES] + ['x_0_4']
    for m, smp_name in enumerate(names):
        t = f'{prefix}blocks.{smp_name}'
        b.conv_bn(f'{t}.conv1.0', f'{t}.conv1.1', f'{scope}/ConvBNAct_{2 * m}')
        b.conv_bn(f'{t}.conv2.0', f'{t}.conv2.1', f'{scope}/ConvBNAct_{2 * m + 1}')


def _convert_linknet_decoder(b: _Builder, prefix: str, scope: str) -> None:
    for i in range(5):
        t = f'{prefix}blocks.{i}.block'
        f = f'{scope}/LinkNetDecoderBlock_{i}'
        b.conv_bn(f'{t}.0.0', f'{t}.0.1', f'{f}/ConvBNAct_0')
        # TransposeX2: ConvTranspose2d(k=4, s=2, p=1) + BN + ReLU.
        w = b.take(f'{t}.1.0.weight')  # (I, O, H, W)
        b.params[tuple(f'{f}/ConvTranspose_0'.split('/')) + ('kernel',)] = \
            np.ascontiguousarray(w.transpose(2, 3, 1, 0))  # (H, W, O, I)
        if f'{t}.1.0.bias' in b.sd:
            b.params[tuple(f'{f}/ConvTranspose_0'.split('/')) + ('bias',)] = \
                b.take(f'{t}.1.0.bias')
        b.bn(f'{t}.1.1', f'{f}/BatchNorm_0')
        b.conv_bn(f'{t}.2.0', f'{t}.2.1', f'{f}/ConvBNAct_1')


def _convert_fpn_decoder(b: _Builder, prefix: str, scope: str) -> None:
    """smp FPNDecoder: p5 lateral + p4/p3/p2 FPNBlocks (skip_conv) + four
    SegmentationBlocks of Conv3x3+GroupNorm(32)+ReLU (n_upsamples 3/2/1/0)."""
    b.conv(f'{prefix}p5', f'{scope}/p5')
    for lvl in (4, 3, 2):
        b.conv(f'{prefix}p{lvl}.skip_conv', f'{scope}/p{lvl}_skip')
    for i, n_up in enumerate((3, 2, 1, 0)):
        for j in range(max(n_up, 1)):
            t = f'{prefix}seg_blocks.{i}.block.{j}.block'
            f = f'{scope}/seg_{i}_{j}'
            b.conv(f'{t}.0', f'{f}/Conv_0')
            # GroupNorm: torch weight/bias -> flax scale/bias (params)
            path = tuple(f'{f}/GroupNorm_0'.split('/'))
            b.params[path + ('scale',)] = b.take(f'{t}.1.weight')
            b.params[path + ('bias',)] = b.take(f'{t}.1.bias')


def _convert_psp_decoder(b: _Builder, prefix: str, scope: str) -> None:
    """smp PSPDecoder: 4 pool branches (the 1-bin one BN-less) + 1x1 conv."""
    for i in range(4):
        t = f'{prefix}psp.blocks.{i}.pool.1'
        f = f'{scope}/psp_{i}'
        if i == 0:  # pool_size 1: Conv2dReLU without BN, conv has bias
            b.conv(f'{t}.0', f'{f}/Conv_0', bias=True)
        else:
            b.conv_bn(f'{t}.0', f'{t}.1', f)
    b.conv_bn(f'{prefix}conv.0', f'{prefix}conv.1', f'{scope}/conv')


# (torch ConvBnRelu path, flax module name) pairs inside the PAN FPA block
_PAN_FPA_CONVS = [
    ('branch1.1', 'branch1'), ('mid.0', 'mid'), ('down1.1', 'down1'),
    ('down2.1', 'down2'), ('down3.1', 'down3_0'), ('down3.2', 'down3_1'),
    ('conv2', 'conv2'), ('conv1', 'conv1'),
]


def _convert_pan_decoder(b: _Builder, prefix: str, scope: str) -> None:
    """smp PANDecoder: FPA (global/mid/1-channel pyramid ConvBnRelu blocks)
    + gau3/gau2/gau1 (pooled gate conv1, skip conv2)."""
    for tpath, fname in _PAN_FPA_CONVS:
        t = f'{prefix}fpa.{tpath}'
        b.conv_bn(f'{t}.conv', f'{t}.bn', f'{scope}/fpa/{fname}')
    for g in (3, 2, 1):
        t = f'{prefix}gau{g}'
        b.conv_bn(f'{t}.conv1.1.conv', f'{t}.conv1.1.bn',
                  f'{scope}/gau{g}/conv1')
        b.conv_bn(f'{t}.conv2.conv', f'{t}.conv2.bn', f'{scope}/gau{g}/conv2')


def _convert_manet_decoder(b: _Builder, prefix: str, scope: str) -> None:
    """smp MAnetDecoder: PAB center + 4 MFAB + 1 plain DecoderBlock."""
    for tname, fname in (('top_conv', 'top'), ('center_conv', 'center'),
                         ('bottom_conv', 'bottom'), ('out_conv', 'out')):
        b.conv(f'{prefix}center.{tname}', f'{scope}/center/{fname}')
    for i in range(4):  # MFAB levels (encoder skips exist)
        t = f'{prefix}blocks.{i}'
        f = f'{scope}/block{i}'
        b.conv_bn(f'{t}.hl_conv.0.0', f'{t}.hl_conv.0.1', f'{f}/hl_conv_0')
        b.conv_bn(f'{t}.hl_conv.1.0', f'{t}.hl_conv.1.1', f'{f}/hl_conv_1')
        for se in ('hl', 'll'):
            b.conv(f'{t}.SE_{se}.1', f'{f}/se_{se}_fc1')
            b.conv(f'{t}.SE_{se}.3', f'{f}/se_{se}_fc2')
        b.conv_bn(f'{t}.conv1.0', f'{t}.conv1.1', f'{f}/conv1')
        b.conv_bn(f'{t}.conv2.0', f'{t}.conv2.1', f'{f}/conv2')
    t = f'{prefix}blocks.4'  # final skip-less DecoderBlock
    b.conv_bn(f'{t}.conv1.0', f'{t}.conv1.1', f'{scope}/block4/conv1')
    b.conv_bn(f'{t}.conv2.0', f'{t}.conv2.1', f'{scope}/block4/conv2')


def _convert_aspp(b: _Builder, t: str, f: str, separable: bool) -> None:
    """smp ASPP under torch prefix ``t`` -> flax scope ``f`` (convs0..convs4
    + project). Separable branches are SeparableConv2d(dw, pw) + BN."""
    b.conv_bn(f'{t}.convs.0.0', f'{t}.convs.0.1', f'{f}/convs0')
    for i in (1, 2, 3):
        if separable:
            b.conv(f'{t}.convs.{i}.0.0', f'{f}/convs{i}/dw')
            b.conv_bn(f'{t}.convs.{i}.0.1', f'{t}.convs.{i}.1',
                      f'{f}/convs{i}/pw')
        else:
            b.conv_bn(f'{t}.convs.{i}.0', f'{t}.convs.{i}.1', f'{f}/convs{i}')
    b.conv_bn(f'{t}.convs.4.1', f'{t}.convs.4.2', f'{f}/convs4')
    b.conv_bn(f'{t}.project.0', f'{t}.project.1', f'{f}/project')


def _convert_deeplabv3_decoder(b: _Builder, prefix: str, scope: str) -> None:
    """smp DeepLabV3Decoder: Sequential(ASPP, conv3x3, BN, ReLU)."""
    _convert_aspp(b, f'{prefix}0', f'{scope}/aspp', separable=False)
    b.conv_bn(f'{prefix}1', f'{prefix}2', f'{scope}/conv')


def _convert_deeplabv3plus_decoder(b: _Builder, prefix: str, scope: str) -> None:
    """smp DeepLabV3PlusDecoder: aspp Sequential(ASPP, SeparableConv, BN,
    ReLU) + block1 (low-level 1x1) + block2 (separable fuse)."""
    _convert_aspp(b, f'{prefix}aspp.0', f'{scope}/aspp', separable=True)
    b.conv(f'{prefix}aspp.1.0', f'{scope}/aspp_sep/dw')
    b.conv_bn(f'{prefix}aspp.1.1', f'{prefix}aspp.2', f'{scope}/aspp_sep/pw')
    b.conv_bn(f'{prefix}block1.0', f'{prefix}block1.1', f'{scope}/block1')
    b.conv(f'{prefix}block2.0.0', f'{scope}/block2/dw')
    b.conv_bn(f'{prefix}block2.0.1', f'{prefix}block2.1', f'{scope}/block2/pw')


_DECODER_CONVERTERS = {
    'unet': _convert_unet_decoder,
    'unetplusplus': _convert_unetpp_decoder,
    'linknet': _convert_linknet_decoder,
    'fpn': _convert_fpn_decoder,
    'pspnet': _convert_psp_decoder,
    'pan': _convert_pan_decoder,
    'manet': _convert_manet_decoder,
    'deeplabv3': _convert_deeplabv3_decoder,
    'deeplabv3plus': _convert_deeplabv3plus_decoder,
}


def _unflatten(flat: Dict[Tuple[str, ...], np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for path, leaf in flat.items():
        node = tree
        for part in path[:-1]:
            node = node.setdefault(part, {})
        node[path[-1]] = leaf
    return tree


def convert_encoder(sd: Dict[str, np.ndarray], encoder_name: str,
                    prefix: str = '') -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Convert a bare torch encoder state dict (e.g. torchvision ImageNet
    weights) into (params, batch_stats) subtrees for the ``encoder`` scope."""
    b = _Builder(sd)
    _convert_encoder_family(b, prefix, encoder_name, 'encoder')
    params = _unflatten(b.params)['encoder']
    stats = _unflatten(b.stats)['encoder']
    return params, stats


def convert_checkpoint(
    sd: Dict[str, np.ndarray], architecture: str, encoder_name: str
) -> Dict[str, Any]:
    """Convert a full reference model state dict (Lightning ``state_dict``
    with ``model.`` prefixes, or a bare SMP state dict) into an octseg
    variables tree {'params': ..., 'batch_stats': ...}."""
    from octseg.models import normalize_arch

    arch_key = normalize_arch(architecture)
    if arch_key not in _DECODER_CONVERTERS:
        raise NotImplementedError(
            f'no decoder converter for {architecture!r} (supported: '
            f'{sorted(_DECODER_CONVERTERS)})'
        )
    prefix = 'model.' if any(k.startswith('model.') for k in sd) else ''
    b = _Builder(sd)
    _convert_encoder_family(b, f'{prefix}encoder.', encoder_name, 'encoder')
    _DECODER_CONVERTERS[arch_key](b, f'{prefix}decoder.', 'decoder')
    b.conv(f'{prefix}segmentation_head.0', 'head/Conv_0')
    for aux in ('mean', 'std'):  # SMP preprocessing buffers (model.py:49-51)
        b.consumed.add(aux)
        b.consumed.add(prefix + aux)
    leftover = [k for k in sd if k not in b.consumed
                and not k.endswith('num_batches_tracked')]
    if leftover:
        log.warning('unconsumed torch keys: %s', leftover[:10])
    return {'params': _unflatten(b.params), 'batch_stats': _unflatten(b.stats)}


def _check_tree_shapes(got: Dict[str, Any], want: Dict[str, Any], path: str = ''
                       ) -> List[str]:
    errors = []
    for key in set(got) | set(want):
        p = f'{path}/{key}'
        if key not in got:
            errors.append(f'missing {p}')
        elif key not in want:
            errors.append(f'unexpected {p}')
        elif isinstance(want[key], dict):
            errors.extend(_check_tree_shapes(got[key], want[key], p))
        elif tuple(np.shape(got[key])) != tuple(np.shape(want[key])):
            errors.append(
                f'shape mismatch at {p}: got {np.shape(got[key])}, '
                f'model wants {np.shape(want[key])}'
            )
    return errors


def convert_reference_model_dir(
    torch_model_dir: str,
    out_model_dir: str,
    input_size: Optional[int] = None,
) -> str:
    """Convert a reference model dir (config.json + torch weights.ckpt,
    reference predict.py:31-50 layout) into an octseg model dir with the same
    contract. Returns out_model_dir."""
    import json
    import os

    import jax
    import jax.numpy as jnp

    from octseg.models import create_model
    from octseg.train.checkpoint import save_weights

    with open(os.path.join(torch_model_dir, 'config.json')) as f:
        cfg = json.load(f)
    sd = load_torch_state_dict(os.path.join(torch_model_dir, 'weights.ckpt'))
    variables = convert_checkpoint(sd, cfg['architecture'], cfg['encoder'])

    if input_size is not None:
        cfg['input_size'] = int(input_size)  # emitted manifest must agree
    elif 'input_size' not in cfg:
        raise ValueError(
            f'{torch_model_dir}/config.json has no input_size — pass '
            f'--input-size (it is written into the converted manifest)')
    size = int(cfg['input_size'])
    model = create_model(cfg['architecture'], cfg['encoder'],
                         classes=len(cfg['classes']))
    ref = jax.eval_shape(
        lambda: model.init(
            {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(0)},
            jnp.zeros((1, size, size, 3), jnp.float32), train=False,
        )
    )
    errors = _check_tree_shapes(variables['params'], ref['params'])
    errors += _check_tree_shapes(variables['batch_stats'], ref['batch_stats'])
    if errors:
        raise ValueError(
            'converted tree does not match the model:\n  ' + '\n  '.join(errors[:20])
        )

    os.makedirs(out_model_dir, exist_ok=True)
    save_weights(os.path.join(out_model_dir, 'weights.ckpt'),
                 variables['params'], variables['batch_stats'])
    with open(os.path.join(out_model_dir, 'config.json'), 'w') as f:
        json.dump(cfg, f, indent=2)
    log.info('converted %s -> %s', torch_model_dir, out_model_dir)
    return out_model_dir


def load_pretrained_encoder(
    variables: Dict[str, Any], state_dict_path: str, encoder_name: str
) -> Dict[str, Any]:
    """Merge converted torch encoder weights (e.g. ImageNet pretraining, the
    reference's encoder_weights='imagenet' path, src/models/smp/model.py:38-44)
    into freshly-initialized model variables. Decoder/head stay random."""
    sd = load_torch_state_dict(state_dict_path)
    # accept full-model dicts too
    if any(k.startswith(('model.encoder.', 'encoder.')) for k in sd):
        pre = 'model.encoder.' if any(k.startswith('model.encoder.') for k in sd) \
            else 'encoder.'
        sd = {k[len(pre):]: v for k, v in sd.items() if k.startswith(pre)}
    enc_params, enc_stats = convert_encoder(sd, encoder_name)
    errors = _check_tree_shapes(enc_params, variables['params']['encoder'])
    errors += _check_tree_shapes(enc_stats, variables['batch_stats']['encoder'])
    if errors:
        raise ValueError(
            'pretrained encoder does not match the model:\n  '
            + '\n  '.join(errors[:20])
        )
    out = {
        'params': dict(variables['params']),
        'batch_stats': dict(variables['batch_stats']),
    }
    out['params']['encoder'] = enc_params
    out['batch_stats']['encoder'] = enc_stats
    return out


def main(argv: Optional[Sequence[str]] = None) -> None:
    """CLI: convert a reference model dir (torch weights.ckpt + config.json)
    into an octseg model dir with the same contract — the one-command
    migration path for users with trained reference checkpoints."""
    import argparse
    import sys

    parser = argparse.ArgumentParser(
        description='Convert a reference (torch/SMP) model dir to octseg.')
    parser.add_argument('torch_model_dir',
                        help='reference model dir (config.json + weights.ckpt)')
    parser.add_argument('out_model_dir', help='output octseg model dir')
    parser.add_argument('--input-size', type=int, default=None,
                        help='override config.json input_size (also written '
                             'into the emitted config.json)')
    args = parser.parse_args(argv)
    try:
        import torch  # noqa: F401 — only the one-time conversion needs it
    except ImportError:
        sys.exit('reading a reference weights.ckpt requires torch (CPU build '
                 'is enough): pip install torch --index-url '
                 'https://download.pytorch.org/whl/cpu')
    out = convert_reference_model_dir(
        args.torch_model_dir, args.out_model_dir, input_size=args.input_size)
    print(out)


if __name__ == '__main__':
    logging.basicConfig(level=logging.INFO, format='%(message)s')
    main()

"""Name-faithful torch mirror of the SMP models the reference trains.

segmentation_models_pytorch is not installed in this rig, so these modules
reproduce, in bare torch, the exact module hierarchy (and therefore
state_dict key names) and forward semantics of smp.create_model(arch,
'resnetXX') as used by the reference (src/models/smp/model.py:38-44):
torchvision resnet encoders + SMP Unet/UnetPlusPlus/Linknet decoders +
SegmentationHead.  Used by tests/test_convert_torch.py to produce torch
checkpoints and golden forward outputs for the converter parity check.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


# ------------------------- torchvision-style resnet -------------------------

class BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        if stride != 1 or inplanes != planes:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, planes, 1, stride, bias=False),
                nn.BatchNorm2d(planes),
            )
        else:
            self.downsample = None

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        if stride != 1 or inplanes != planes * 4:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, planes * 4, 1, stride, bias=False),
                nn.BatchNorm2d(planes * 4),
            )
        else:
            self.downsample = None

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


_RESNETS = {
    'resnet18': (BasicBlock, (2, 2, 2, 2)),
    'resnet34': (BasicBlock, (3, 4, 6, 3)),
    'resnet50': (Bottleneck, (3, 4, 6, 3)),
    'resnet101': (Bottleneck, (3, 4, 23, 3)),
}


class ResNetEncoder(nn.Module):
    """torchvision resnet as a 6-level SMP encoder (returns the pyramid)."""

    def __init__(self, variant='resnet18'):
        super().__init__()
        block, layers = _RESNETS[variant]
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.inplanes = 64
        widths = (64, 128, 256, 512)
        for idx, (n, w) in enumerate(zip(layers, widths), start=1):
            stride = 1 if idx == 1 else 2
            blocks = [block(self.inplanes, w, stride)]
            self.inplanes = w * block.expansion
            for _ in range(1, n):
                blocks.append(block(self.inplanes, w, 1))
            setattr(self, f'layer{idx}', nn.Sequential(*blocks))
        mult = block.expansion
        self.out_channels = (3, 64, 64 * mult, 128 * mult, 256 * mult, 512 * mult)

    def forward(self, x):
        feats = [x]
        x = self.relu(self.bn1(self.conv1(x)))
        feats.append(x)
        x = self.maxpool(x)
        for idx in range(1, 5):
            x = getattr(self, f'layer{idx}')(x)
            feats.append(x)
        return feats


# --------------------------- timm-style regnet ----------------------------

class TimmConvBn(nn.Module):
    """timm ConvBnAct: child names conv / bn."""

    def __init__(self, i, o, k, s=1, p=0, g=1, act=True):
        super().__init__()
        self.conv = nn.Conv2d(i, o, k, s, p, groups=g, bias=False)
        self.bn = nn.BatchNorm2d(o)
        self.act = nn.ReLU(inplace=True) if act else nn.Identity()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class RegNetSE(nn.Module):
    """timm SEModule: child names fc1 / fc2 (1x1 convs with bias)."""

    def __init__(self, ch, rd):
        super().__init__()
        self.fc1 = nn.Conv2d(ch, rd, 1)
        self.fc2 = nn.Conv2d(rd, ch, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = self.fc2(F.relu(self.fc1(s)))
        return x * torch.sigmoid(s)


class RegNetBlockT(nn.Module):
    def __init__(self, in_ch, out_ch, stride, group_width, se):
        super().__init__()
        groups = max(out_ch // group_width, 1)
        self.conv1 = TimmConvBn(in_ch, out_ch, 1)
        self.conv2 = TimmConvBn(out_ch, out_ch, 3, stride, 1, groups)
        if se:
            self.se = RegNetSE(out_ch, max(in_ch // 4, 1))
        else:
            self.se = None
        self.conv3 = TimmConvBn(out_ch, out_ch, 1, act=False)
        if stride != 1 or in_ch != out_ch:
            self.downsample = TimmConvBn(in_ch, out_ch, 1, stride, act=False)
        else:
            self.downsample = None

    def forward(self, x):
        y = self.conv2(self.conv1(x))
        if self.se is not None:
            y = self.se(y)
        y = self.conv3(y)
        shortcut = x if self.downsample is None else self.downsample(x)
        return F.relu(y + shortcut)


class _RegNetStem(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv = nn.Conv2d(3, 32, 3, 2, 1, bias=False)
        self.bn = nn.BatchNorm2d(32)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


_REGNETS = {
    'timm-regnetx_002': dict(widths=(24, 56, 152, 368), depths=(1, 1, 4, 7),
                             group=8, se=False),
    'timm-regnetx_064': dict(widths=(168, 392, 784, 1624), depths=(1, 3, 7, 6),
                             group=56, se=False),
    'timm-regnety_120': dict(widths=(224, 448, 896, 2240), depths=(2, 5, 11, 1),
                             group=112, se=True),
}


class RegNetEncoderT(nn.Module):
    """timm RegNet as a 6-level SMP encoder: names stem, s1.b1, s1.b2, ..."""

    def __init__(self, variant):
        super().__init__()
        cfg = _REGNETS[variant]
        self.stem = _RegNetStem()
        in_ch = 32
        from collections import OrderedDict

        for idx, (w, d) in enumerate(zip(cfg['widths'], cfg['depths']), start=1):
            blocks = OrderedDict()
            for blk in range(1, d + 1):
                blocks[f'b{blk}'] = RegNetBlockT(
                    in_ch, w, 2 if blk == 1 else 1, cfg['group'], cfg['se']
                )
                in_ch = w
            setattr(self, f's{idx}', nn.Sequential(blocks))
        self.out_channels = (3, 32) + tuple(cfg['widths'])

    def forward(self, x):
        feats = [x, self.stem(x)]
        y = feats[1]
        for idx in range(1, 5):
            y = getattr(self, f's{idx}')(y)
            feats.append(y)
        return feats


# ---------------- efficientnet-pytorch (lukemelas) style ------------------

class SamePadConv(nn.Conv2d):
    """Conv2dStaticSamePadding: TF SAME (asymmetric, more at the end)."""

    def __init__(self, i, o, k, s=1, groups=1, bias=False):
        super().__init__(i, o, k, s, 0, groups=groups, bias=bias)

    def forward(self, x):
        ih, iw = x.shape[-2:]
        kh, kw = self.weight.shape[-2:]
        sh, sw = self.stride
        ph = max((-(-ih // sh) - 1) * sh + kh - ih, 0)
        pw = max((-(-iw // sw) - 1) * sw + kw - iw, 0)
        x = F.pad(x, [pw // 2, pw - pw // 2, ph // 2, ph - ph // 2])
        return F.conv2d(x, self.weight, self.bias, self.stride, 0,
                        self.dilation, self.groups)


_EFF_BN = dict(eps=1e-3, momentum=0.01)


class MBConvT(nn.Module):
    """efficientnet-pytorch MBConvBlock: names _expand_conv/_bn0,
    _depthwise_conv/_bn1, _se_reduce/_se_expand, _project_conv/_bn2."""

    def __init__(self, in_ch, out_ch, expand, kernel, stride):
        super().__init__()
        mid = in_ch * expand
        self.expand = expand
        self.stride = stride
        self.in_ch, self.out_ch = in_ch, out_ch
        if expand != 1:
            self._expand_conv = SamePadConv(in_ch, mid, 1)
            self._bn0 = nn.BatchNorm2d(mid, **_EFF_BN)
        self._depthwise_conv = SamePadConv(mid, mid, kernel, stride, groups=mid)
        self._bn1 = nn.BatchNorm2d(mid, **_EFF_BN)
        rd = max(1, int(in_ch * 0.25))
        self._se_reduce = SamePadConv(mid, rd, 1, bias=True)
        self._se_expand = SamePadConv(rd, mid, 1, bias=True)
        self._project_conv = SamePadConv(mid, out_ch, 1)
        self._bn2 = nn.BatchNorm2d(out_ch, **_EFF_BN)

    def forward(self, x):
        inp = x
        if self.expand != 1:
            x = F.silu(self._bn0(self._expand_conv(x)))
        x = F.silu(self._bn1(self._depthwise_conv(x)))
        s = x.mean((2, 3), keepdim=True)
        s = self._se_expand(F.silu(self._se_reduce(s)))
        x = torch.sigmoid(s) * x
        x = self._bn2(self._project_conv(x))
        if self.stride == 1 and self.in_ch == self.out_ch:
            x = x + inp
        return x


class EfficientNetEncoderT(nn.Module):
    """efficientnet-pytorch as the 6-level SMP encoder (b0 geometry)."""

    def __init__(self, variant='efficientnet-b0'):
        super().__init__()
        from octseg.models.encoders.efficientnet import (
            efficientnet_out_channels,
            flattened_blocks,
        )

        self.out_channels = tuple(efficientnet_out_channels(variant))
        stem = self.out_channels[1]
        self._conv_stem = SamePadConv(3, stem, 3, 2)
        self._bn0 = nn.BatchNorm2d(stem, **_EFF_BN)
        blocks = []
        in_ch = stem
        self._tap_after = []
        spec = flattened_blocks(variant)
        for i, blk in enumerate(spec):
            blocks.append(MBConvT(in_ch, blk['out'], blk['expand'],
                                  blk['kernel'], blk['stride']))
            in_ch = blk['out']
            # pyramid taps: last block of stages 1 (1/4), 2 (1/8), 4 (1/16),
            # 6 (1/32) — the SMP encoder channel contract
            nxt = spec[i + 1] if i + 1 < len(spec) else None
            if blk['stage'] in (1, 2, 4, 6) and (
                    nxt is None or nxt['stage'] != blk['stage']):
                self._tap_after.append(i)
        self._blocks = nn.ModuleList(blocks)

    def forward(self, x):
        feats = [x]
        y = F.silu(self._bn0(self._conv_stem(x)))
        feats.append(y)
        taps = set(self._tap_after)
        for i, block in enumerate(self._blocks):
            y = block(y)
            if i in taps:
                feats.append(y)
        return feats[:6]


# ------------------------------ SMP decoders ------------------------------

def Conv2dReLU(in_ch, out_ch, kernel, padding):
    return nn.Sequential(
        nn.Conv2d(in_ch, out_ch, kernel, padding=padding, bias=False),
        nn.BatchNorm2d(out_ch),
        nn.ReLU(inplace=True),
    )


class UnetDecoderBlock(nn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.conv1 = Conv2dReLU(in_ch, out_ch, 3, 1)
        self.conv2 = Conv2dReLU(out_ch, out_ch, 3, 1)

    def forward(self, x, skip=None):
        x = F.interpolate(x, scale_factor=2, mode='nearest')
        if skip is not None:
            x = torch.cat([x, skip], dim=1)
        return self.conv2(self.conv1(x))


class UnetDecoder(nn.Module):
    def __init__(self, encoder_channels, decoder_channels=(256, 128, 64, 32, 16)):
        super().__init__()
        enc = list(encoder_channels[1:])[::-1]  # deepest first
        in_ch = [enc[0]] + list(decoder_channels[:-1])
        skip_ch = enc[1:] + [0]
        self.blocks = nn.ModuleList(
            [UnetDecoderBlock(i + s, o)
             for i, s, o in zip(in_ch, skip_ch, decoder_channels)]
        )

    def forward(self, features):
        feats = features[1:][::-1]
        x = feats[0]
        skips = feats[1:]
        for i, block in enumerate(self.blocks):
            x = block(x, skips[i] if i < len(skips) else None)
        return x


class UnetPlusPlusDecoder(nn.Module):
    """SMP's dense nested grid, expressed over nodes (i=level from 1/2, j=col);
    module names are SMP's x_{d}_{l} with d = 4-i-j, l = 3-i (+ final x_0_4)."""

    def __init__(self, encoder_channels, decoder_channels=(256, 128, 64, 32, 16)):
        super().__init__()
        enc = list(encoder_channels[1:])  # channels of f1..f5 (1/2..1/32)
        dec = list(decoder_channels)

        def node_out(i, j):
            return dec[3 - i] if j == 4 - i else enc[i]

        blocks = {}
        for j in range(1, 5):
            for i in range(0, 5 - j):
                below_ch = enc[i + 1] if j == 1 else node_out(i + 1, j - 1)
                blocks[f'x_{4 - i - j}_{3 - i}'] = UnetDecoderBlock(
                    below_ch + j * enc[i], node_out(i, j)
                )
        blocks['x_0_4'] = UnetDecoderBlock(dec[3], dec[4])
        self.blocks = nn.ModuleDict(blocks)

    def forward(self, features):
        enc = features[1:]  # f1..f5
        grid = {(i, 0): enc[i] for i in range(5)}
        for j in range(1, 5):
            for i in range(0, 5 - j):
                below = grid[(i + 1, j - 1)]
                skip = torch.cat(
                    [grid[(i, k)] for k in range(j - 1, -1, -1)], dim=1
                )
                grid[(i, j)] = self.blocks[f'x_{4 - i - j}_{3 - i}'](below, skip)
        return self.blocks['x_0_4'](grid[(0, 4)])


class LinknetDecoderBlock(nn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.block = nn.Sequential(
            Conv2dReLU(in_ch, in_ch // 4, 1, 0),
            nn.Sequential(  # TransposeX2
                nn.ConvTranspose2d(in_ch // 4, in_ch // 4, 4, 2, 1, bias=False),
                nn.BatchNorm2d(in_ch // 4),
                nn.ReLU(inplace=True),
            ),
            Conv2dReLU(in_ch // 4, out_ch, 1, 0),
        )

    def forward(self, x):
        return self.block(x)


class LinknetDecoder(nn.Module):
    def __init__(self, encoder_channels, prefinal_channels=32):
        super().__init__()
        enc = list(encoder_channels[1:])[::-1]
        channels = enc + [prefinal_channels]
        self.blocks = nn.ModuleList(
            [LinknetDecoderBlock(channels[i], channels[i + 1]) for i in range(5)]
        )

    def forward(self, features):
        feats = features[1:][::-1]
        x = feats[0]
        skips = feats[1:]
        for i, block in enumerate(self.blocks):
            x = block(x)
            if i < len(skips):
                x = x + skips[i]
        return x


class SMPModel(nn.Module):
    """encoder + decoder + segmentation_head — smp.create_model shape."""

    def __init__(self, arch, encoder_name, classes):
        super().__init__()
        if encoder_name in _RESNETS:
            self.encoder = ResNetEncoder(encoder_name)
        elif encoder_name in _REGNETS:
            self.encoder = RegNetEncoderT(encoder_name)
        elif 'efficientnet' in encoder_name:
            self.encoder = EfficientNetEncoderT(encoder_name)
        else:
            raise ValueError(encoder_name)
        ch = self.encoder.out_channels
        if arch == 'Unet':
            self.decoder = UnetDecoder(ch)
            head_in, head_k = 16, 3
        elif arch == 'UnetPlusPlus':
            self.decoder = UnetPlusPlusDecoder(ch)
            head_in, head_k = 16, 3
        elif arch == 'Linknet':
            self.decoder = LinknetDecoder(ch)
            head_in, head_k = 32, 1
        else:
            raise ValueError(arch)
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(head_in, classes, head_k, padding=head_k // 2),
            nn.Identity(),
        )

    def forward(self, x):
        return self.segmentation_head(self.decoder(self.encoder(x)))


def randomize(model: nn.Module, seed: int = 0) -> nn.Module:
    """Random weights AND random BN running stats (so conversion of the
    batch_stats collection is actually exercised)."""
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
        for m in model.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=gen) * 0.1)
                m.running_var.copy_(
                    1.0 + 0.3 * torch.rand(m.running_var.shape, generator=gen)
                )
    return model

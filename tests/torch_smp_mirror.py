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
    """Conv2dStaticSamePadding: TF SAME (asymmetric, more at the end).

    After smp's make_dilated (static_padding -> Identity, symmetric
    padding=(k//2)*rate), the conv runs with plain symmetric padding — the
    dilated branch below mirrors that."""

    def __init__(self, i, o, k, s=1, groups=1, bias=False):
        super().__init__(i, o, k, s, 0, groups=groups, bias=bias)

    def forward(self, x):
        if self.dilation != (1, 1):  # make_dilated applied
            return F.conv2d(x, self.weight, self.bias, self.stride,
                            self.padding, self.dilation, self.groups)
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


# ------------------- SMP decoders: FPN / PSPNet / PAN ----------------------

class Conv3x3GNReLU(nn.Module):
    """smp fpn Conv3x3GNReLU: block = Sequential(conv(no bias), GN(32), ReLU);
    nearest x2 upsample AFTER the block when upsample=True."""

    def __init__(self, in_ch, out_ch, upsample=False):
        super().__init__()
        self.upsample = upsample
        self.block = nn.Sequential(
            nn.Conv2d(in_ch, out_ch, 3, stride=1, padding=1, bias=False),
            nn.GroupNorm(32, out_ch),
            nn.ReLU(inplace=True),
        )

    def forward(self, x):
        x = self.block(x)
        if self.upsample:
            x = F.interpolate(x, scale_factor=2, mode='nearest')
        return x


class FPNBlock(nn.Module):
    def __init__(self, pyramid_channels, skip_channels):
        super().__init__()
        self.skip_conv = nn.Conv2d(skip_channels, pyramid_channels, kernel_size=1)

    def forward(self, x, skip):
        x = F.interpolate(x, scale_factor=2, mode='nearest')
        return x + self.skip_conv(skip)


class SegmentationBlock(nn.Module):
    def __init__(self, in_ch, out_ch, n_upsamples=0):
        super().__init__()
        blocks = [Conv3x3GNReLU(in_ch, out_ch, upsample=bool(n_upsamples))]
        for _ in range(1, n_upsamples):
            blocks.append(Conv3x3GNReLU(out_ch, out_ch, upsample=True))
        self.block = nn.Sequential(*blocks)

    def forward(self, x):
        return self.block(x)


class FPNDecoder(nn.Module):
    def __init__(self, encoder_channels, pyramid_channels=256,
                 segmentation_channels=128, dropout=0.2):
        super().__init__()
        enc = encoder_channels[::-1][:4]  # c5, c4, c3, c2
        self.p5 = nn.Conv2d(enc[0], pyramid_channels, kernel_size=1)
        self.p4 = FPNBlock(pyramid_channels, enc[1])
        self.p3 = FPNBlock(pyramid_channels, enc[2])
        self.p2 = FPNBlock(pyramid_channels, enc[3])
        self.seg_blocks = nn.ModuleList(
            [SegmentationBlock(pyramid_channels, segmentation_channels, n)
             for n in [3, 2, 1, 0]]
        )
        self.dropout = nn.Dropout2d(p=dropout, inplace=True)

    def forward(self, features):
        c2, c3, c4, c5 = features[-4:]
        p5 = self.p5(c5)
        p4 = self.p4(p5, c4)
        p3 = self.p3(p4, c3)
        p2 = self.p2(p3, c2)
        pyr = [b(p) for b, p in zip(self.seg_blocks, [p5, p4, p3, p2])]
        return self.dropout(sum(pyr))


def Conv2dReLUNoBN(in_ch, out_ch, kernel, padding):
    return nn.Sequential(
        nn.Conv2d(in_ch, out_ch, kernel, padding=padding, bias=True),
        nn.ReLU(inplace=True),
    )


class PSPBlock(nn.Module):
    def __init__(self, in_ch, out_ch, pool_size):
        super().__init__()
        use_bn = pool_size != 1  # smp: no BN over a 1x1 map
        conv = (Conv2dReLU(in_ch, out_ch, 1, 0) if use_bn
                else Conv2dReLUNoBN(in_ch, out_ch, 1, 0))
        self.pool = nn.Sequential(nn.AdaptiveAvgPool2d(pool_size), conv)

    def forward(self, x):
        h, w = x.shape[2:]
        y = self.pool(x)
        return F.interpolate(y, size=(h, w), mode='bilinear', align_corners=True)


class PSPDecoder(nn.Module):
    """smp PSPDecoder: encoder_depth=3 — consumes the 1/8 map."""

    def __init__(self, encoder_channels, out_channels=512, dropout=0.2):
        super().__init__()
        in_ch = encoder_channels[3]  # 1/8 feature channels
        self.psp = nn.Module()
        self.psp.blocks = nn.ModuleList(
            [PSPBlock(in_ch, in_ch // 4, size) for size in (1, 2, 3, 6)]
        )
        self.conv = Conv2dReLU(in_ch * 2, out_channels, 1, 0)
        self.dropout = nn.Dropout2d(p=dropout)

    def forward(self, features):
        x = features[3]
        xs = [block(x) for block in self.psp.blocks] + [x]
        x = torch.cat(xs, dim=1)
        return self.dropout(self.conv(x))


class ConvBnRelu(nn.Module):
    """smp pan ConvBnRelu: child names conv / bn; conv has bias."""

    def __init__(self, in_ch, out_ch, kernel_size, stride=1, padding=0,
                 add_relu=True):
        super().__init__()
        self.conv = nn.Conv2d(in_ch, out_ch, kernel_size, stride, padding,
                              bias=True)
        self.bn = nn.BatchNorm2d(out_ch)
        self.add_relu = add_relu

    def forward(self, x):
        x = self.bn(self.conv(x))
        return F.relu(x) if self.add_relu else x


class FPABlockT(nn.Module):
    def __init__(self, in_channels, out_channels):
        super().__init__()
        self.branch1 = nn.Sequential(
            nn.AdaptiveAvgPool2d(1), ConvBnRelu(in_channels, out_channels, 1)
        )
        self.mid = nn.Sequential(ConvBnRelu(in_channels, out_channels, 1))
        self.down1 = nn.Sequential(
            nn.MaxPool2d(2, 2), ConvBnRelu(in_channels, 1, 7, padding=3)
        )
        self.down2 = nn.Sequential(
            nn.MaxPool2d(2, 2), ConvBnRelu(1, 1, 5, padding=2)
        )
        self.down3 = nn.Sequential(
            nn.MaxPool2d(2, 2),
            ConvBnRelu(1, 1, 3, padding=1),
            ConvBnRelu(1, 1, 3, padding=1),
        )
        self.conv2 = ConvBnRelu(1, 1, 5, padding=2)
        self.conv1 = ConvBnRelu(1, 1, 7, padding=3)

    def forward(self, x):
        h, w = x.shape[2:]
        up = dict(mode='bilinear', align_corners=True)
        b1 = F.interpolate(self.branch1(x), size=(h, w), **up)
        mid = self.mid(x)
        x1 = self.down1(x)
        x2 = self.down2(x1)
        x3 = self.down3(x2)
        x3 = F.interpolate(x3, size=(h // 4, w // 4), **up)
        x2 = self.conv2(x2)
        y = F.interpolate(x2 + x3, size=(h // 2, w // 2), **up)
        x1 = self.conv1(x1)
        y = F.interpolate(y + x1, size=(h, w), **up)
        return y * mid + b1


class GAUBlockT(nn.Module):
    def __init__(self, in_channels, out_channels):
        super().__init__()
        self.conv1 = nn.Sequential(
            nn.AdaptiveAvgPool2d(1),
            ConvBnRelu(out_channels, out_channels, 1, add_relu=False),
            nn.Sigmoid(),
        )
        self.conv2 = ConvBnRelu(in_channels, out_channels, 3, padding=1)

    def forward(self, x, y):
        """x: low level, y: high level (smp arg order)."""
        h, w = x.shape[2:]
        y_up = F.interpolate(y, size=(h, w), mode='bilinear', align_corners=True)
        return y_up + self.conv2(x) * self.conv1(y)


class PANDecoder(nn.Module):
    def __init__(self, encoder_channels, decoder_channels=32):
        super().__init__()
        self.fpa = FPABlockT(encoder_channels[-1], decoder_channels)
        self.gau3 = GAUBlockT(encoder_channels[-2], decoder_channels)
        self.gau2 = GAUBlockT(encoder_channels[-3], decoder_channels)
        self.gau1 = GAUBlockT(encoder_channels[-4], decoder_channels)

    def forward(self, features):
        x5 = self.fpa(features[-1])
        x4 = self.gau3(features[-2], x5)
        x3 = self.gau2(features[-3], x4)
        return self.gau1(features[-4], x3)


# --------------------- SMP decoders: MAnet / DeepLab -----------------------

class PAB(nn.Module):
    def __init__(self, in_channels, pab_channels=64):
        super().__init__()
        self.in_channels = in_channels
        self.top_conv = nn.Conv2d(in_channels, pab_channels, kernel_size=1)
        self.center_conv = nn.Conv2d(in_channels, pab_channels, kernel_size=1)
        self.bottom_conv = nn.Conv2d(in_channels, in_channels, 3, padding=1)
        self.map_softmax = nn.Softmax(dim=1)
        self.out_conv = nn.Conv2d(in_channels, in_channels, 3, padding=1)

    def forward(self, x):
        b, _, h, w = x.shape
        x_top = self.top_conv(x).flatten(2)                     # (b, pab, hw)
        x_center = self.center_conv(x).flatten(2).transpose(1, 2)
        x_bottom = self.bottom_conv(x).flatten(2).transpose(1, 2)
        sp_map = torch.matmul(x_center, x_top)                  # (b, hw, hw)
        # smp quirk: softmax over the FLATTENED hw*hw matrix
        sp_map = self.map_softmax(sp_map.view(b, -1)).view(b, h * w, h * w)
        sp_map = torch.matmul(sp_map, x_bottom)                 # (b, hw, c)
        # smp quirk: raw reshape (no transpose) back to (b, c, h, w)
        sp_map = sp_map.reshape(b, self.in_channels, h, w)
        return self.out_conv(x + sp_map)


class MFAB(nn.Module):
    def __init__(self, in_ch, skip_ch, out_ch, reduction=16):
        super().__init__()
        self.hl_conv = nn.Sequential(
            Conv2dReLU(in_ch, in_ch, 3, 1),
            Conv2dReLU(in_ch, skip_ch, 1, 0),
        )
        rd = max(1, skip_ch // reduction)
        self.SE_ll = nn.Sequential(
            nn.AdaptiveAvgPool2d(1),
            nn.Conv2d(skip_ch, rd, 1), nn.ReLU(inplace=True),
            nn.Conv2d(rd, skip_ch, 1), nn.Sigmoid(),
        )
        self.SE_hl = nn.Sequential(
            nn.AdaptiveAvgPool2d(1),
            nn.Conv2d(skip_ch, rd, 1), nn.ReLU(inplace=True),
            nn.Conv2d(rd, skip_ch, 1), nn.Sigmoid(),
        )
        self.conv1 = Conv2dReLU(skip_ch + skip_ch, out_ch, 3, 1)
        self.conv2 = Conv2dReLU(out_ch, out_ch, 3, 1)

    def forward(self, x, skip):
        x = self.hl_conv(x)
        x = F.interpolate(x, scale_factor=2, mode='nearest')
        attention = self.SE_hl(x) + self.SE_ll(skip)
        x = torch.cat([x * attention, skip], dim=1)
        return self.conv2(self.conv1(x))


class MAnetDecoder(nn.Module):
    def __init__(self, encoder_channels, decoder_channels=(256, 128, 64, 32, 16),
                 reduction=16, pab_channels=64):
        super().__init__()
        enc = list(encoder_channels[1:])[::-1]
        head = enc[0]
        in_ch = [head] + list(decoder_channels[:-1])
        skip_ch = enc[1:] + [0]
        self.center = PAB(head, pab_channels=pab_channels)
        self.blocks = nn.ModuleList(
            [MFAB(i, s, o, reduction=reduction) if s > 0
             else UnetDecoderBlock(i, o)
             for i, s, o in zip(in_ch, skip_ch, decoder_channels)]
        )

    def forward(self, features):
        feats = features[1:][::-1]
        x = self.center(feats[0])
        skips = feats[1:]
        for i, block in enumerate(self.blocks):
            if i < len(skips):
                x = block(x, skips[i])
            else:
                x = block(x)
        return x


class SeparableConv2d(nn.Sequential):
    def __init__(self, in_ch, out_ch, kernel_size, padding=0, dilation=1,
                 bias=True):
        super().__init__(
            nn.Conv2d(in_ch, in_ch, kernel_size, 1, padding, dilation,
                      groups=in_ch, bias=False),
            nn.Conv2d(in_ch, out_ch, 1, bias=bias),
        )


class ASPPPooling(nn.Sequential):
    def __init__(self, in_ch, out_ch):
        super().__init__(
            nn.AdaptiveAvgPool2d(1),
            nn.Conv2d(in_ch, out_ch, 1, bias=False),
            nn.BatchNorm2d(out_ch),
            nn.ReLU(),
        )

    def forward(self, x):
        size = x.shape[-2:]
        for mod in self:
            x = mod(x)
        return F.interpolate(x, size=size, mode='bilinear', align_corners=False)


class ASPP(nn.Module):
    def __init__(self, in_ch, out_ch, atrous_rates=(12, 24, 36), separable=False):
        super().__init__()
        mods = [nn.Sequential(nn.Conv2d(in_ch, out_ch, 1, bias=False),
                              nn.BatchNorm2d(out_ch), nn.ReLU())]
        for rate in atrous_rates:
            if separable:
                conv = SeparableConv2d(in_ch, out_ch, 3, padding=rate,
                                       dilation=rate, bias=False)
            else:
                conv = nn.Conv2d(in_ch, out_ch, 3, padding=rate,
                                 dilation=rate, bias=False)
            mods.append(nn.Sequential(conv, nn.BatchNorm2d(out_ch), nn.ReLU()))
        mods.append(ASPPPooling(in_ch, out_ch))
        self.convs = nn.ModuleList(mods)
        self.project = nn.Sequential(
            nn.Conv2d(5 * out_ch, out_ch, 1, bias=False),
            nn.BatchNorm2d(out_ch), nn.ReLU(), nn.Dropout(0.5),
        )

    def forward(self, x):
        res = torch.cat([conv(x) for conv in self.convs], dim=1)
        return self.project(res)


class DeepLabV3Decoder(nn.Sequential):
    def __init__(self, in_channels, out_channels=256):
        super().__init__(
            ASPP(in_channels, out_channels),
            nn.Conv2d(out_channels, out_channels, 3, padding=1, bias=False),
            nn.BatchNorm2d(out_channels),
            nn.ReLU(),
        )

    def forward(self, features):
        return super().forward(features[-1])


class DeepLabV3PlusDecoder(nn.Module):
    def __init__(self, encoder_channels, out_channels=256, output_stride=16):
        super().__init__()
        self.aspp = nn.Sequential(
            ASPP(encoder_channels[-1], out_channels, separable=True),
            SeparableConv2d(out_channels, out_channels, 3, padding=1, bias=False),
            nn.BatchNorm2d(out_channels),
            nn.ReLU(),
        )
        scale = 2 if output_stride == 8 else 4
        self.up = nn.UpsamplingBilinear2d(scale_factor=scale)
        self.block1 = nn.Sequential(
            nn.Conv2d(encoder_channels[-4], 48, 1, bias=False),
            nn.BatchNorm2d(48), nn.ReLU(),
        )
        self.block2 = nn.Sequential(
            SeparableConv2d(48 + out_channels, out_channels, 3, padding=1,
                            bias=False),
            nn.BatchNorm2d(out_channels), nn.ReLU(),
        )

    def forward(self, features):
        x = self.up(self.aspp(features[-1]))
        low = self.block1(features[-4])
        return self.block2(torch.cat([x, low], dim=1))


def make_dilated(stage: nn.Module, dilation_rate: int) -> None:
    """smp EncoderMixin.make_dilated semantics: every conv in the stage gets
    stride 1, the dilation rate, and (k//2)*rate padding."""
    for mod in stage.modules():
        if isinstance(mod, nn.Conv2d):
            mod.stride = (1, 1)
            mod.dilation = (dilation_rate, dilation_rate)
            kh, kw = mod.kernel_size
            mod.padding = ((kh // 2) * dilation_rate, (kw // 2) * dilation_rate)


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
        # encoder dilation per smp model defaults (PAN os=16, V3 os=8, V3+ os=16)
        output_stride = {'PAN': 16, 'DeepLabV3': 8, 'DeepLabV3Plus': 16}.get(arch)
        if output_stride is not None:
            if isinstance(self.encoder, ResNetEncoder):
                stages = [self.encoder.layer3, self.encoder.layer4]
            elif isinstance(self.encoder, RegNetEncoderT):
                stages = [self.encoder.s3, self.encoder.s4]
            elif isinstance(self.encoder, EfficientNetEncoderT):
                # smp get_stages boundaries: stage4 (1/16) = TF-stages 3+4 =
                # blocks (taps[1], taps[2]]; stage5 (1/32) = TF-stages 5+6 =
                # blocks (taps[2], end]
                taps = self.encoder._tap_after
                stages = [
                    nn.Sequential(*self.encoder._blocks[taps[1] + 1:taps[2] + 1]),
                    nn.Sequential(*self.encoder._blocks[taps[2] + 1:]),
                ]
            else:
                raise NotImplementedError(type(self.encoder))
            if output_stride == 8:
                make_dilated(stages[0], 2)
                make_dilated(stages[1], 4)
            else:
                make_dilated(stages[1], 2)
        upsampling = nn.Identity()
        if arch == 'Unet':
            self.decoder = UnetDecoder(ch)
            head_in, head_k = 16, 3
        elif arch == 'UnetPlusPlus':
            self.decoder = UnetPlusPlusDecoder(ch)
            head_in, head_k = 16, 3
        elif arch == 'Linknet':
            self.decoder = LinknetDecoder(ch)
            head_in, head_k = 32, 1
        elif arch == 'FPN':
            self.decoder = FPNDecoder(ch)
            head_in, head_k = 128, 1
            upsampling = nn.UpsamplingBilinear2d(scale_factor=4)
        elif arch == 'PSPNet':
            self.decoder = PSPDecoder(ch)
            head_in, head_k = 512, 3
            upsampling = nn.UpsamplingBilinear2d(scale_factor=8)
        elif arch == 'PAN':
            self.decoder = PANDecoder(ch)
            head_in, head_k = 32, 3
            upsampling = nn.UpsamplingBilinear2d(scale_factor=4)
        elif arch == 'MAnet':
            self.decoder = MAnetDecoder(ch)
            head_in, head_k = 16, 3
        elif arch == 'DeepLabV3':
            self.decoder = DeepLabV3Decoder(ch[-1])
            head_in, head_k = 256, 1
            upsampling = nn.UpsamplingBilinear2d(scale_factor=8)
        elif arch == 'DeepLabV3Plus':
            self.decoder = DeepLabV3PlusDecoder(ch)
            head_in, head_k = 256, 1
            upsampling = nn.UpsamplingBilinear2d(scale_factor=4)
        else:
            raise ValueError(arch)
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(head_in, classes, head_k, padding=head_k // 2),
            upsampling,
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

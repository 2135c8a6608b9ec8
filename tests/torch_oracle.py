"""Torch mirror of the UNet3D contract — test oracle only.

Built from the architecture contract in SURVEY.md §2.3 (Çiçek-style 3D
U-Net, 'crg' DoubleConv blocks, padded maxpool, trilinear decoder, 1x1x1
final_conv).  Used to pin the flax model's numerics against real ATen
kernels (Conv3d / GroupNorm / MaxPool3d / F.interpolate) and to validate
the .mdsm import path with torch-produced checkpoints.  Never imported by
the framework itself.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


def _num_groups(channels, preferred=32):
    g = min(preferred, channels)
    while channels % g:
        g -= 1
    return g


class DoubleConv(nn.Module):
    def __init__(self, cin, cout, order="crg"):
        super().__init__()
        mid = cout // 2 if cin < cout else cout
        self.order = order
        self.conv1 = nn.Conv3d(cin, mid, 3, padding=1)
        self.conv2 = nn.Conv3d(mid, cout, 3, padding=1)
        if "g" in order:
            self.norm1 = nn.GroupNorm(_num_groups(mid), mid)
            self.norm2 = nn.GroupNorm(_num_groups(cout), cout)

    def _block(self, x, conv, norm):
        for ch in self.order:
            if ch == "c":
                x = conv(x)
            elif ch == "r":
                x = F.relu(x)
            elif ch == "g":
                x = norm(x)
        return x

    def forward(self, x):
        x = self._block(x, self.conv1, getattr(self, "norm1", None))
        return self._block(x, self.conv2, getattr(self, "norm2", None))


class Encoder(nn.Module):
    def __init__(self, cin, cout, pool=True, order="crg"):
        super().__init__()
        self.pool = nn.MaxPool3d(2, padding=1) if pool else None
        self.double_conv = DoubleConv(cin, cout, order)

    def forward(self, x):
        if self.pool is not None:
            x = self.pool(x)
        return self.double_conv(x)


class Decoder(nn.Module):
    def __init__(self, cin, cout, order="crg", interpolate=True):
        super().__init__()
        if not interpolate:
            # deepsulci lineage: ConvTranspose3d(2c, 2c, 3, stride=2,
            # padding=1, output_padding=1) named `upsample`; combined with
            # the PADDED maxpool its 2*d output over-shoots the skip's
            # extent, so the pinned contract crops the leading corner
            # (CONTRACTS.md §5)
            self.upsample = nn.ConvTranspose3d(
                2 * cout, 2 * cout, 3, stride=2, padding=1, output_padding=1
            )
        self.double_conv = DoubleConv(cin, cout, order)

    def forward(self, skip, x):
        if hasattr(self, "upsample"):
            x = self.upsample(x)
            x = x[:, :, : skip.shape[2], : skip.shape[3], : skip.shape[4]]
        else:
            x = F.interpolate(
                x, size=skip.shape[2:], mode="trilinear", align_corners=False
            )
        return self.double_conv(torch.cat([skip, x], dim=1))


class UNet3DOracle(nn.Module):
    def __init__(
        self,
        in_channels,
        out_channels,
        final_sigmoid=False,
        conv_layer_order="crg",
        init_channel_number=64,
        num_conv=1,
        interpolate=True,
    ):
        super().__init__()
        i = init_channel_number
        self.encoders = nn.ModuleList(
            [
                Encoder(in_channels, i, pool=False, order=conv_layer_order),
                Encoder(i, 2 * i, order=conv_layer_order),
                Encoder(2 * i, 4 * i, order=conv_layer_order),
                Encoder(4 * i, 8 * i, order=conv_layer_order),
            ]
        )
        self.decoders = nn.ModuleList(
            [
                Decoder(4 * i + 8 * i, 4 * i, order=conv_layer_order,
                        interpolate=interpolate),
                Decoder(2 * i + 4 * i, 2 * i, order=conv_layer_order,
                        interpolate=interpolate),
                Decoder(i + 2 * i, i, order=conv_layer_order,
                        interpolate=interpolate),
            ]
        )
        if num_conv <= 1:
            self.final_conv = nn.Conv3d(i, out_channels, 1)
        else:
            fac = (i - out_channels) / num_conv
            head = nn.Sequential()
            for n in range(num_conv):
                head.add_module(
                    str(n),
                    nn.Conv3d(i - round(n * fac), i - round((n + 1) * fac), 1),
                )
            self.final_conv = head
        self.final_activation = (
            nn.Sigmoid() if final_sigmoid else nn.Softmax(dim=1)
        )

    def forward(self, x):
        skips = []
        for enc in self.encoders:
            x = enc(x)
            skips.insert(0, x)
        for dec, skip in zip(self.decoders, skips[1:]):
            x = dec(skip, x)
        x = self.final_conv(x)
        if not self.training:
            x = self.final_activation(x)
        return x

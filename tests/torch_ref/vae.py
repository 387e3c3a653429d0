"""Test-only torch reference AutoencoderKL with CompVis naming."""
import torch
import torch.nn as nn
import torch.nn.functional as F


def swish(x):
    return x * torch.sigmoid(x)


class ResnetBlock(nn.Module):
    def __init__(self, in_c, out_c):
        super().__init__()
        self.norm1 = nn.GroupNorm(32, in_c, eps=1e-6)
        self.conv1 = nn.Conv2d(in_c, out_c, 3, padding=1)
        self.norm2 = nn.GroupNorm(32, out_c, eps=1e-6)
        self.conv2 = nn.Conv2d(out_c, out_c, 3, padding=1)
        if in_c != out_c:
            self.nin_shortcut = nn.Conv2d(in_c, out_c, 1)

    def forward(self, x):
        h = self.conv1(swish(self.norm1(x)))
        h = self.conv2(swish(self.norm2(h)))
        if hasattr(self, "nin_shortcut"):
            x = self.nin_shortcut(x)
        return x + h


class AttnBlock(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.norm = nn.GroupNorm(32, ch, eps=1e-6)
        self.q = nn.Conv2d(ch, ch, 1)
        self.k = nn.Conv2d(ch, ch, 1)
        self.v = nn.Conv2d(ch, ch, 1)
        self.proj_out = nn.Conv2d(ch, ch, 1)

    def forward(self, x):
        b, c, hh, ww = x.shape
        h = self.norm(x)
        q = self.q(h).reshape(b, 1, c, hh * ww).transpose(2, 3)
        k = self.k(h).reshape(b, 1, c, hh * ww).transpose(2, 3)
        v = self.v(h).reshape(b, 1, c, hh * ww).transpose(2, 3)
        o = F.scaled_dot_product_attention(q, k, v)
        o = o.transpose(2, 3).reshape(b, c, hh, ww)
        return x + self.proj_out(o)


class Downsample(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, stride=2)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))


class Upsample(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))


class Level(nn.Module):
    def __init__(self):
        super().__init__()
        self.block = nn.ModuleList()


class TorchVAE(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        bc = cfg.base_channels
        self.cfg = cfg

        enc = nn.Module()
        enc.conv_in = nn.Conv2d(cfg.in_channels, bc, 3, padding=1)
        enc.down = nn.ModuleList()
        ch = bc
        for i, mult in enumerate(cfg.channel_mult):
            lvl = Level()
            out_c = bc * mult
            for _ in range(cfg.num_res_blocks):
                lvl.block.append(ResnetBlock(ch, out_c))
                ch = out_c
            if i != len(cfg.channel_mult) - 1:
                lvl.downsample = Downsample(ch)
            enc.down.append(lvl)
        enc.mid = nn.Module()
        enc.mid.block_1 = ResnetBlock(ch, ch)
        enc.mid.attn_1 = AttnBlock(ch)
        enc.mid.block_2 = ResnetBlock(ch, ch)
        enc.norm_out = nn.GroupNorm(32, ch, eps=1e-6)
        enc.conv_out = nn.Conv2d(ch, 2 * cfg.z_channels, 3, padding=1)
        self.encoder = enc
        self.quant_conv = nn.Conv2d(2 * cfg.z_channels, 2 * cfg.z_channels, 1)

        self.post_quant_conv = nn.Conv2d(cfg.z_channels, cfg.z_channels, 1)
        dec = nn.Module()
        top = bc * cfg.channel_mult[-1]
        dec.conv_in = nn.Conv2d(cfg.z_channels, top, 3, padding=1)
        dec.mid = nn.Module()
        dec.mid.block_1 = ResnetBlock(top, top)
        dec.mid.attn_1 = AttnBlock(top)
        dec.mid.block_2 = ResnetBlock(top, top)
        dec.up = nn.ModuleList()
        ch = top
        ups = {}
        for i in reversed(range(len(cfg.channel_mult))):
            lvl = Level()
            out_c = bc * cfg.channel_mult[i]
            for _ in range(cfg.num_res_blocks + 1):
                lvl.block.append(ResnetBlock(ch, out_c))
                ch = out_c
            if i != 0:
                lvl.upsample = Upsample(ch)
            ups[i] = lvl
        for i in range(len(cfg.channel_mult)):
            dec.up.append(ups[i])
        dec.norm_out = nn.GroupNorm(32, ch, eps=1e-6)
        dec.conv_out = nn.Conv2d(ch, cfg.in_channels, 3, padding=1)
        self.decoder = dec

    def encode_moments(self, x):
        enc = self.encoder
        h = enc.conv_in(x)
        for i, lvl in enumerate(enc.down):
            for blk in lvl.block:
                h = blk(h)
            if hasattr(lvl, "downsample"):
                h = lvl.downsample(h)
        h = enc.mid.block_1(h)
        h = enc.mid.attn_1(h)
        h = enc.mid.block_2(h)
        h = enc.conv_out(swish(enc.norm_out(h)))
        return self.quant_conv(h)

    def decode(self, z):
        dec = self.decoder
        h = self.post_quant_conv(z)
        h = dec.conv_in(h)
        h = dec.mid.block_1(h)
        h = dec.mid.attn_1(h)
        h = dec.mid.block_2(h)
        for i in reversed(range(len(dec.up))):
            lvl = dec.up[i]
            for blk in lvl.block:
                h = blk(h)
            if hasattr(lvl, "upsample"):
                h = lvl.upsample(h)
        return dec.conv_out(swish(dec.norm_out(h)))

"""Test-only torch reference UNet with CompVis module naming.

Used exclusively to cross-check the JAX UNet's wiring and numerics with
shared random weights; never imported by the framework.
"""
import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def timestep_embedding(t, dim, max_period=10000):
    half = dim // 2
    freqs = torch.exp(-math.log(max_period) * torch.arange(half, dtype=torch.float64) / half).to(
        torch.float32
    )
    args = t[:, None].float() * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class ResBlock(nn.Module):
    def __init__(self, in_ch, out_ch, emb_dim):
        super().__init__()
        self.in_layers = nn.Sequential(
            nn.GroupNorm(32, in_ch, eps=1e-5), nn.SiLU(), nn.Conv2d(in_ch, out_ch, 3, padding=1)
        )
        self.emb_layers = nn.Sequential(nn.SiLU(), nn.Linear(emb_dim, out_ch))
        self.out_layers = nn.Sequential(
            nn.GroupNorm(32, out_ch, eps=1e-5),
            nn.SiLU(),
            nn.Identity(),
            nn.Conv2d(out_ch, out_ch, 3, padding=1),
        )
        self.skip_connection = (
            nn.Conv2d(in_ch, out_ch, 1) if in_ch != out_ch else nn.Identity()
        )

    def forward(self, x, emb):
        h = self.in_layers(x)
        h = h + self.emb_layers(emb)[:, :, None, None]
        h = self.out_layers(h)
        return self.skip_connection(x) + h


class CrossAttention(nn.Module):
    def __init__(self, dim, ctx_dim, heads):
        super().__init__()
        self.heads = heads
        self.to_q = nn.Linear(dim, dim, bias=False)
        self.to_k = nn.Linear(ctx_dim, dim, bias=False)
        self.to_v = nn.Linear(ctx_dim, dim, bias=False)
        self.to_out = nn.Sequential(nn.Linear(dim, dim))

    def forward(self, x, context=None):
        ctx = x if context is None else context
        b, l, c = x.shape
        h = self.heads
        q = self.to_q(x).view(b, l, h, c // h).transpose(1, 2)
        k = self.to_k(ctx).view(b, ctx.shape[1], h, c // h).transpose(1, 2)
        v = self.to_v(ctx).view(b, ctx.shape[1], h, c // h).transpose(1, 2)
        o = F.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(b, l, c)
        return self.to_out(o)


class GEGLU(nn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = nn.Linear(dim, inner * 2)

    def forward(self, x):
        a, g = self.proj(x).chunk(2, dim=-1)
        return a * F.gelu(g)


class FeedForward(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.net = nn.Sequential(GEGLU(dim, dim * 4), nn.Identity(), nn.Linear(dim * 4, dim))

    def forward(self, x):
        return self.net(x)


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim, ctx_dim, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = CrossAttention(dim, dim, heads)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = CrossAttention(dim, ctx_dim, heads)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = FeedForward(dim)

    def forward(self, x, context):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context)
        x = x + self.ff(self.norm3(x))
        return x


class SpatialTransformer(nn.Module):
    def __init__(self, dim, ctx_dim, heads, depth, use_linear):
        super().__init__()
        self.use_linear = use_linear
        self.norm = nn.GroupNorm(32, dim, eps=1e-6)
        if use_linear:
            self.proj_in = nn.Linear(dim, dim)
            self.proj_out = nn.Linear(dim, dim)
        else:
            self.proj_in = nn.Conv2d(dim, dim, 1)
            self.proj_out = nn.Conv2d(dim, dim, 1)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(dim, ctx_dim, heads) for _ in range(depth)]
        )

    def forward(self, x, context):
        b, c, hh, ww = x.shape
        res = x
        h = self.norm(x)
        if self.use_linear:
            h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
            h = self.proj_in(h)
        else:
            h = self.proj_in(h)
            h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
        for blk in self.transformer_blocks:
            h = blk(h, context)
        if self.use_linear:
            h = self.proj_out(h)
            h = h.reshape(b, hh, ww, c).permute(0, 3, 1, 2)
        else:
            h = h.reshape(b, hh, ww, c).permute(0, 3, 1, 2)
            h = self.proj_out(h)
        return res + h


class Downsample(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.op = nn.Conv2d(ch, ch, 3, stride=2, padding=1)

    def forward(self, x):
        return self.op(x)


class Upsample(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))


class TorchUNet(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        mc = cfg.model_channels
        emb_dim = 4 * mc
        self.time_embed = nn.Sequential(
            nn.Linear(mc, emb_dim), nn.SiLU(), nn.Linear(emb_dim, emb_dim)
        )
        if cfg.adm_in_channels is not None:
            self.label_emb = nn.Sequential(
                nn.Sequential(
                    nn.Linear(cfg.adm_in_channels, emb_dim), nn.SiLU(), nn.Linear(emb_dim, emb_dim)
                )
            )

        def heads(ch):
            if cfg.num_head_channels is not None:
                return ch // cfg.num_head_channels
            return cfg.num_heads

        self.input_blocks = nn.ModuleList(
            [nn.ModuleList([nn.Conv2d(cfg.in_channels, mc, 3, padding=1)])]
        )
        ch = mc
        skips = [mc]
        ds = 1
        for level, mult in enumerate(cfg.channel_mult):
            for _ in range(cfg.num_res_blocks):
                out_c = mult * mc
                layers = [ResBlock(ch, out_c, emb_dim)]
                ch = out_c
                if ds in cfg.attention_resolutions and cfg.transformer_depth[level] > 0:
                    layers.append(
                        SpatialTransformer(
                            ch,
                            cfg.context_dim,
                            heads(ch),
                            cfg.transformer_depth[level],
                            cfg.use_linear_in_transformer,
                        )
                    )
                self.input_blocks.append(nn.ModuleList(layers))
                skips.append(ch)
            if level != len(cfg.channel_mult) - 1:
                self.input_blocks.append(nn.ModuleList([Downsample(ch)]))
                skips.append(ch)
                ds *= 2
        mid_depth = cfg.transformer_depth[-1] if cfg.transformer_depth[-1] > 0 else 1
        self.middle_block = nn.ModuleList(
            [
                ResBlock(ch, ch, emb_dim),
                SpatialTransformer(
                    ch, cfg.context_dim, heads(ch), mid_depth, cfg.use_linear_in_transformer
                ),
                ResBlock(ch, ch, emb_dim),
            ]
        )
        self.output_blocks = nn.ModuleList()
        for level in reversed(range(len(cfg.channel_mult))):
            out_c = cfg.channel_mult[level] * mc
            for i in range(cfg.num_res_blocks + 1):
                skip = skips.pop()
                layers = [ResBlock(ch + skip, out_c, emb_dim)]
                ch = out_c
                if ds in cfg.attention_resolutions and cfg.transformer_depth[level] > 0:
                    layers.append(
                        SpatialTransformer(
                            ch,
                            cfg.context_dim,
                            heads(ch),
                            cfg.transformer_depth[level],
                            cfg.use_linear_in_transformer,
                        )
                    )
                if level != 0 and i == cfg.num_res_blocks:
                    layers.append(Upsample(ch))
                    ds //= 2
                self.output_blocks.append(nn.ModuleList(layers))
        self.out = nn.Sequential(
            nn.GroupNorm(32, mc, eps=1e-5), nn.SiLU(), nn.Conv2d(mc, cfg.out_channels, 3, padding=1)
        )

    def forward(self, x, t, context, y=None):
        emb = self.time_embed(timestep_embedding(t, self.cfg.model_channels))
        if y is not None:
            emb = emb + self.label_emb(y)
        hs = []
        h = x
        for blk in self.input_blocks:
            for layer in blk:
                if isinstance(layer, ResBlock):
                    h = layer(h, emb)
                elif isinstance(layer, SpatialTransformer):
                    h = layer(h, context)
                else:
                    h = layer(h)
            hs.append(h)
        h = self.middle_block[0](h, emb)
        h = self.middle_block[1](h, context)
        h = self.middle_block[2](h, emb)
        for blk in self.output_blocks:
            h = torch.cat([h, hs.pop()], dim=1)
            for layer in blk:
                if isinstance(layer, ResBlock):
                    h = layer(h, emb)
                elif isinstance(layer, SpatialTransformer):
                    h = layer(h, context)
                else:
                    h = layer(h)
        return self.out(h)

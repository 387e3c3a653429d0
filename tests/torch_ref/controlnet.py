"""Test-only torch ControlNet reference (transcribed from the reference C++
math, src/model/diffusion/control.hpp:311: UNet-encoder copy, zero-conv
taps, conv-silu hint stem with /8 strides).  Reuses the torch UNet oracle's
blocks; state-dict names match the checkpoint scheme consumed by
sdtpu.models.controlnet."""
import torch
import torch.nn as nn

from .unet import (
    Downsample, ResBlock, SpatialTransformer, timestep_embedding,
)


class TorchControlNet(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        mc = cfg.model_channels
        emb_dim = 4 * mc
        self.time_embed = nn.Sequential(
            nn.Linear(mc, emb_dim), nn.SiLU(), nn.Linear(emb_dim, emb_dim)
        )
        if cfg.adm_in_channels is not None:
            self.label_emb = nn.Sequential(nn.Sequential(
                nn.Linear(cfg.adm_in_channels, emb_dim), nn.SiLU(),
                nn.Linear(emb_dim, emb_dim)))

        hint_chs = [(16, 3), (16, 16), (32, 16), (32, 32), (96, 32),
                    (96, 96), (256, 96), (mc, 256)]
        stem = []
        for n, (o, ic) in enumerate(hint_chs):
            stride = 2 if n in (2, 4, 6) else 1
            stem.append(nn.Conv2d(ic, o, 3, stride=stride, padding=1))
            if n < len(hint_chs) - 1:
                stem.append(nn.SiLU())
        self.input_hint_block = nn.Sequential(*stem)

        def heads(ch):
            if cfg.num_head_channels is not None:
                return ch // cfg.num_head_channels
            return cfg.num_heads

        self.input_blocks = nn.ModuleList(
            [nn.ModuleList([nn.Conv2d(cfg.in_channels, mc, 3, padding=1)])]
        )
        zero = [nn.Sequential(nn.Conv2d(mc, mc, 1))]
        ch = mc
        ds = 1
        for level, mult in enumerate(cfg.channel_mult):
            for _ in range(cfg.num_res_blocks):
                out_c = mult * mc
                layers = [ResBlock(ch, out_c, emb_dim)]
                ch = out_c
                if ds in cfg.attention_resolutions and \
                        cfg.transformer_depth[level] > 0:
                    layers.append(SpatialTransformer(
                        ch, cfg.context_dim, heads(ch),
                        cfg.transformer_depth[level],
                        cfg.use_linear_in_transformer))
                self.input_blocks.append(nn.ModuleList(layers))
                zero.append(nn.Sequential(nn.Conv2d(ch, ch, 1)))
            if level != len(cfg.channel_mult) - 1:
                self.input_blocks.append(nn.ModuleList([Downsample(ch)]))
                zero.append(nn.Sequential(nn.Conv2d(ch, ch, 1)))
                ds *= 2
        self.zero_convs = nn.ModuleList(zero)
        mid_depth = (cfg.transformer_depth[-1]
                     if cfg.transformer_depth[-1] > 0 else 1)
        self.middle_block = nn.ModuleList([
            ResBlock(ch, ch, emb_dim),
            SpatialTransformer(ch, cfg.context_dim, heads(ch), mid_depth,
                               cfg.use_linear_in_transformer),
            ResBlock(ch, ch, emb_dim),
        ])
        self.middle_block_out = nn.Sequential(nn.Conv2d(ch, ch, 1))

    def forward(self, x, hint, t, context, y=None):
        emb = self.time_embed(timestep_embedding(t, self.cfg.model_channels))
        if y is not None:
            emb = emb + self.label_emb(y)
        guided_hint = self.input_hint_block(hint)
        controls = []
        h = x
        for i, blk in enumerate(self.input_blocks):
            for layer in blk:
                if isinstance(layer, ResBlock):
                    h = layer(h, emb)
                elif isinstance(layer, SpatialTransformer):
                    h = layer(h, context)
                else:
                    h = layer(h)
                    if i == 0:
                        h = h + guided_hint
            controls.append(self.zero_convs[i](h))
        h = self.middle_block[0](h, emb)
        h = self.middle_block[1](h, context)
        h = self.middle_block[2](h, emb)
        return controls, self.middle_block_out(h)

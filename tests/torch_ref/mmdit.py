"""Test-only torch MMDiT reference (SD3 architecture, checkpoint naming)."""
import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def timestep_embedding(t, dim, max_period=10000):
    half = dim // 2
    freqs = torch.exp(
        -math.log(max_period) * torch.arange(half, dtype=torch.float64) / half
    ).to(torch.float32)
    args = t[:, None].float() * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class Mlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x), approximate="tanh"))


class SelfAttention(nn.Module):
    def __init__(self, dim, heads, qk_norm=None, pre_only=False):
        super().__init__()
        self.heads = heads
        self.qkv = nn.Linear(dim, dim * 3)
        if not pre_only:
            self.proj = nn.Linear(dim, dim)
        if qk_norm == "rms":
            self.ln_q = nn.RMSNorm(dim // heads, eps=1e-6)
            self.ln_k = nn.RMSNorm(dim // heads, eps=1e-6)
        self.qk_norm = qk_norm

    def pre(self, x):
        b, l, c = x.shape
        q, k, v = self.qkv(x).chunk(3, dim=-1)
        q = q.view(b, l, self.heads, -1)
        k = k.view(b, l, self.heads, -1)
        v = v.view(b, l, self.heads, -1)
        if self.qk_norm == "rms":
            q = self.ln_q(q)
            k = self.ln_k(k)
        return q, k, v


def modulate(x, shift, scale):
    return x * (1 + scale.unsqueeze(1)) + shift.unsqueeze(1)


class DismantledBlock(nn.Module):
    def __init__(self, dim, heads, qk_norm=None, pre_only=False, self_attn=False):
        super().__init__()
        self.pre_only, self.self_attn = pre_only, self_attn
        self.norm1 = nn.LayerNorm(dim, eps=1e-6, elementwise_affine=False)
        self.attn = SelfAttention(dim, heads, qk_norm, pre_only)
        if self_attn:
            self.attn2 = SelfAttention(dim, heads, qk_norm, False)
        if not pre_only:
            self.norm2 = nn.LayerNorm(dim, eps=1e-6, elementwise_affine=False)
            self.mlp = Mlp(dim, dim * 4)
        n_mods = 2 if pre_only else (9 if self_attn else 6)
        self.adaLN_modulation = nn.Sequential(nn.SiLU(), nn.Linear(dim, n_mods * dim))


class TorchMMDiT(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        hid = cfg.hidden_size
        self.x_embedder = nn.Module()
        self.x_embedder.proj = nn.Conv2d(cfg.in_channels, hid, cfg.patch_size, cfg.patch_size)
        self.t_embedder = nn.Module()
        self.t_embedder.mlp = nn.Sequential(
            nn.Linear(256, hid), nn.SiLU(), nn.Linear(hid, hid)
        )
        self.y_embedder = nn.Module()
        self.y_embedder.mlp = nn.Sequential(
            nn.Linear(cfg.adm_in_channels, hid), nn.SiLU(), nn.Linear(hid, hid)
        )
        self.context_embedder = nn.Linear(cfg.context_size, hid)
        self.pos_embed = nn.Parameter(torch.randn(1, cfg.pos_embed_max_size**2, hid) * 0.01)
        self.joint_blocks = nn.ModuleList()
        for i in range(cfg.depth):
            blk = nn.Module()
            blk.context_block = DismantledBlock(
                hid, cfg.num_heads, cfg.qk_norm, pre_only=i == cfg.depth - 1
            )
            blk.x_block = DismantledBlock(
                hid, cfg.num_heads, cfg.qk_norm, False, self_attn=i < cfg.num_x_self_attn_layers
            )
            self.joint_blocks.append(blk)
        self.final_layer = nn.Module()
        self.final_layer.norm_final = nn.LayerNorm(hid, eps=1e-6, elementwise_affine=False)
        self.final_layer.linear = nn.Linear(hid, cfg.patch_size**2 * cfg.out_channels)
        self.final_layer.adaLN_modulation = nn.Sequential(nn.SiLU(), nn.Linear(hid, 2 * hid))

    def cropped_pos_embed(self, hp, wp):
        P = self.cfg.pos_embed_max_size
        pe = self.pos_embed.view(P, P, -1)
        top, left = (P - hp) // 2, (P - wp) // 2
        return pe[top : top + hp, left : left + wp].reshape(1, hp * wp, -1)

    def forward(self, x, t, context, y):
        cfg = self.cfg
        b, c, h, w = x.shape
        ps = cfg.patch_size
        hp, wp = h // ps, w // ps
        tokens = self.x_embedder.proj(x).flatten(2).transpose(1, 2)  # [b, hp*wp, hid]
        tokens = tokens + self.cropped_pos_embed(hp, wp)
        cvec = self.t_embedder.mlp(timestep_embedding(t, 256))
        cvec = cvec + self.y_embedder.mlp(y)
        ctx = self.context_embedder(context)
        n_ctx = ctx.shape[1]
        for i, blk in enumerate(self.joint_blocks):
            cb, xb = blk.context_block, blk.x_block
            mods_c = cb.adaLN_modulation(cvec).chunk(2 if cb.pre_only else 6, dim=-1)
            ctx_in = modulate(cb.norm1(ctx), mods_c[0], mods_c[1])
            cq, ck, cv = cb.attn.pre(ctx_in)
            n_mods_x = 9 if xb.self_attn else 6
            mods_x = xb.adaLN_modulation(cvec).chunk(n_mods_x, dim=-1)
            x_norm = xb.norm1(tokens)
            x_in = modulate(x_norm, mods_x[0], mods_x[1])
            xq, xk, xv = xb.attn.pre(x_in)
            q = torch.cat([cq, xq], dim=1).transpose(1, 2)
            k = torch.cat([ck, xk], dim=1).transpose(1, 2)
            v = torch.cat([cv, xv], dim=1).transpose(1, 2)
            att = F.scaled_dot_product_attention(q, k, v).transpose(1, 2).reshape(
                b, -1, cfg.hidden_size
            )
            ctx_attn, x_attn = att[:, :n_ctx], att[:, n_ctx:]
            if not cb.pre_only:
                ctx = ctx + cb.attn.proj(ctx_attn) * mods_c[2].unsqueeze(1)
                ctx = ctx + cb.mlp(modulate(cb.norm2(ctx), mods_c[3], mods_c[4])) * mods_c[
                    5
                ].unsqueeze(1)
            tokens = tokens + xb.attn.proj(x_attn) * mods_x[2].unsqueeze(1)
            if xb.self_attn:
                x_in2 = modulate(x_norm, mods_x[6], mods_x[7])
                q2, k2, v2 = xb.attn2.pre(x_in2)
                att2 = F.scaled_dot_product_attention(
                    q2.transpose(1, 2), k2.transpose(1, 2), v2.transpose(1, 2)
                ).transpose(1, 2).reshape(b, -1, cfg.hidden_size)
                tokens = tokens + xb.attn2.proj(att2) * mods_x[8].unsqueeze(1)
            tokens = tokens + xb.mlp(modulate(xb.norm2(tokens), mods_x[3], mods_x[4])) * mods_x[
                5
            ].unsqueeze(1)
        shift, scale = self.final_layer.adaLN_modulation(cvec).chunk(2, dim=-1)
        out = modulate(self.final_layer.norm_final(tokens), shift, scale)
        out = self.final_layer.linear(out)
        out = out.view(b, hp, wp, ps, ps, cfg.out_channels)
        out = out.permute(0, 5, 1, 3, 2, 4).reshape(b, cfg.out_channels, h, w)
        return out

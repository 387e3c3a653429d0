"""Test-only torch Ideogram4 reference (transcribed from the reference C++
math, src/model/diffusion/ideogram4.hpp: M-RoPE :148, blocks :354, sin|cos
timestep :71, negated velocity :428).  Consumes the same checkpoint-named
param dict as sdtpu.models.ideogram4."""
import math

import numpy as np
import torch
import torch.nn.functional as F

IMAGE_POSITION_OFFSET = 65536


def _lin(p, name, x):
    return F.linear(x, p[f"{name}.weight"], p.get(f"{name}.bias"))


def _rms(x, w, eps):
    v = x.float()
    return v * torch.rsqrt(v.pow(2).mean(-1, keepdim=True) + eps) * w.float()


def _sin_cos_embedding(t, dim):
    half = dim // 2
    freqs = torch.exp(
        -math.log(10000.0) * torch.arange(half, dtype=torch.float64) / half
    ).to(torch.float32)
    args = t[:, None].float() * freqs[None]
    return torch.cat([torch.sin(args), torch.cos(args)], dim=-1)


def _rope_tables(grid_h, grid_w, n_txt, cfg):
    hd = cfg.emb_dim // cfg.num_heads
    half = hd // 2
    n_img = grid_h * grid_w
    ids = np.zeros((n_txt + n_img, 3), dtype=np.float64)
    ids[:n_txt, 0] = ids[:n_txt, 1] = ids[:n_txt, 2] = np.arange(n_txt)
    ii, jj = np.meshgrid(np.arange(grid_h), np.arange(grid_w), indexing="ij")
    ids[n_txt:, 0] = IMAGE_POSITION_OFFSET
    ids[n_txt:, 1] = IMAGE_POSITION_OFFSET + ii.reshape(-1)
    ids[n_txt:, 2] = IMAGE_POSITION_OFFSET + jj.reshape(-1)
    omega = 1.0 / (cfg.rope_theta ** (np.arange(half, dtype=np.float64) / half))
    axis_sel = np.zeros((half,), dtype=np.int64)
    for axis in (1, 2):
        length = min(cfg.mrope_section[axis] * 3, half)
        sel = np.arange(axis, length, 3)
        axis_sel[sel] = axis
    pos = ids[np.arange(ids.shape[0])[:, None], axis_sel[None, :]]
    ang = pos * omega[None, :]
    return (torch.from_numpy(np.cos(ang).astype(np.float32)),
            torch.from_numpy(np.sin(ang).astype(np.float32)))


def _apply_rope_halves(x, cos, sin):
    d = x.shape[-1]
    half = d // 2
    xf = x.float()
    x1, x2 = xf[..., :half], xf[..., half:]
    o1 = x1 * cos[None, None] - x2 * sin[None, None]
    o2 = x1 * sin[None, None] + x2 * cos[None, None]
    return torch.cat([o1, o2], dim=-1)


def ideogram4_forward_torch(p, x, timesteps, context, cfg):
    b, hh, ww, c = x.shape
    ae, ps = cfg.ae_channels, cfg.patch_size
    n_img = hh * ww
    nh = cfg.num_heads
    hd = cfg.emb_dim // nh

    img = x.view(b, hh, ww, ae, ps, ps).permute(0, 1, 2, 4, 5, 3)
    img = img.reshape(b, n_img, c)
    img = _lin(p, "input_proj", img)

    n_txt = 0
    hseq = img
    if context is not None:
        lh = context.shape[-1] // cfg.llm_layers
        txt = context.view(b, context.shape[1], cfg.llm_layers, lh)
        txt = txt.permute(0, 1, 3, 2).reshape(b, context.shape[1], -1)
        txt = _rms(txt, p["llm_cond_norm.weight"], 1e-6)
        txt = _lin(p, "llm_cond_proj", txt)
        n_txt = txt.shape[1]
        hseq = torch.cat([txt, img], dim=1)

    indicator = torch.cat([
        torch.zeros(n_txt, dtype=torch.long), torch.ones(n_img, dtype=torch.long)])
    hseq = hseq + p["embed_image_indicator.weight"][indicator][None]

    t_emb = _sin_cos_embedding(timesteps * 10.0, cfg.emb_dim)
    t_emb = F.silu(_lin(p, "t_embedding.mlp_in", t_emb))
    t_emb = _lin(p, "t_embedding.mlp_out", t_emb)
    adaln = F.silu(_lin(p, "adaln_proj", t_emb))

    cos, sin = _rope_tables(hh, ww, n_txt, cfg)
    for i in range(cfg.num_layers):
        pre = f"layers.{i}"
        mods = _lin(p, f"{pre}.adaln_modulation", adaln)[:, None]
        sc_msa, g_msa, sc_mlp, g_mlp = mods.chunk(4, dim=-1)
        h = _rms(hseq, p[f"{pre}.attention_norm1.weight"], cfg.norm_eps)
        h = h * (1.0 + sc_msa)
        s = h.shape[1]
        q, k, v = _lin(p, f"{pre}.attention.qkv", h).chunk(3, dim=-1)
        q = _rms(q.view(b, s, nh, hd), p[f"{pre}.attention.norm_q.weight"], cfg.norm_eps)
        k = _rms(k.view(b, s, nh, hd), p[f"{pre}.attention.norm_k.weight"], cfg.norm_eps)
        q = _apply_rope_halves(q.permute(0, 2, 1, 3), cos, sin)
        k = _apply_rope_halves(k.permute(0, 2, 1, 3), cos, sin)
        v = v.view(b, s, nh, hd).permute(0, 2, 1, 3).float()
        o = F.scaled_dot_product_attention(q, k, v)
        o = o.permute(0, 2, 1, 3).reshape(b, s, nh * hd)
        h = _lin(p, f"{pre}.attention.o", o)
        h = _rms(h, p[f"{pre}.attention_norm2.weight"], cfg.norm_eps)
        hseq = hseq + h * torch.tanh(g_msa)
        h = _rms(hseq, p[f"{pre}.ffn_norm1.weight"], cfg.norm_eps)
        h = h * (1.0 + sc_mlp)
        h = _lin(p, f"{pre}.feed_forward.w2",
                 F.silu(_lin(p, f"{pre}.feed_forward.w1", h))
                 * _lin(p, f"{pre}.feed_forward.w3", h))
        h = _rms(h, p[f"{pre}.ffn_norm2.weight"], cfg.norm_eps)
        hseq = hseq + h * torch.tanh(g_mlp)

    scale = _lin(p, "final_layer.adaln_modulation", F.silu(adaln))
    out = F.layer_norm(hseq, (cfg.emb_dim,), eps=1e-6)
    out = out * (1.0 + scale[:, None])
    out = _lin(p, "final_layer.linear", out)
    out = out[:, n_txt:]
    out = out.view(b, hh, ww, ps, ps, ae).permute(0, 1, 2, 5, 3, 4)
    return -out.reshape(b, hh, ww, c)

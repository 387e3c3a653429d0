"""Test-only torch Wan DiT reference (transcribed from the reference C++
math, src/model/diffusion/wan.hpp: WanSelfAttention :118, WanCrossAttention
:200, WanAttentionBlock :244, Head :433, patchify/time embeds :598-700).
Consumes the same checkpoint-named param dict as sdtpu.models.wan."""
import math

import numpy as np
import torch
import torch.nn.functional as F

from .flux import rope_rot, timestep_embedding


def _lin(p, name, x):
    return F.linear(x, p[f"{name}.weight"], p.get(f"{name}.bias"))


def _rms(x, w, eps):
    v = x.float()
    return v * torch.rsqrt(v.pow(2).mean(-1, keepdim=True) + eps) * w.float()


def _apply_rope(x, rot):
    b, h, l, d = x.shape
    xf = x.float().reshape(b, h, l, d // 2, 2)
    x0, x1 = xf[..., 0], xf[..., 1]
    o0 = rot[None, None, :, :, 0, 0] * x0 + rot[None, None, :, :, 0, 1] * x1
    o1 = rot[None, None, :, :, 1, 0] * x0 + rot[None, None, :, :, 1, 1] * x1
    return torch.stack([o0, o1], dim=-1).reshape(b, h, l, d)


def _heads(t, nh):
    b, l, c = t.shape
    return t.view(b, l, nh, c // nh).permute(0, 2, 1, 3)


def _self_attn(p, pre, x, rot, nh, eps):
    b, l, dim = x.shape
    q = _rms(_lin(p, f"{pre}.q", x), p[f"{pre}.norm_q.weight"], eps)
    k = _rms(_lin(p, f"{pre}.k", x), p[f"{pre}.norm_k.weight"], eps)
    v = _lin(p, f"{pre}.v", x)
    q = _apply_rope(_heads(q, nh), rot)
    k = _apply_rope(_heads(k, nh), rot)
    o = F.scaled_dot_product_attention(q, k, _heads(v, nh).float())
    return _lin(p, f"{pre}.o", o.permute(0, 2, 1, 3).reshape(b, l, dim))


def _cross_attn(p, pre, x, ctx, nh, eps, cil=0):
    b, l, dim = x.shape
    q = _heads(_rms(_lin(p, f"{pre}.q", x), p[f"{pre}.norm_q.weight"], eps), nh)
    ctx_txt = ctx[:, cil:]
    k = _heads(_rms(_lin(p, f"{pre}.k", ctx_txt), p[f"{pre}.norm_k.weight"], eps), nh)
    v = _heads(_lin(p, f"{pre}.v", ctx_txt), nh)
    o = F.scaled_dot_product_attention(q, k, v.float())
    if cil > 0:
        ctx_img = ctx[:, :cil]
        ki = _heads(_rms(_lin(p, f"{pre}.k_img", ctx_img),
                         p[f"{pre}.norm_k_img.weight"], eps), nh)
        vi = _heads(_lin(p, f"{pre}.v_img", ctx_img), nh)
        o = o + F.scaled_dot_product_attention(q, ki, vi.float())
    return _lin(p, f"{pre}.o", o.permute(0, 2, 1, 3).reshape(b, l, dim))


def wan_forward_torch(p, x, timesteps, context, cfg, clip_fea=None):
    """x: [B,T,H,W,C]; returns [B,T,H,W,out_dim]."""
    b, t, hh, ww, c = x.shape
    pt, ph, pw = cfg.patch_size
    assert t % pt == 0 and hh % ph == 0 and ww % pw == 0, "oracle: pre-padded"
    tl, hl, wl = t // pt, hh // ph, ww // pw
    eps = cfg.eps

    img = x.reshape(b, tl, pt, hl, ph, wl, pw, c)
    img = img.permute(0, 1, 3, 5, 7, 2, 4, 6).reshape(
        b, tl * hl * wl, c * pt * ph * pw
    )
    w_patch = p["patch_embedding.weight"].reshape(cfg.dim, -1)
    img = F.linear(img, w_patch, p["patch_embedding.bias"])

    t_emb = timestep_embedding(timesteps, cfg.freq_dim)
    e = _lin(p, "time_embedding.0", t_emb)
    e = _lin(p, "time_embedding.2", F.silu(e))
    e0 = _lin(p, "time_projection.1", F.silu(e)).view(b, 6, cfg.dim)

    ctx = _lin(p, "text_embedding.0", context)
    ctx = _lin(p, "text_embedding.2", F.gelu(ctx))

    cil = 0
    if clip_fea is not None and cfg.model_type == "i2v":
        ci = F.layer_norm(clip_fea, (clip_fea.shape[-1],),
                          p["img_emb.proj.0.weight"], p["img_emb.proj.0.bias"])
        ci = _lin(p, "img_emb.proj.1", ci)
        ci = _lin(p, "img_emb.proj.3", F.gelu(ci, approximate="tanh"))
        ci = F.layer_norm(ci, (ci.shape[-1],),
                          p["img_emb.proj.4.weight"], p["img_emb.proj.4.bias"])
        ctx = torch.cat([ci, ctx], dim=1)
        cil = clip_fea.shape[1]

    ids = np.zeros((tl * hl * wl, 3), dtype=np.int64)
    ti, hi, wi = np.meshgrid(np.arange(tl), np.arange(hl), np.arange(wl), indexing="ij")
    ids[:, 0], ids[:, 1], ids[:, 2] = ti.reshape(-1), hi.reshape(-1), wi.reshape(-1)
    rot = rope_rot(ids, cfg.axes_dim, cfg.theta)

    h = img
    for i in range(cfg.num_layers):
        pre = f"blocks.{i}"
        es = e0 + p[f"{pre}.modulation"].view(1, 6, cfg.dim)
        sh_sa, sc_sa, g_sa = es[:, 0, None], es[:, 1, None], es[:, 2, None]
        sh_ff, sc_ff, g_ff = es[:, 3, None], es[:, 4, None], es[:, 5, None]

        y = F.layer_norm(h, (cfg.dim,), eps=eps) * (1 + sc_sa) + sh_sa
        h = h + _self_attn(p, f"{pre}.self_attn", y, rot, cfg.num_heads, eps) * g_sa

        hn = (
            F.layer_norm(h, (cfg.dim,), p[f"{pre}.norm3.weight"],
                         p[f"{pre}.norm3.bias"], eps=eps)
            if cfg.cross_attn_norm
            else h
        )
        h = h + _cross_attn(p, f"{pre}.cross_attn", hn, ctx, cfg.num_heads, eps, cil)

        y = F.layer_norm(h, (cfg.dim,), eps=eps) * (1 + sc_ff) + sh_ff
        y = _lin(p, f"{pre}.ffn.0", y)
        y = _lin(p, f"{pre}.ffn.2", F.gelu(y, approximate="tanh"))
        h = h + y * g_ff

    e2 = e[:, None, :] + p["head.modulation"].view(1, 2, cfg.dim)
    h = F.layer_norm(h, (cfg.dim,), eps=eps) * (1 + e2[:, 1, None]) + e2[:, 0, None]
    h = _lin(p, "head.head", h)
    out = h.view(b, tl, hl, wl, cfg.out_dim, pt, ph, pw)
    out = out.permute(0, 1, 5, 2, 6, 3, 7, 4).reshape(
        b, tl * pt, hl * ph, wl * pw, cfg.out_dim
    )
    return out

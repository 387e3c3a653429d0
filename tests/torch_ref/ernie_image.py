"""Test-only torch ERNIE-Image reference (transcribed from the reference
C++ math, src/model/diffusion/ernie_image.hpp: rotate-half rope :86-98,
shared adaLN :281-340, final AdaLN-continuous :260).  Consumes the same
checkpoint-named param dict as sdtpu.models.ernie_image."""
import math

import numpy as np
import torch
import torch.nn.functional as F


def _lin(p, name, x):
    return F.linear(x, p[f"{name}.weight"], p.get(f"{name}.bias"))


def _rms(x, w, eps):
    v = x.float()
    return v * torch.rsqrt(v.pow(2).mean(-1, keepdim=True) + eps) * w.float()


def _sin_cos_embedding(t, dim):
    """[sin | cos] ordering (timestep_embedding_sin_cos)."""
    half = dim // 2
    freqs = torch.exp(
        -math.log(10000.0) * torch.arange(half, dtype=torch.float64) / half
    ).to(torch.float32)
    args = t[:, None].float() * freqs[None]
    return torch.cat([torch.sin(args), torch.cos(args)], dim=-1)


def _rope_tables(hp, wp, n_txt, cfg):
    n_img = hp * wp
    ids = np.zeros((n_img + n_txt, 3), dtype=np.float64)
    ii, jj = np.meshgrid(np.arange(hp), np.arange(wp), indexing="ij")
    ids[:n_img, 0] = n_txt
    ids[:n_img, 1] = ii.reshape(-1)
    ids[:n_img, 2] = jj.reshape(-1)
    ids[n_img:, 0] = np.arange(n_txt)
    angles = []
    for a, dim in enumerate(cfg.axes_dim):
        scale = np.arange(0, dim, 2, dtype=np.float64) / dim
        omega = 1.0 / (float(cfg.theta) ** scale)
        angles.append(ids[:, a:a + 1] * omega[None])
    ang = np.concatenate(angles, axis=1)
    cos = torch.from_numpy(np.repeat(np.cos(ang), 2, axis=1).astype(np.float32))
    sin = torch.from_numpy(np.repeat(np.sin(ang), 2, axis=1).astype(np.float32))
    return cos, sin


def _apply_rotary(x, cos, sin):
    d = x.shape[-1]
    half = d // 2
    xf = x.float()
    rotated = torch.cat([-xf[..., half:], xf[..., :half]], dim=-1)
    return xf * cos[None, :, None] + rotated * sin[None, :, None]


def ernie_image_forward_torch(p, x, timesteps, context, cfg):
    b, h, w, c = x.shape
    ps = cfg.patch_size
    hp, wp = h // ps, w // ps
    n_img = hp * wp
    hid = cfg.hidden_size
    nh = cfg.num_heads
    hd = hid // nh

    if ps == 1:
        img = x.reshape(b, n_img, c)
    else:
        img = x.view(b, hp, ps, wp, ps, c).permute(0, 1, 3, 5, 2, 4)
        img = img.reshape(b, n_img, c * ps * ps)
    img = F.linear(img, p["x_embedder.proj.weight"].reshape(hid, -1),
                   p.get("x_embedder.proj.bias"))

    txt = context
    if "text_proj.weight" in p:
        txt = _lin(p, "text_proj", txt)
    hseq = torch.cat([img, txt], dim=1)

    sample = _sin_cos_embedding(timesteps, hid)
    cvec = _lin(p, "time_embedding.linear_1", sample)
    cvec = _lin(p, "time_embedding.linear_2", F.silu(cvec))

    mods = _lin(p, "adaLN_modulation.1", F.silu(cvec))[:, None]
    sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = mods.chunk(6, dim=-1)

    cos, sin = _rope_tables(hp, wp, txt.shape[1], cfg)
    for i in range(cfg.num_layers):
        pre = f"layers.{i}"
        res = hseq
        hn = _rms(hseq, p[f"{pre}.adaLN_sa_ln.weight"], cfg.eps)
        hn = hn * (1.0 + sc_msa) + sh_msa
        s = hn.shape[1]
        q = _lin(p, f"{pre}.self_attention.to_q", hn).view(b, s, nh, hd)
        k = _lin(p, f"{pre}.self_attention.to_k", hn).view(b, s, nh, hd)
        v = _lin(p, f"{pre}.self_attention.to_v", hn).view(b, s, nh, hd)
        q = _rms(q, p[f"{pre}.self_attention.norm_q.weight"], cfg.eps)
        k = _rms(k, p[f"{pre}.self_attention.norm_k.weight"], cfg.eps)
        q = _apply_rotary(q, cos, sin).permute(0, 2, 1, 3)
        k = _apply_rotary(k, cos, sin).permute(0, 2, 1, 3)
        v = v.permute(0, 2, 1, 3).float()
        o = F.scaled_dot_product_attention(q, k, v)
        o = o.permute(0, 2, 1, 3).reshape(b, s, hid)
        hseq = res + _lin(p, f"{pre}.self_attention.to_out.0", o) * g_msa
        res = hseq
        hn = _rms(hseq, p[f"{pre}.adaLN_mlp_ln.weight"], cfg.eps)
        hn = hn * (1.0 + sc_mlp) + sh_mlp
        gate = F.gelu(_lin(p, f"{pre}.mlp.gate_proj", hn), approximate="tanh")
        up = _lin(p, f"{pre}.mlp.up_proj", hn)
        hseq = res + _lin(p, f"{pre}.mlp.linear_fc2", up * gate) * g_mlp

    fm = _lin(p, "final_norm.linear", cvec)[:, None]
    scale, shift = fm.chunk(2, dim=-1)
    out = F.layer_norm(hseq, (hid,), eps=cfg.eps)
    out = out * (1.0 + scale) + shift
    out = _lin(p, "final_linear", out)

    patches = out[:, :n_img]
    patches = patches.view(b, hp, wp, cfg.out_channels, ps, ps)
    patches = patches.permute(0, 1, 4, 2, 5, 3).reshape(
        b, hp * ps, wp * ps, cfg.out_channels)
    return patches

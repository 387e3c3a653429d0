"""Test-only torch Krea2 reference (transcribed from the reference C++ math,
src/model/diffusion/krea2.hpp: KreaRMSNorm :164, KreaAttention sigmoid gate
:211, shared 6-way modulation bias :594, text fusion :361, final modulation
:316, rope gen_krea2_pe :677).  Consumes the same checkpoint-named param
dict as sdtpu.models.krea2."""
import numpy as np
import torch
import torch.nn.functional as F

from .flux import apply_rope, rope_rot, timestep_embedding


def _lin(p, name, x):
    return F.linear(x, p[f"{name}.weight"], p.get(f"{name}.bias"))


def _krea_rms(p, name, x, eps=1e-5):
    v = x.float()
    v = v * torch.rsqrt(v.pow(2).mean(-1, keepdim=True) + eps)
    return v * (p[name].float() + 1.0)


def _krea_attn(p, pre, x, rot, heads, kv_heads, head_dim, eps):
    b, l, _ = x.shape
    q = _lin(p, f"{pre}.wq", x).view(b, l, heads, head_dim)
    k = _lin(p, f"{pre}.wk", x).view(b, l, kv_heads, head_dim)
    v = _lin(p, f"{pre}.wv", x).view(b, l, kv_heads, head_dim)
    q = _krea_rms(p, f"{pre}.qknorm.qnorm.scale", q, eps).permute(0, 2, 1, 3)
    k = _krea_rms(p, f"{pre}.qknorm.knorm.scale", k, eps).permute(0, 2, 1, 3)
    v = v.permute(0, 2, 1, 3).float()
    if rot is not None:
        q = apply_rope(q, rot)
        k = apply_rope(k, rot)
    if kv_heads != heads:
        k = k.repeat_interleave(heads // kv_heads, dim=1)
        v = v.repeat_interleave(heads // kv_heads, dim=1)
    o = F.scaled_dot_product_attention(q, k, v)
    o = o.permute(0, 2, 1, 3).reshape(b, l, heads * head_dim)
    gate = torch.sigmoid(_lin(p, f"{pre}.gate", x).float())
    return _lin(p, f"{pre}.wo", o * gate)


def _krea_mlp(p, pre, x):
    return _lin(p, f"{pre}.down",
                F.silu(_lin(p, f"{pre}.gate", x)) * _lin(p, f"{pre}.up", x))


def _fusion_block(p, pre, x, heads, kv_heads, head_dim, eps):
    h = _krea_rms(p, f"{pre}.prenorm.scale", x, eps)
    x = x + _krea_attn(p, f"{pre}.attn", h, None, heads, kv_heads, head_dim, eps)
    h = _krea_rms(p, f"{pre}.postnorm.scale", x, eps)
    return x + _krea_mlp(p, f"{pre}.mlp", h)


def _text_fusion(p, context, cfg):
    b, l, _ = context.shape
    thd = cfg.text_dim // cfg.text_heads
    x = context.reshape(b * l, cfg.text_layers, cfg.text_dim)
    for i in range(2):
        x = _fusion_block(p, f"txtfusion.layerwise_blocks.{i}", x,
                          cfg.text_heads, cfg.text_kv_heads, thd, cfg.norm_eps)
    x = torch.einsum("nld,kl->nkd", x, p["txtfusion.projector.weight"].float())
    x = x.reshape(b, l, cfg.text_dim)
    for i in range(2):
        x = _fusion_block(p, f"txtfusion.refiner_blocks.{i}", x,
                          cfg.text_heads, cfg.text_kv_heads, thd, cfg.norm_eps)
    return x


def krea2_forward_torch(p, x, timesteps, context, cfg):
    b, hh, ww, c = x.shape
    ps = cfg.patch_size
    pad_h, pad_w = (-hh) % ps, (-ww) % ps
    if pad_h or pad_w:
        x = F.pad(x, (0, 0, 0, pad_w, 0, pad_h))
    hp, wp = (hh + pad_h) // ps, (ww + pad_w) // ps

    img = x.view(b, hp, ps, wp, ps, c).permute(0, 1, 3, 5, 2, 4)
    img = img.reshape(b, hp * wp, c * ps * ps)
    img = _lin(p, "first", img)

    t_emb = timestep_embedding(timesteps * 1000.0, cfg.timestep_dim)
    t = _lin(p, "tmlp.0", t_emb)
    t = _lin(p, "tmlp.2", F.gelu(t, approximate="tanh"))
    tvec = _lin(p, "tproj.1", F.gelu(t, approximate="tanh"))

    txt = _text_fusion(p, context, cfg)
    txt = _krea_rms(p, "txtmlp.0.scale", txt, cfg.norm_eps)
    txt = _lin(p, "txtmlp.1", txt)
    txt = _lin(p, "txtmlp.3", F.gelu(txt, approximate="tanh"))
    n_txt = txt.shape[1]

    h = torch.cat([txt, img], dim=1)
    ids = np.zeros((n_txt + hp * wp, 3), dtype=np.float64)
    ii, jj = np.meshgrid(np.arange(hp), np.arange(wp), indexing="ij")
    ids[n_txt:, 1] = ii.reshape(-1)
    ids[n_txt:, 2] = jj.reshape(-1)
    rot = rope_rot(ids, cfg.axes_dim, cfg.theta)

    hd = cfg.head_dim
    for i in range(cfg.layers):
        pre = f"blocks.{i}"
        mods = tvec + p[f"{pre}.mod.lin"][None].float()
        m = mods[:, None].chunk(6, dim=-1)
        a_in = _krea_rms(p, f"{pre}.prenorm.scale", h, cfg.norm_eps)
        a_in = a_in * (1.0 + m[0]) + m[1]
        a = _krea_attn(p, f"{pre}.attn", a_in, rot, cfg.heads, cfg.kv_heads,
                       hd, cfg.norm_eps)
        h = h + a * m[2]
        m_in = _krea_rms(p, f"{pre}.postnorm.scale", h, cfg.norm_eps)
        m_in = m_in * (1.0 + m[3]) + m[4]
        h = h + _krea_mlp(p, f"{pre}.mlp", m_in) * m[5]

    out = h[:, n_txt:]
    fm = p["last.modulation.lin"][None].float() + t[:, None]
    out = _krea_rms(p, "last.norm.scale", out, cfg.norm_eps)
    out = out * (1.0 + fm[:, 0:1]) + fm[:, 1:2]
    out = _lin(p, "last.linear", out)
    out = out.view(b, hp, wp, cfg.out_channels, ps, ps)
    out = out.permute(0, 1, 4, 2, 5, 3).reshape(
        b, hp * ps, wp * ps, cfg.out_channels)
    if pad_h or pad_w:
        out = out[:, :hh, :ww]
    return out

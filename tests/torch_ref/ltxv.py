"""Test-only torch LTXV reference (video path), transcribed from the
reference C++ math: CrossAttention ltxv.hpp:636, AdaLayerNormSingle :570,
BasicAVTransformerBlock :1096 (video half), output head :1680.

RoPE cos/sin tables come from sdtpu.models.ltxv.video_rope — they are
host-side numpy constants shared by both implementations (like the AYS/GITS
tables); the oracle independently re-derives everything downstream of them.
Consumes the same checkpoint-named param dict as sdtpu.models.ltxv."""
import math

import torch
import torch.nn.functional as F

from .flux import timestep_embedding


def _lin(p, name, x):
    return F.linear(x, p[f"{name}.weight"], p.get(f"{name}.bias"))


def _rms(x, w=None, eps=1e-6):
    v = x.float()
    out = v * torch.rsqrt(v.pow(2).mean(-1, keepdim=True) + eps)
    if w is not None:
        out = out * w.float()
    return out


def _apply_rope(x, cos, sin, heads, interleaved=False):
    b, l, inner = x.shape
    dh = inner // heads
    xf = x.float().reshape(b, l, heads, dh)
    cos = torch.from_numpy(cos)[None] if not torch.is_tensor(cos) else cos[None]
    sin = torch.from_numpy(sin)[None] if not torch.is_tensor(sin) else sin[None]
    if interleaved:
        x0, x1 = xf[..., 0::2], xf[..., 1::2]
        o0 = x0 * cos - x1 * sin
        o1 = x0 * sin + x1 * cos
        out = torch.stack([o0, o1], dim=-1).reshape(b, l, heads, dh)
    else:
        x0, x1 = xf[..., : dh // 2], xf[..., dh // 2 :]
        o0 = x0 * cos - x1 * sin
        o1 = x0 * sin + x1 * cos
        out = torch.cat([o0, o1], dim=-1)
    return out.reshape(b, l, inner)


def _attention(p, pre, x, context, heads, head_dim, pe=None, interleaved=False):
    ctx = x if context is None else context
    b, l, _ = x.shape
    q = _lin(p, f"{pre}.to_q", x)
    k = _lin(p, f"{pre}.to_k", ctx)
    v = _lin(p, f"{pre}.to_v", ctx)
    q = _rms(q, p[f"{pre}.q_norm.weight"], eps=1e-5)
    k = _rms(k, p[f"{pre}.k_norm.weight"], eps=1e-5)
    if pe is not None:
        q = _apply_rope(q, pe[0], pe[1], heads, interleaved)
        k = _apply_rope(k, pe[0], pe[1], heads, interleaved)
    lk = k.shape[1]
    qh = q.view(b, l, heads, head_dim).permute(0, 2, 1, 3)
    kh = k.view(b, lk, heads, head_dim).permute(0, 2, 1, 3)
    vh = v.view(b, lk, heads, head_dim).permute(0, 2, 1, 3).float()
    o = F.scaled_dot_product_attention(qh, kh, vh)
    o = o.permute(0, 2, 1, 3).reshape(b, l, heads * head_dim)
    return _lin(p, f"{pre}.to_out.0", o)


def _ff(p, pre, x):
    return _lin(p, f"{pre}.net.2", F.gelu(_lin(p, f"{pre}.net.0.proj", x), approximate="tanh"))


def _adaln_single(p, pre, t):
    b, lm = t.shape
    emb = timestep_embedding(t.reshape(-1), 256)
    emb = _lin(p, f"{pre}.emb.timestep_embedder.linear_1", emb)
    emb = _lin(p, f"{pre}.emb.timestep_embedder.linear_2", F.silu(emb)).view(b, lm, -1)
    return _lin(p, f"{pre}.linear", F.silu(emb)), emb


def _ada(table, t_mod, dim, coeff):
    b, lm, _ = t_mod.shape
    return t_mod.view(b, lm, coeff, dim) + table[None, None]


def ltxv_video_forward_torch(p, x, timesteps, context, cfg, v_pe):
    """x: [B,T,H,W,C] video latent; video-only (audio absent), no caption
    projection / connector.  Returns [B,T,H,W,out]."""
    b, t, hh, ww, c = x.shape
    lv = t * hh * ww
    vd = cfg.hidden_size
    vh, vhd = cfg.num_heads, cfg.head_dim

    vx = _lin(p, "patchify_proj", x.reshape(b, lv, c))

    if timesteps.dim() == 1:
        timesteps = timesteps[:, None]
    v_t_mod, v_emb = _adaln_single(p, "adaln_single", timesteps * cfg.timestep_scale)

    pe = (torch.from_numpy(v_pe[0]), torch.from_numpy(v_pe[1]))
    for i in range(cfg.num_layers):
        pre = f"transformer_blocks.{i}"
        v_mods = _ada(p[f"{pre}.scale_shift_table"], v_t_mod, vd, 6)
        vn = _rms(vx)
        vn = vn * (1 + v_mods[:, :, 1]) + v_mods[:, :, 0]
        sa = _attention(p, f"{pre}.attn1", vn, None, vh, vhd, pe=pe,
                        interleaved=cfg.video_rope_interleaved)
        vx = vx + sa * v_mods[:, :, 2]
        vx = vx + _attention(p, f"{pre}.attn2", _rms(vx), context, vh, vhd)
        vfn = _rms(vx)
        vfn = vfn * (1 + v_mods[:, :, 4]) + v_mods[:, :, 3]
        vx = vx + _ff(p, f"{pre}.ff", vfn) * v_mods[:, :, 5]

    v_ss = v_emb[:, :, None] + p["scale_shift_table"][None, None]
    vx = F.layer_norm(vx, (vd,), eps=1e-6)
    vx = vx * (1 + v_ss[:, :, 1]) + v_ss[:, :, 0]
    vx = _lin(p, "proj_out", vx)
    return vx.reshape(b, t, hh, ww, -1)

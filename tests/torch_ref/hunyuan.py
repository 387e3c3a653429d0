"""Test-only torch HunyuanVideo reference (transcribed from the reference
C++ math, src/model/diffusion/hunyuan.hpp: TokenRefiner :102, double blocks
:284-400 (FLUX-style), meanflow time_r :433, final layer + unpatchify).
Consumes the same checkpoint-named param dict as sdtpu.models.hunyuan."""
import numpy as np
import torch
import torch.nn.functional as F

from .flux import apply_rope, rope_rot, timestep_embedding


def _lin(p, name, x):
    return F.linear(x, p[f"{name}.weight"], p.get(f"{name}.bias"))


def _mlp_embed(p, pre, x):
    return _lin(p, f"{pre}.out_layer", F.silu(_lin(p, f"{pre}.in_layer", x)))


def _rms(x, w, eps=1e-6):
    v = x.float()
    return v * torch.rsqrt(v.pow(2).mean(-1, keepdim=True) + eps) * w.float()


def _mod(p, pre, vec, n):
    return _lin(p, f"{pre}.lin", F.silu(vec)).chunk(n, dim=-1)


def _qkv_norm(p, pre, x, nh):
    b, l, c = x.shape
    d = c // nh
    q, k, v = _lin(p, f"{pre}.qkv", x).chunk(3, dim=-1)
    q = q.view(b, l, nh, d).permute(0, 2, 1, 3)
    k = k.view(b, l, nh, d).permute(0, 2, 1, 3)
    v = v.view(b, l, nh, d).permute(0, 2, 1, 3)
    q = _rms(q, p[f"{pre}.norm.query_norm.scale"])
    k = _rms(k, p[f"{pre}.norm.key_norm.scale"])
    return q, k, v


def _token_refiner(p, txt, timesteps, cfg):
    hid = cfg.hidden_size
    vec = _mlp_embed(p, "txt_in.t_embedder", timestep_embedding(timesteps, 256))
    vec = vec + _mlp_embed(p, "txt_in.c_embedder", txt.mean(dim=1))
    h = _lin(p, "txt_in.input_embedder", txt)
    b, l, _ = h.shape
    nh = cfg.num_heads
    d = hid // nh
    for i in range(cfg.refiner_depth):
        pre = f"txt_in.individual_token_refiner.blocks.{i}"
        mods = _lin(p, f"{pre}.adaLN_modulation.1", F.silu(vec))
        g_attn, g_mlp = mods.chunk(2, dim=-1)
        hn = F.layer_norm(h, (hid,), p[f"{pre}.norm1.weight"],
                          p[f"{pre}.norm1.bias"], eps=1e-6)
        q, k, v = _lin(p, f"{pre}.self_attn.qkv", hn).chunk(3, dim=-1)
        q = q.view(b, l, nh, d).permute(0, 2, 1, 3).float()
        k = k.view(b, l, nh, d).permute(0, 2, 1, 3).float()
        v = v.view(b, l, nh, d).permute(0, 2, 1, 3).float()
        o = F.scaled_dot_product_attention(q, k, v)
        o = _lin(p, f"{pre}.self_attn.proj", o.permute(0, 2, 1, 3).reshape(b, l, hid))
        h = h + o * g_attn[:, None]
        hn = F.layer_norm(h, (hid,), p[f"{pre}.norm2.weight"],
                          p[f"{pre}.norm2.bias"], eps=1e-6)
        m = _lin(p, f"{pre}.mlp.2", F.silu(_lin(p, f"{pre}.mlp.0", hn)))
        h = h + m * g_mlp[:, None]
    return h, vec


def hunyuan_forward_torch(p, x, timesteps, context, cfg, timestep_r=None):
    b, t, hh, ww, c = x.shape
    pt, ph, pw = cfg.patch_size
    hid = cfg.hidden_size
    assert t % pt == 0 and hh % ph == 0 and ww % pw == 0
    tl, hl, wl = t // pt, hh // ph, ww // pw

    img = x.view(b, tl, pt, hl, ph, wl, pw, c)
    img = img.permute(0, 1, 3, 5, 7, 2, 4, 6).reshape(
        b, tl * hl * wl, c * pt * ph * pw)
    img = F.linear(img, p["img_in.proj.weight"].reshape(hid, -1),
                   p["img_in.proj.bias"])

    txt, _ = _token_refiner(p, context, timesteps, cfg)
    l_txt = txt.shape[1]

    vec = _mlp_embed(p, "time_in", timestep_embedding(timesteps, 256))
    if cfg.use_meanflow and timestep_r is not None:
        vec = vec + _mlp_embed(p, "time_r_in", timestep_embedding(timestep_r, 256))
        if not cfg.use_meanflow_sum:
            vec = vec * 0.5

    ids = np.zeros((l_txt + tl * hl * wl, 3), dtype=np.int64)
    ti, hi, wi = np.meshgrid(np.arange(tl), np.arange(hl), np.arange(wl), indexing="ij")
    ids[l_txt:, 0] = ti.reshape(-1)
    ids[l_txt:, 1] = hi.reshape(-1)
    ids[l_txt:, 2] = wi.reshape(-1)
    rot = rope_rot(ids, cfg.axes_dim, cfg.theta)

    nh = cfg.num_heads
    for i in range(cfg.depth):
        pre = f"double_blocks.{i}"
        im = _mod(p, f"{pre}.img_mod", vec, 6)
        tm = _mod(p, f"{pre}.txt_mod", vec, 6)
        img_n = F.layer_norm(img, (hid,), eps=1e-6) * (1 + im[1][:, None]) + im[0][:, None]
        txt_n = F.layer_norm(txt, (hid,), eps=1e-6) * (1 + tm[1][:, None]) + tm[0][:, None]
        iq, ik, iv = _qkv_norm(p, f"{pre}.img_attn", img_n, nh)
        tq, tk, tv = _qkv_norm(p, f"{pre}.txt_attn", txt_n, nh)
        q = apply_rope(torch.cat([tq, iq], dim=2), rot)
        k = apply_rope(torch.cat([tk, ik], dim=2), rot)
        v = torch.cat([tv, iv], dim=2).float()
        att = F.scaled_dot_product_attention(q, k, v)
        att = att.permute(0, 2, 1, 3).reshape(b, -1, hid)
        txt_att, img_att = att[:, :l_txt], att[:, l_txt:]
        img = img + im[2][:, None] * _lin(p, f"{pre}.img_attn.proj", img_att)
        img_m = F.layer_norm(img, (hid,), eps=1e-6) * (1 + im[4][:, None]) + im[3][:, None]
        img = img + im[5][:, None] * _lin(
            p, f"{pre}.img_mlp.2",
            F.gelu(_lin(p, f"{pre}.img_mlp.0", img_m), approximate="tanh"))
        txt = txt + tm[2][:, None] * _lin(p, f"{pre}.txt_attn.proj", txt_att)
        txt_m = F.layer_norm(txt, (hid,), eps=1e-6) * (1 + tm[4][:, None]) + tm[3][:, None]
        txt = txt + tm[5][:, None] * _lin(
            p, f"{pre}.txt_mlp.2",
            F.gelu(_lin(p, f"{pre}.txt_mlp.0", txt_m), approximate="tanh"))

    mf = _lin(p, "final_layer.adaLN_modulation.1", F.silu(vec))
    shift, scale = mf.chunk(2, dim=-1)
    img = F.layer_norm(img, (hid,), eps=1e-6) * (1 + scale[:, None]) + shift[:, None]
    img = _lin(p, "final_layer.linear", img)
    out = img.view(b, tl, hl, wl, cfg.out_channels, pt, ph, pw)
    return out.permute(0, 1, 5, 2, 6, 3, 7, 4).reshape(
        b, t, hh, ww, cfg.out_channels)

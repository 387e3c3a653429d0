"""Test-only torch Z-Image reference (transcribed from the reference C++
math, src/model/diffusion/z_image.hpp: JointAttention :122, block :255,
final layer :338, negated velocity :543; rope gen_z_image_ids
src/model/common/rope.hpp:896).  Consumes the same checkpoint-named param
dict as sdtpu.models.z_image."""
import numpy as np
import torch
import torch.nn.functional as F

from .flux import rope_rot, timestep_embedding

SEQ_MULTI_OF = 32


def _bound_mod(n, m):
    return (m - n % m) % m


def _lin(p, name, x):
    return F.linear(x, p[f"{name}.weight"], p.get(f"{name}.bias"))


def _rms(x, w=None, eps=1e-5):
    v = x.float()
    out = v * torch.rsqrt(v.pow(2).mean(-1, keepdim=True) + eps)
    if w is not None:
        out = out * w.float()
    return out


def _apply_rope(x, rot):
    b, h, l, d = x.shape
    xf = x.float().reshape(b, h, l, d // 2, 2)
    x0, x1 = xf[..., 0], xf[..., 1]
    o0 = rot[None, None, :, :, 0, 0] * x0 + rot[None, None, :, :, 0, 1] * x1
    o1 = rot[None, None, :, :, 1, 0] * x0 + rot[None, None, :, :, 1, 1] * x1
    return torch.stack([o0, o1], dim=-1).reshape(b, h, l, d)


def _attn(p, pre, x, rot, cfg):
    b, l, _ = x.shape
    nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    qkv = _lin(p, f"{pre}.qkv", x).view(b, l, nh + 2 * nkv, hd)
    q, k, v = qkv[:, :, :nh], qkv[:, :, nh:nh + nkv], qkv[:, :, nh + nkv:]
    if f"{pre}.q_norm.weight" in p:
        q = _rms(q, p[f"{pre}.q_norm.weight"], eps=1e-6)
        k = _rms(k, p[f"{pre}.k_norm.weight"], eps=1e-6)
    q = _apply_rope(q.permute(0, 2, 1, 3), rot)
    k = _apply_rope(k.permute(0, 2, 1, 3), rot)
    v = v.permute(0, 2, 1, 3).float()
    if nkv != nh:
        k = k.repeat_interleave(nh // nkv, dim=1)
        v = v.repeat_interleave(nh // nkv, dim=1)
    o = F.scaled_dot_product_attention(q, k, v)
    o = o.permute(0, 2, 1, 3).reshape(b, l, nh * hd)
    return _lin(p, f"{pre}.out", o)


def _ffn(p, pre, x):
    return _lin(p, f"{pre}.w2", F.silu(_lin(p, f"{pre}.w1", x)) * _lin(p, f"{pre}.w3", x))


def _block(p, pre, x, rot, t_emb, cfg):
    if f"{pre}.adaLN_modulation.0.weight" in p:
        mods = _lin(p, f"{pre}.adaLN_modulation.0", t_emb)[:, None]
        s_msa, g_msa, s_mlp, g_mlp = mods.chunk(4, dim=-1)
        h = _rms(x, p[f"{pre}.attention_norm1.weight"], eps=cfg.norm_eps)
        h = h * (1.0 + s_msa)
        h = _attn(p, f"{pre}.attention", h, rot, cfg)
        h = _rms(h, p[f"{pre}.attention_norm2.weight"], eps=cfg.norm_eps)
        x = x + h * torch.tanh(g_msa)
        h = _rms(x, p[f"{pre}.ffn_norm1.weight"], eps=cfg.norm_eps)
        h = h * (1.0 + s_mlp)
        h = _ffn(p, f"{pre}.feed_forward", h)
        h = _rms(h, p[f"{pre}.ffn_norm2.weight"], eps=cfg.norm_eps)
        return x + h * torch.tanh(g_mlp)
    h = _rms(x, p[f"{pre}.attention_norm1.weight"], eps=cfg.norm_eps)
    h = _attn(p, f"{pre}.attention", h, rot, cfg)
    h = _rms(h, p[f"{pre}.attention_norm2.weight"], eps=cfg.norm_eps)
    x = x + h
    h = _rms(x, p[f"{pre}.ffn_norm1.weight"], eps=cfg.norm_eps)
    h = _ffn(p, f"{pre}.feed_forward", h)
    h = _rms(h, p[f"{pre}.ffn_norm2.weight"], eps=cfg.norm_eps)
    return x + h


def z_image_forward_torch(p, x, timesteps, context, cfg):
    b, h, w, c = x.shape
    ps = cfg.patch_size
    assert h % ps == 0 and w % ps == 0
    hp, wp = h // ps, w // ps

    img = x.view(b, hp, ps, wp, ps, c).permute(0, 1, 3, 2, 4, 5)
    img = img.reshape(b, hp * wp, ps * ps * c)
    img = _lin(p, "x_embedder", img)
    n_img_main = hp * wp

    t_emb = timestep_embedding(timesteps, 256)
    t_emb = _lin(p, "t_embedder.mlp.0", t_emb)
    t_emb = _lin(p, "t_embedder.mlp.2", F.silu(t_emb))

    txt = _rms(context, p["cap_embedder.0.weight"], eps=cfg.norm_eps)
    txt = _lin(p, "cap_embedder.1", txt)

    n_txt = txt.shape[1]
    n_img = img.shape[1]
    n_txt_pad = _bound_mod(n_txt, SEQ_MULTI_OF)
    if n_txt_pad:
        pad = p["cap_pad_token"].expand(b, n_txt_pad, cfg.hidden_size)
        txt = torch.cat([txt, pad], dim=1)
    n_img_pad = _bound_mod(n_img, SEQ_MULTI_OF)
    if n_img_pad:
        pad = p["x_pad_token"].expand(b, n_img_pad, cfg.hidden_size)
        img = torch.cat([img, pad], dim=1)

    n_txt_tot = txt.shape[1]
    ids = np.zeros((n_txt_tot + img.shape[1], 3), dtype=np.int64)
    ids[:n_txt_tot, 0] = np.arange(1, n_txt_tot + 1)
    ii, jj = np.meshgrid(np.arange(hp), np.arange(wp), indexing="ij")
    ids[n_txt_tot:n_txt_tot + n_img, 0] = n_txt_tot + 1
    ids[n_txt_tot:n_txt_tot + n_img, 1] = ii.reshape(-1)
    ids[n_txt_tot:n_txt_tot + n_img, 2] = jj.reshape(-1)
    rot = rope_rot(ids, cfg.axes_dim, cfg.theta)
    txt_rot, img_rot = rot[:n_txt_tot], rot[n_txt_tot:]

    for i in range(cfg.num_refiner_layers):
        txt = _block(p, f"context_refiner.{i}", txt, txt_rot, None, cfg)
    for i in range(cfg.num_refiner_layers):
        img = _block(p, f"noise_refiner.{i}", img, img_rot, t_emb, cfg)

    hseq = torch.cat([txt, img], dim=1)
    for i in range(cfg.num_layers):
        hseq = _block(p, f"layers.{i}", hseq, rot, t_emb, cfg)

    scale = _lin(p, "final_layer.adaLN_modulation.1", F.silu(t_emb))
    out = F.layer_norm(hseq, (cfg.hidden_size,), eps=1e-6)
    out = out * (1.0 + scale[:, None])
    out = _lin(p, "final_layer.linear", out)

    img_out = out[:, n_txt_tot:n_txt_tot + n_img_main]
    img_out = img_out.view(b, hp, wp, ps, ps, cfg.out_channels)
    img_out = img_out.permute(0, 1, 3, 2, 4, 5).reshape(
        b, h, w, cfg.out_channels)
    return -img_out

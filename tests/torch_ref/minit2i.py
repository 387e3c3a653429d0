"""Test-only torch MiniT2I reference (transcribed from the reference C++
math, src/model/diffusion/minit2i.hpp: sincos pos embed :124, vision rope
:153, MMJiT forward :421, unpatchify :458).  Consumes the same
checkpoint-named param dict as sdtpu.models.minit2i."""
import numpy as np
import torch
import torch.nn.functional as F


def _lin(p, name, x):
    return F.linear(x, p[f"{name}.weight"], p.get(f"{name}.bias"))


def _rms(x, w, eps=1e-6):
    v = x.float()
    return v * torch.rsqrt(v.pow(2).mean(-1, keepdim=True) + eps) * w.float()


def _sincos_pos_embed_2d(grid, dim):
    half = dim // 2
    quarter = half // 2
    omega = 1.0 / (10000.0 ** (np.arange(quarter, dtype=np.float64) / quarter))
    y, x = np.meshgrid(np.arange(grid), np.arange(grid), indexing="ij")
    ax = x.reshape(-1, 1) * omega[None]
    ay = y.reshape(-1, 1) * omega[None]
    return torch.from_numpy(np.concatenate(
        [np.sin(ax), np.cos(ax), np.sin(ay), np.cos(ay)],
        axis=1).astype(np.float32))


def _text_rope(length, head_dim):
    half = head_dim // 2
    omega = 1.0 / (10000.0 ** (np.arange(half, dtype=np.float64) * 2 / head_dim))
    ang = np.arange(length, dtype=np.float64)[:, None] * omega[None]
    return (torch.from_numpy(np.cos(ang).astype(np.float32)),
            torch.from_numpy(np.sin(ang).astype(np.float32)))


def _vision_rope(side, head_dim):
    dim = head_dim // 2
    quarter = dim // 2
    freqs = 1.0 / (10000.0 ** (2 * np.arange(quarter, dtype=np.float64) / dim))
    y, x = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
    ay = y.reshape(-1, 1) * freqs[None]
    ax = x.reshape(-1, 1) * freqs[None]
    ang = np.concatenate([ay, ax], axis=1)
    return (torch.from_numpy(np.cos(ang).astype(np.float32)),
            torch.from_numpy(np.sin(ang).astype(np.float32)))


def _rope_halves(x, cos, sin):
    d = x.shape[-1]
    half = d // 2
    xf = x.float()
    x1, x2 = xf[..., :half], xf[..., half:]
    o1 = x1 * cos[None, None] - x2 * sin[None, None]
    o2 = x1 * sin[None, None] + x2 * cos[None, None]
    return torch.cat([o1, o2], dim=-1)


def _swiglu(p, pre, x):
    return _lin(p, f"{pre}.w2",
                F.silu(_lin(p, f"{pre}.w1", x)) * _lin(p, f"{pre}.w3", x))


def _split_heads(x, nh, hd):
    b, l, _ = x.shape
    return x.view(b, l, nh, hd).permute(0, 2, 1, 3)


def minit2i_forward_torch(p, x, timesteps, context, mask, cfg):
    b, hh, ww, c = x.shape
    ps = cfg.patch_size
    hp, wp = hh // ps, ww // ps
    nh, hd = cfg.num_heads, cfg.head_dim

    if mask is not None:
        mt = p["mask_token"].reshape(1, 1, -1).float()
        m = mask[..., None].float()
        context = context * m + mt * (1.0 - m)

    xp = x.view(b, hp, ps, wp, ps, c).permute(0, 1, 3, 5, 2, 4)
    xp = xp.reshape(b, hp * wp, c * ps * ps)
    w1 = p["img_embedder.proj1.weight"].reshape(cfg.pca_channels, -1)
    img = F.linear(xp, w1)
    img = F.linear(img, p["img_embedder.proj2.weight"].reshape(
        cfg.hidden_size, -1), p.get("img_embedder.proj2.bias"))
    img = img + _sincos_pos_embed_2d(hp, cfg.hidden_size)[None]

    txt = _lin(p, "txt_embedder", context)
    lt = txt.shape[1]
    tcos, tsin = _text_rope(lt, hd)
    vcos, vsin = _vision_rope(hp, hd)
    jcos = torch.cat([tcos, vcos], dim=0)
    jsin = torch.cat([tsin, vsin], dim=0)

    for i in range(cfg.txt_preamble_depth):
        pre = f"txt_preamble_blocks.{i}"
        h = _rms(txt, p[f"{pre}.norm1.weight"])
        q, k, v = _lin(p, f"{pre}.qkv", h).chunk(3, dim=-1)
        q = _rms(_split_heads(q, nh, hd), p[f"{pre}.q_norm.weight"])
        k = _rms(_split_heads(k, nh, hd), p[f"{pre}.k_norm.weight"])
        q = _rope_halves(q, tcos, tsin)
        k = _rope_halves(k, tcos, tsin)
        o = F.scaled_dot_product_attention(q, k, _split_heads(v, nh, hd).float())
        o = o.permute(0, 2, 1, 3).reshape(b, lt, nh * hd)
        txt = txt + _lin(p, f"{pre}.attn_proj", o)
        txt = txt + _swiglu(p, f"{pre}.mlp", _rms(txt, p[f"{pre}.norm2.weight"]))

    for i in range(cfg.depth_double):
        pre = f"double_blocks.{i}"
        hi = _rms(img, p[f"{pre}.img_norm1.weight"])
        ht = _rms(txt, p[f"{pre}.txt_norm1.weight"])
        iq, ik, iv = [_split_heads(t, nh, hd)
                      for t in _lin(p, f"{pre}.img_qkv", hi).chunk(3, dim=-1)]
        tq, tk, tv = [_split_heads(t, nh, hd)
                      for t in _lin(p, f"{pre}.txt_qkv", ht).chunk(3, dim=-1)]
        q = torch.cat([_rms(tq, p[f"{pre}.q_norm.weight"]),
                       _rms(iq, p[f"{pre}.q_norm.weight"])], dim=2)
        k = torch.cat([_rms(tk, p[f"{pre}.k_norm.weight"]),
                       _rms(ik, p[f"{pre}.k_norm.weight"])], dim=2)
        v = torch.cat([tv, iv], dim=2).float()
        q = _rope_halves(q, jcos, jsin)
        k = _rope_halves(k, jcos, jsin)
        o = F.scaled_dot_product_attention(q, k, v).permute(0, 2, 1, 3)
        o = o.reshape(b, lt + hp * wp, nh * hd)
        txt = txt + _lin(p, f"{pre}.txt_attn_proj", o[:, :lt])
        img = img + _lin(p, f"{pre}.img_attn_proj", o[:, lt:])
        img = img + _swiglu(p, f"{pre}.img_mlp",
                            _rms(img, p[f"{pre}.img_norm2.weight"]))
        txt = txt + _swiglu(p, f"{pre}.txt_mlp",
                            _rms(txt, p[f"{pre}.txt_norm2.weight"]))

    combined = torch.cat([txt, img], dim=1)
    out = _rms(combined, p["final_layer.norm_final.weight"])
    out = _lin(p, "final_layer.linear", out)
    out = out[:, lt:]
    out = out.view(b, hp, wp, ps, ps, cfg.in_channels)
    out = out.permute(0, 1, 3, 2, 4, 5).reshape(b, hh, ww, cfg.in_channels)
    return out

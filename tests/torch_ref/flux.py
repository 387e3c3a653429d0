"""Test-only torch FLUX reference (transcribed from the reference C++ math,
src/model/diffusion/flux.hpp: double blocks :408-520, single blocks :522-600,
embeds :660-700, final layer :700-730).  Consumes the same checkpoint-named
param dict as sdtpu.models.flux."""
import math

import numpy as np
import torch
import torch.nn.functional as F


def timestep_embedding(t, dim, max_period=10000):
    half = dim // 2
    freqs = torch.exp(
        -math.log(max_period) * torch.arange(half, dtype=torch.float64) / half
    ).to(torch.float32)
    args = t[:, None].float() * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


def rope_rot(ids: np.ndarray, axes_dim, theta):
    outs = []
    for a, dim in enumerate(axes_dim):
        pos = ids[:, a].astype(np.float64)
        scale = np.arange(0, dim, 2, dtype=np.float64) / dim
        omega = 1.0 / (theta**scale)
        out = pos[:, None] * omega[None, :]
        cos, sin = np.cos(out), np.sin(out)
        rot = np.stack(
            [np.stack([cos, -sin], axis=-1), np.stack([sin, cos], axis=-1)], axis=-2
        )
        outs.append(rot)
    return torch.from_numpy(np.concatenate(outs, axis=1).astype(np.float32))


def apply_rope(x, rot):
    b, h, l, d = x.shape
    xf = x.float().reshape(b, h, l, d // 2, 2)
    x0, x1 = xf[..., 0], xf[..., 1]
    o0 = rot[None, None, :, :, 0, 0] * x0 + rot[None, None, :, :, 0, 1] * x1
    o1 = rot[None, None, :, :, 1, 0] * x0 + rot[None, None, :, :, 1, 1] * x1
    return torch.stack([o0, o1], dim=-1).reshape(b, h, l, d)


def _lin(p, name, x):
    w = p[f"{name}.weight"]
    b = p.get(f"{name}.bias")
    return F.linear(x, w, b)


def _mlp_embed(p, pre, x):
    return _lin(p, f"{pre}.out_layer", F.silu(_lin(p, f"{pre}.in_layer", x)))


def _rms(x, w, eps=1e-6):
    v = x.float()
    out = v * torch.rsqrt(v.pow(2).mean(-1, keepdim=True) + eps)
    return out * w.float()


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


def _attn(q, k, v):
    return F.scaled_dot_product_attention(q.float(), k.float(), v.float())


def flux_forward_torch(p, x, timesteps, context, y, guidance, cfg):
    """x: [B,H,W,C] numpy-layout latent; returns [B,H,W,C] velocity."""
    b, h, w, c = x.shape
    ps = cfg.patch_size
    hidden = cfg.hidden_size
    nh = cfg.num_heads
    hp, wp = h // ps, w // ps

    img = (
        x.view(b, hp, ps, wp, ps, c).permute(0, 1, 3, 2, 4, 5)
        .reshape(b, hp * wp, ps * ps * c)
    )
    img = _lin(p, "img_in", img)
    txt = _lin(p, "txt_in", context)
    l_txt = txt.shape[1]

    t_emb = timestep_embedding(timesteps * 1000.0, 256)
    vec = _mlp_embed(p, "time_in", t_emb)
    if cfg.guidance_embed and guidance is not None:
        vec = vec + _mlp_embed(p, "guidance_in", timestep_embedding(guidance * 1000.0, 256))
    if cfg.vec_in_dim > 0 and y is not None:
        vec = vec + _mlp_embed(p, "vector_in", y)

    ids = np.zeros((l_txt + hp * wp, len(cfg.axes_dim)), dtype=np.int64)
    ii, jj = np.meshgrid(np.arange(hp), np.arange(wp), indexing="ij")
    ids[l_txt:, 1] = ii.reshape(-1)
    ids[l_txt:, 2] = jj.reshape(-1)
    rot = rope_rot(ids, cfg.axes_dim, cfg.theta)

    for i in range(cfg.depth):
        pre = f"double_blocks.{i}"
        img_mods = _mod(p, f"{pre}.img_mod", vec, 6)
        txt_mods = _mod(p, f"{pre}.txt_mod", vec, 6)
        img_n = F.layer_norm(img, (hidden,), eps=1e-6) * (1 + img_mods[1][:, None]) + img_mods[0][:, None]
        txt_n = F.layer_norm(txt, (hidden,), eps=1e-6) * (1 + txt_mods[1][:, None]) + txt_mods[0][:, None]
        iq, ik, iv = _qkv_norm(p, f"{pre}.img_attn", img_n, nh)
        tq, tk, tv = _qkv_norm(p, f"{pre}.txt_attn", txt_n, nh)
        q = apply_rope(torch.cat([tq, iq], dim=2), rot)
        k = apply_rope(torch.cat([tk, ik], dim=2), rot)
        v = torch.cat([tv, iv], dim=2)
        att = _attn(q, k, v).permute(0, 2, 1, 3).reshape(b, -1, hidden)
        txt_att, img_att = att[:, :l_txt], att[:, l_txt:]
        img = img + img_mods[2][:, None] * _lin(p, f"{pre}.img_attn.proj", img_att)
        img_m = F.layer_norm(img, (hidden,), eps=1e-6) * (1 + img_mods[4][:, None]) + img_mods[3][:, None]
        img = img + img_mods[5][:, None] * _lin(
            p, f"{pre}.img_mlp.2",
            F.gelu(_lin(p, f"{pre}.img_mlp.0", img_m), approximate="tanh"),
        )
        txt = txt + txt_mods[2][:, None] * _lin(p, f"{pre}.txt_attn.proj", txt_att)
        txt_m = F.layer_norm(txt, (hidden,), eps=1e-6) * (1 + txt_mods[4][:, None]) + txt_mods[3][:, None]
        txt = txt + txt_mods[5][:, None] * _lin(
            p, f"{pre}.txt_mlp.2",
            F.gelu(_lin(p, f"{pre}.txt_mlp.0", txt_m), approximate="tanh"),
        )

    xx = torch.cat([txt, img], dim=1)
    d_head = hidden // nh
    for i in range(cfg.depth_single):
        pre = f"single_blocks.{i}"
        mods = _mod(p, f"{pre}.modulation", vec, 3)
        xn = F.layer_norm(xx, (hidden,), eps=1e-6) * (1 + mods[1][:, None]) + mods[0][:, None]
        h1 = _lin(p, f"{pre}.linear1", xn)
        qkv, mlp = h1[..., : 3 * hidden], h1[..., 3 * hidden :]
        q, k, v = qkv.chunk(3, dim=-1)
        L = xx.shape[1]
        q = q.view(b, L, nh, d_head).permute(0, 2, 1, 3)
        k = k.view(b, L, nh, d_head).permute(0, 2, 1, 3)
        v = v.view(b, L, nh, d_head).permute(0, 2, 1, 3)
        q = apply_rope(_rms(q, p[f"{pre}.norm.query_norm.scale"]), rot)
        k = apply_rope(_rms(k, p[f"{pre}.norm.key_norm.scale"]), rot)
        att = _attn(q, k, v).permute(0, 2, 1, 3).reshape(b, L, hidden)
        out = _lin(
            p, f"{pre}.linear2",
            torch.cat([att, F.gelu(mlp, approximate="tanh")], dim=-1),
        )
        xx = xx + mods[2][:, None] * out

    img = xx[:, l_txt:]
    mf = _lin(p, "final_layer.adaLN_modulation.1", F.silu(vec))
    shift, scale = mf.chunk(2, dim=-1)
    img = F.layer_norm(img, (hidden,), eps=1e-6) * (1 + scale[:, None]) + shift[:, None]
    img = _lin(p, "final_layer.linear", img)
    img = (
        img.view(b, hp, wp, ps, ps, c).permute(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)
    )
    return img


CHROMA_APPROX_DEPTH = 5


def _chroma_mod_vectors(p, timesteps, guidance, cfg):
    """ChromaApproximator distilled modulation table (reference
    flux.hpp:759,1029-1049)."""
    n_mod = 3 * cfg.depth_single + 12 * cfg.depth + 2
    b = timesteps.shape[0]
    dt = timestep_embedding(timesteps * 1000.0, 16)
    g = guidance if guidance is not None else torch.zeros_like(timesteps)
    dg = timestep_embedding(g * 1000.0, 16)
    idx = timestep_embedding(torch.arange(n_mod, dtype=torch.float32) * 1000.0, 32)
    tg = torch.cat([dt, dg], dim=-1)
    x = torch.cat(
        [tg[:, None, :].expand(b, n_mod, 32), idx[None].expand(b, n_mod, 32)],
        dim=-1,
    )
    pre = "distilled_guidance_layer"
    h = _lin(p, f"{pre}.in_proj", x)
    for i in range(CHROMA_APPROX_DEPTH):
        hn = _rms(h, p[f"{pre}.norms.{i}.scale"])
        h = h + _mlp_embed(p, f"{pre}.layers.{i}", hn)
    return _lin(p, f"{pre}.out_proj", h)


def chroma_forward_torch(p, x, timesteps, context, y, guidance, cfg):
    """Chroma: distilled modulation table replaces time/vector embeds; y is
    the T5 token mask (0 / -inf) padded over the img tokens (reference
    flux.hpp:1029-1053)."""
    b, h, w, c = x.shape
    ps = cfg.patch_size
    hidden = cfg.hidden_size
    nh = cfg.num_heads
    hp, wp = h // ps, w // ps

    img = (
        x.view(b, hp, ps, wp, ps, c).permute(0, 1, 3, 2, 4, 5)
        .reshape(b, hp * wp, ps * ps * c)
    )
    img = _lin(p, "img_in", img)
    txt = _lin(p, "txt_in", context)
    l_txt = txt.shape[1]

    modt = _chroma_mod_vectors(p, timesteps, guidance, cfg)
    attn_mask = None
    if y is not None:
        pad = torch.zeros((b, img.shape[1]), dtype=y.dtype)
        attn_mask = torch.cat([y, pad], dim=1)[:, None, None, :].float()

    ids = np.zeros((l_txt + hp * wp, len(cfg.axes_dim)), dtype=np.int64)
    ii, jj = np.meshgrid(np.arange(hp), np.arange(wp), indexing="ij")
    ids[l_txt:, 1] = ii.reshape(-1)
    ids[l_txt:, 2] = jj.reshape(-1)
    rot = rope_rot(ids, cfg.axes_dim, cfg.theta)

    ns, nd = cfg.depth_single, cfg.depth

    def mods_at(base, n):
        return [modt[:, base + j] for j in range(n)]

    for i in range(cfg.depth):
        pre = f"double_blocks.{i}"
        im = mods_at(6 * i + 3 * ns, 6)
        tm = mods_at(6 * i + 6 * nd + 3 * ns, 6)
        img_n = F.layer_norm(img, (hidden,), eps=1e-6) * (1 + im[1][:, None]) + im[0][:, None]
        txt_n = F.layer_norm(txt, (hidden,), eps=1e-6) * (1 + tm[1][:, None]) + tm[0][:, None]
        iq, ik, iv = _qkv_norm(p, f"{pre}.img_attn", img_n, nh)
        tq, tk, tv = _qkv_norm(p, f"{pre}.txt_attn", txt_n, nh)
        q = apply_rope(torch.cat([tq, iq], dim=2), rot)
        k = apply_rope(torch.cat([tk, ik], dim=2), rot)
        v = torch.cat([tv, iv], dim=2).float()
        att = F.scaled_dot_product_attention(q, k, v, attn_mask=attn_mask)
        att = att.permute(0, 2, 1, 3).reshape(b, -1, hidden)
        txt_att, img_att = att[:, :l_txt], att[:, l_txt:]
        img = img + im[2][:, None] * _lin(p, f"{pre}.img_attn.proj", img_att)
        img_m = F.layer_norm(img, (hidden,), eps=1e-6) * (1 + im[4][:, None]) + im[3][:, None]
        img = img + im[5][:, None] * _lin(
            p, f"{pre}.img_mlp.2",
            F.gelu(_lin(p, f"{pre}.img_mlp.0", img_m), approximate="tanh"))
        txt = txt + tm[2][:, None] * _lin(p, f"{pre}.txt_attn.proj", txt_att)
        txt_m = F.layer_norm(txt, (hidden,), eps=1e-6) * (1 + tm[4][:, None]) + tm[3][:, None]
        txt = txt + tm[5][:, None] * _lin(
            p, f"{pre}.txt_mlp.2",
            F.gelu(_lin(p, f"{pre}.txt_mlp.0", txt_m), approximate="tanh"))

    xx = torch.cat([txt, img], dim=1)
    d_head = hidden // nh
    for i in range(cfg.depth_single):
        pre = f"single_blocks.{i}"
        mods = mods_at(3 * i, 3)
        xn = F.layer_norm(xx, (hidden,), eps=1e-6) * (1 + mods[1][:, None]) + mods[0][:, None]
        h1 = _lin(p, f"{pre}.linear1", xn)
        qkv, mlp = h1[..., : 3 * hidden], h1[..., 3 * hidden :]
        q, k, v = qkv.chunk(3, dim=-1)
        L = xx.shape[1]
        q = q.view(b, L, nh, d_head).permute(0, 2, 1, 3)
        k = k.view(b, L, nh, d_head).permute(0, 2, 1, 3)
        v = v.view(b, L, nh, d_head).permute(0, 2, 1, 3).float()
        q = apply_rope(_rms(q, p[f"{pre}.norm.query_norm.scale"]), rot)
        k = apply_rope(_rms(k, p[f"{pre}.norm.key_norm.scale"]), rot)
        att = F.scaled_dot_product_attention(q, k, v, attn_mask=attn_mask)
        att = att.permute(0, 2, 1, 3).reshape(b, L, hidden)
        out = _lin(
            p, f"{pre}.linear2",
            torch.cat([att, F.gelu(mlp, approximate="tanh")], dim=-1))
        xx = xx + mods[2][:, None] * out

    img = xx[:, l_txt:]
    shift, scale = modt[:, -2], modt[:, -1]
    img = F.layer_norm(img, (hidden,), eps=1e-6) * (1 + scale[:, None]) + shift[:, None]
    img = _lin(p, "final_layer.linear", img)
    img = (
        img.view(b, hp, wp, ps, ps, c).permute(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)
    )
    return img

"""Test-only torch PiD (PixelDiT) reference (transcribed from the reference
C++ math, src/model/diffusion/pid.hpp: MMDiTBlockT2I :366, PiTBlock :451,
SigmaAwareGate :520, LQProjection2D :573, forward :726-816; rope
rope.hpp:55/:297-350; pixel abs pos pid.hpp:144-173).  Consumes the same
checkpoint-named param dict as sdtpu.models.pid."""
import numpy as np
import torch
import torch.nn.functional as F

from sdtpu.models.pid import pid_pixel_abs_pos, pid_rope_2d, pid_rope_txt


def _lin(p, name, x):
    return F.linear(x, p[f"{name}.weight"], p.get(f"{name}.bias"))


def _rms(x, w, eps=1e-6):
    v = x.float()
    return v * torch.rsqrt(v.pow(2).mean(-1, keepdim=True) + eps) * w.float()


def _timestep_embedding(t, dim, max_period):
    import math

    half = dim // 2
    freqs = torch.exp(
        -math.log(max_period) * torch.arange(half, dtype=torch.float64) / half
    ).to(torch.float32)
    args = t[:, None].float() * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


def _apply_rope_interleaved(x, rot):
    b, nh, l, d = x.shape
    rot = torch.from_numpy(np.asarray(rot))
    xp = x.float().reshape(b, nh, l, d // 2, 1, 2)
    out = (rot[None, None, :, :, 0] * xp[..., 0]
           + rot[None, None, :, :, 1] * xp[..., 1])
    return out.reshape(b, nh, l, d)


def _adaln(x, shift, scale):
    return x + x * scale + shift


def _ff(p, pre, x):
    h = F.silu(_lin(p, f"{pre}.w1", x)) * _lin(p, f"{pre}.w3", x)
    return _lin(p, f"{pre}.w2", h)


def _qkv_heads(p, pre, x, heads, suffix=""):
    b, l, d = x.shape
    hd = d // heads
    q, k, v = _lin(p, f"{pre}.qkv{suffix}", x).chunk(3, dim=-1)
    q = q.view(b, l, heads, hd).permute(0, 2, 1, 3)
    k = k.view(b, l, heads, hd).permute(0, 2, 1, 3)
    v = v.view(b, l, heads, hd).permute(0, 2, 1, 3)
    sx = suffix.replace("_", "")
    sx = f"_{sx}" if sx else ""
    q = _rms(q, p[f"{pre}.q_norm{sx}.weight"])
    k = _rms(k, p[f"{pre}.k_norm{sx}.weight"])
    return q, k, v


def _patch_block(p, pre, x, y, cond, rot_img, rot_txt, cfg):
    heads = cfg.num_groups
    mx = _lin(p, f"{pre}.adaLN_modulation_img.0", cond)[:, None].chunk(6, -1)
    my = _lin(p, f"{pre}.adaLN_modulation_txt.0", cond)[:, None].chunk(6, -1)
    xn = _adaln(_rms(x, p[f"{pre}.norm_x1.weight"]), mx[0], mx[1])
    yn = _adaln(_rms(y, p[f"{pre}.norm_y1.weight"]), my[0], my[1])
    qx, kx, vx = _qkv_heads(p, f"{pre}.attn", xn, heads, "_x")
    qy, ky, vy = _qkv_heads(p, f"{pre}.attn", yn, heads, "_y")
    qx = _apply_rope_interleaved(qx, rot_img)
    kx = _apply_rope_interleaved(kx, rot_img)
    qy = _apply_rope_interleaved(qy, rot_txt)
    ky = _apply_rope_interleaved(ky, rot_txt)
    l_txt = y.shape[1]
    q = torch.cat([qy, qx], dim=2)
    k = torch.cat([ky, kx], dim=2)
    v = torch.cat([vy, vx], dim=2).float()
    o = F.scaled_dot_product_attention(q, k, v)
    o = o.permute(0, 2, 1, 3).reshape(x.shape[0], -1, x.shape[-1])
    oy, ox = o[:, :l_txt], o[:, l_txt:]
    x = x + _lin(p, f"{pre}.attn.proj_x", ox) * mx[2]
    y = y + _lin(p, f"{pre}.attn.proj_y", oy) * my[2]
    xm = _adaln(_rms(x, p[f"{pre}.norm_x2.weight"]), mx[3], mx[4])
    ym = _adaln(_rms(y, p[f"{pre}.norm_y2.weight"]), my[3], my[4])
    x = x + _ff(p, f"{pre}.mlp_x", xm) * mx[5]
    y = y + _ff(p, f"{pre}.mlp_y", ym) * my[5]
    return x, y


def _sigma_gate(p, pre, x, lq, sigma):
    logit = _lin(p, f"{pre}.content_proj", torch.cat([x, lq], dim=-1))
    offset = torch.exp(p[f"{pre}.log_alpha"]) * sigma[:, None, None]
    return x + lq * torch.sigmoid(logit - offset)


def _lq_conv(p, name, x, replicate):
    xt = x.permute(0, 3, 1, 2)
    if replicate:
        xt = F.pad(xt, (1, 1, 1, 1), mode="replicate")
        pad = 0
    else:
        pad = 1
    y = F.conv2d(xt, p[f"{name}.weight"], p[f"{name}.bias"], padding=pad)
    return y.permute(0, 2, 3, 1)


def _gn(p, name, x, groups=4):
    y = F.group_norm(x.permute(0, 3, 1, 2), groups, p[f"{name}.weight"],
                     p[f"{name}.bias"], eps=1e-5)
    return y.permute(0, 2, 3, 1)


def _lq_resblock(p, pre, x, replicate):
    h = F.silu(_gn(p, f"{pre}.block.0", x))
    h = _lq_conv(p, f"{pre}.block.2", h, replicate)
    h = F.silu(_gn(p, f"{pre}.block.3", h))
    h = _lq_conv(p, f"{pre}.block.5", h, replicate)
    return x + h


def _lq_projection(p, lq, hs, ws, cfg):
    uf = cfg.lq_latent_unpatchify_factor
    if uf > 1:
        b, hl, wl, cl = lq.shape
        lq = (lq.view(b, hl, wl, cl // (uf * uf), uf, uf)
              .permute(0, 1, 4, 2, 5, 3)
              .reshape(b, hl * uf, wl * uf, cl // (uf * uf)))
    b = lq.shape[0]
    assert lq.shape[1] == hs and lq.shape[2] == ws, "oracle avoids resize"
    rep = cfg.lq_replicate_padding
    feat = F.silu(_lq_conv(p, "lq_proj.latent_proj.0", lq, rep))
    feat = _lq_conv(p, "lq_proj.latent_proj.2", feat, rep)
    for i in range(cfg.lq_num_res_blocks):
        feat = _lq_resblock(p, f"lq_proj.latent_proj.{3 + i}", feat, rep)
    tokens = feat.reshape(b, hs * ws, cfg.lq_hidden_dim)
    n_out = (cfg.patch_depth + cfg.lq_interval - 1) // cfg.lq_interval
    outs = [_lin(p, f"lq_proj.output_heads.{i}", tokens)
            for i in range(n_out)]
    pit = None
    if cfg.pit_lq_inject:
        pit = _lin(p, "lq_proj.pit_head", tokens)
    return outs, pit


def _pixel_block(p, pre, pix, s_cond, rot_comp, cfg):
    pd = cfg.pixel_hidden_size
    ps = cfg.patch_size
    p2 = ps * ps
    bl = pix.shape[0]
    ada = _lin(p, f"{pre}.adaLN_modulation.0", s_cond).view(bl, p2, 6 * pd)
    mod = ada.chunk(6, dim=-1)
    xn = _adaln(_rms(pix, p[f"{pre}.norm1.weight"]), mod[0], mod[1])
    comp = _lin(p, f"{pre}.compress_to_attn", xn.reshape(bl, p2 * pd))
    L = rot_comp.shape[0]
    b = bl // L
    comp = comp.view(b, L, cfg.pixel_attn_hidden_size)
    q, k, v = _qkv_heads(p, f"{pre}.attn", comp, cfg.pixel_num_groups)
    q = _apply_rope_interleaved(q, rot_comp)
    k = _apply_rope_interleaved(k, rot_comp)
    o = F.scaled_dot_product_attention(q, k, v.float())
    o = o.permute(0, 2, 1, 3).reshape(bl, cfg.pixel_attn_hidden_size)
    o = _lin(p, f"{pre}.attn.proj", o)
    exp = _lin(p, f"{pre}.expand_from_attn", o).view(bl, p2, pd)
    pix = pix + exp * mod[2]
    xm = _adaln(_rms(pix, p[f"{pre}.norm2.weight"]), mod[3], mod[4])
    h = F.gelu(_lin(p, f"{pre}.mlp.fc1", xm), approximate="tanh")
    h = _lin(p, f"{pre}.mlp.fc2", h)
    return pix + h * mod[5]


def pid_forward_torch(p, x, timesteps, context, lq_latent, cfg,
                      degrade_sigma=None):
    b, h, w, c = x.shape
    ps = cfg.patch_size
    pad_h, pad_w = (-h) % ps, (-w) % ps
    if pad_h or pad_w:
        x = F.pad(x, (0, 0, 0, pad_w, 0, pad_h))
    hh, ww = h + pad_h, w + pad_w
    hs, ws = hh // ps, ww // ps
    L = hs * ws
    p2 = ps * ps
    if degrade_sigma is None:
        degrade_sigma = torch.zeros(b)

    xp = (x.view(b, hs, ps, ws, ps, c).permute(0, 1, 3, 5, 2, 4)
          .reshape(b, L, c * p2))
    s = _lin(p, "s_embedder.proj", xp)

    t_emb = _timestep_embedding(timesteps, 256, max_period=10)
    t_emb = _lin(p, "t_embedder.mlp.0", t_emb)
    t_emb = _lin(p, "t_embedder.mlp.2", F.silu(t_emb))
    cond = F.silu(t_emb)

    l_txt = min(context.shape[1], cfg.txt_max_length)
    y = context[:, :l_txt]
    y = _lin(p, "y_embedder.proj", y)
    y = _rms(y, p["y_embedder.norm.weight"])
    y = y + p["y_pos_embedding"][:, :l_txt]

    lq_feats, pit_feat = _lq_projection(p, lq_latent, hs, ws, cfg)

    hd = cfg.hidden_size // cfg.num_groups
    rot_img = pid_rope_2d(hs, ws, hd, 10000.0, 16.0,
                          cfg.rope_ref_grid_h, cfg.rope_ref_grid_w)
    rot_txt = pid_rope_txt(l_txt, hd, cfg.text_rope_theta)

    for i in range(cfg.patch_depth):
        if i % cfg.lq_interval == 0:
            oi = i // cfg.lq_interval
            if oi < len(lq_feats):
                s = _sigma_gate(p, f"lq_proj.gate_modules.{oi}", s,
                                lq_feats[oi], degrade_sigma)
        s, y = _patch_block(p, f"patch_blocks.{i}", s, y, cond,
                            rot_img, rot_txt, cfg)
    s = F.silu(s + t_emb[:, None])
    if cfg.pit_lq_inject and pit_feat is not None:
        s = _sigma_gate(p, "pit_lq_gate", s, pit_feat, degrade_sigma)

    pd = cfg.pixel_hidden_size
    pix = x.reshape(b, hh * ww, c)
    pix = _lin(p, "pixel_embedder.proj", pix)
    pix = pix + torch.from_numpy(pid_pixel_abs_pos(hh, ww, pd))[None]
    pix = (pix.view(b, hs, ps, ws, ps, pd).permute(0, 1, 3, 2, 4, 5)
           .reshape(b * L, p2, pd))

    s_cond = s.reshape(b * L, cfg.hidden_size)
    phd = cfg.pixel_attn_hidden_size // cfg.pixel_num_groups
    rot_comp = pid_rope_2d(hs, ws, phd, 10000.0, 16.0,
                           cfg.rope_ref_grid_h, cfg.rope_ref_grid_w)
    for i in range(cfg.pixel_depth):
        pix = _pixel_block(p, f"pixel_blocks.{i}", pix, s_cond, rot_comp, cfg)

    pix = _rms(pix, p["final_layer.norm.weight"])
    pix = _lin(p, "final_layer.linear", pix)
    out = (pix.view(b, hs, ws, ps, ps, c).permute(0, 1, 3, 2, 4, 5)
           .reshape(b, hh, ww, c))
    return out[:, :h, :w]

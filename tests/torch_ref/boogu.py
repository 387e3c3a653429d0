"""Test-only torch Boogu-Image reference (transcribed from the reference C++
math, src/model/diffusion/boogu.hpp: Attention :235, RMSNormZero :166,
transformer block :286, joint attention :349, double-stream block :426,
LayerNormContinuous :214, rope :718, inverted timestep :633, negated
velocity :694).  Consumes the same checkpoint-named param dict as
sdtpu.models.boogu."""
import numpy as np
import torch
import torch.nn.functional as F

from .flux import apply_rope, rope_rot, timestep_embedding


def _lin(p, name, x):
    return F.linear(x, p[f"{name}.weight"], p.get(f"{name}.bias"))


def _rms(x, w, eps):
    v = x.float()
    return v * torch.rsqrt(v.pow(2).mean(-1, keepdim=True) + eps) * w.float()


def _rope(hp, wp, n_txt, cfg, ref_sizes=()):
    blocks = [np.stack([np.arange(n_txt)] * 3, axis=1).astype(np.float64)]
    shift = n_txt
    for rh, rw in ref_sizes:
        ii, jj = np.meshgrid(np.arange(rh), np.arange(rw), indexing="ij")
        ids = np.zeros((rh * rw, 3))
        ids[:, 0] = shift
        ids[:, 1] = ii.reshape(-1)
        ids[:, 2] = jj.reshape(-1)
        blocks.append(ids)
        shift += max(rh, rw)
    ii, jj = np.meshgrid(np.arange(hp), np.arange(wp), indexing="ij")
    ids = np.zeros((hp * wp, 3))
    ids[:, 0] = shift
    ids[:, 1] = ii.reshape(-1)
    ids[:, 2] = jj.reshape(-1)
    blocks.append(ids)
    return rope_rot(np.concatenate(blocks, axis=0), cfg.axes_dim, cfg.theta)


def _gqa(q, k, v, rot, nh, nkv):
    if rot is not None:
        q = apply_rope(q, rot)
        k = apply_rope(k, rot)
    if nkv != nh:
        k = k.repeat_interleave(nh // nkv, dim=1)
        v = v.repeat_interleave(nh // nkv, dim=1)
    return F.scaled_dot_product_attention(q.float(), k.float(), v.float())


def _attn(p, pre, x, rot, cfg):
    b, l, _ = x.shape
    nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    q = _lin(p, f"{pre}.to_q", x).view(b, l, nh, hd)
    k = _lin(p, f"{pre}.to_k", x).view(b, l, nkv, hd)
    v = _lin(p, f"{pre}.to_v", x).view(b, l, nkv, hd)
    q = _rms(q, p[f"{pre}.norm_q.weight"], 1e-5).permute(0, 2, 1, 3)
    k = _rms(k, p[f"{pre}.norm_k.weight"], 1e-5).permute(0, 2, 1, 3)
    v = v.permute(0, 2, 1, 3)
    o = _gqa(q, k, v, rot, nh, nkv).permute(0, 2, 1, 3).reshape(b, l, nh * hd)
    return _lin(p, f"{pre}.to_out.0", o)


def _ff(p, pre, x):
    return _lin(p, f"{pre}.linear_2",
                F.silu(_lin(p, f"{pre}.linear_1", x))
                * _lin(p, f"{pre}.linear_3", x))


def _norm_zero(p, pre, x, temb, cfg):
    emb = _lin(p, f"{pre}.linear", F.silu(temb))
    sc_msa, g_msa, sc_mlp, g_mlp = emb[:, None].chunk(4, dim=-1)
    h = _rms(x, p[f"{pre}.norm.weight"], cfg.norm_eps)
    return h * (1.0 + sc_msa), g_msa, sc_mlp, g_mlp


def _block(p, pre, x, rot, temb, cfg):
    if f"{pre}.norm1.linear.weight" in p:
        h, g_msa, sc_mlp, g_mlp = _norm_zero(p, f"{pre}.norm1", x, temb, cfg)
        a = _attn(p, f"{pre}.attn", h, rot, cfg)
        a = _rms(a, p[f"{pre}.norm2.weight"], cfg.norm_eps)
        x = x + a * torch.tanh(g_msa)
        m = _rms(x, p[f"{pre}.ffn_norm1.weight"], cfg.norm_eps)
        m = m * (1.0 + sc_mlp)
        m = _ff(p, f"{pre}.feed_forward", m)
        m = _rms(m, p[f"{pre}.ffn_norm2.weight"], cfg.norm_eps)
        return x + m * torch.tanh(g_mlp)
    h = _rms(x, p[f"{pre}.norm1.weight"], cfg.norm_eps)
    a = _attn(p, f"{pre}.attn", h, rot, cfg)
    x = x + _rms(a, p[f"{pre}.norm2.weight"], cfg.norm_eps)
    m = _ff(p, f"{pre}.feed_forward",
            _rms(x, p[f"{pre}.ffn_norm1.weight"], cfg.norm_eps))
    return x + _rms(m, p[f"{pre}.ffn_norm2.weight"], cfg.norm_eps)


def _joint_attn(p, pre, img, txt, rot, cfg):
    b, li, _ = img.shape
    lt = txt.shape[1]
    nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    def proj(x, name, n, l):
        return _lin(p, f"{pre}.processor.{name}", x).view(
            b, l, n, hd).permute(0, 2, 1, 3)

    iq = proj(img, "img_to_q", nh, li)
    ik = proj(img, "img_to_k", nkv, li)
    iv = proj(img, "img_to_v", nkv, li)
    tq = proj(txt, "instruct_to_q", nh, lt)
    tk = proj(txt, "instruct_to_k", nkv, lt)
    tv = proj(txt, "instruct_to_v", nkv, lt)
    q = _rms(torch.cat([tq, iq], dim=2), p[f"{pre}.norm_q.weight"], 1e-5)
    k = _rms(torch.cat([tk, ik], dim=2), p[f"{pre}.norm_k.weight"], 1e-5)
    v = torch.cat([tv, iv], dim=2)
    o = _gqa(q, k, v, rot, nh, nkv).permute(0, 2, 1, 3)
    o = o.reshape(b, lt + li, nh * hd)
    t_o = _lin(p, f"{pre}.processor.instruct_out", o[:, :lt])
    i_o = _lin(p, f"{pre}.processor.img_out", o[:, lt:])
    return _lin(p, f"{pre}.to_out.0", torch.cat([t_o, i_o], dim=1))


def _double_block(p, pre, img, txt, joint_rot, img_rot, temb, cfg):
    lt = txt.shape[1]
    in1, ig_msa, isc_mlp, ig_mlp = _norm_zero(p, f"{pre}.img_norm1", img, temb, cfg)
    in2, ish_mlp, _, _ = _norm_zero(p, f"{pre}.img_norm2", img, temb, cfg)
    in3, ig_self, _, _ = _norm_zero(p, f"{pre}.img_norm3", img, temb, cfg)
    tn1, tg_msa, tsc_mlp, tg_mlp = _norm_zero(p, f"{pre}.instruct_norm1", txt,
                                              temb, cfg)
    tn2, tsh_mlp, _, _ = _norm_zero(p, f"{pre}.instruct_norm2", txt, temb, cfg)

    joint = _joint_attn(p, f"{pre}.img_instruct_attn", in1, tn1, joint_rot, cfg)
    t_attn, i_attn = joint[:, :lt], joint[:, lt:]
    i_self = _attn(p, f"{pre}.img_self_attn", in3, img_rot, cfg)

    img = img + _rms(i_attn, p[f"{pre}.img_attn_norm.weight"],
                     cfg.norm_eps) * torch.tanh(ig_msa)
    img = img + _rms(i_self, p[f"{pre}.img_self_attn_norm.weight"],
                     cfg.norm_eps) * torch.tanh(ig_self)
    m = in2 * (1.0 + isc_mlp) + ish_mlp
    m = _ff(p, f"{pre}.img_feed_forward",
            _rms(m, p[f"{pre}.img_ffn_norm1.weight"], cfg.norm_eps))
    img = img + _rms(m, p[f"{pre}.img_ffn_norm2.weight"],
                     cfg.norm_eps) * torch.tanh(ig_mlp)

    txt = txt + _rms(t_attn, p[f"{pre}.instruct_attn_norm.weight"],
                     cfg.norm_eps) * torch.tanh(tg_msa)
    m = tn2 * (1.0 + tsc_mlp) + tsh_mlp
    m = _ff(p, f"{pre}.instruct_feed_forward",
            _rms(m, p[f"{pre}.instruct_ffn_norm1.weight"], cfg.norm_eps))
    txt = txt + _rms(m, p[f"{pre}.instruct_ffn_norm2.weight"],
                     cfg.norm_eps) * torch.tanh(tg_mlp)
    return img, txt


def boogu_forward_torch(p, x, timesteps, context, cfg, ref_latents=()):
    b, hh, ww, c = x.shape
    ps = cfg.patch_size
    pad_h, pad_w = (-hh) % ps, (-ww) % ps
    if pad_h or pad_w:
        x = F.pad(x, (0, 0, 0, pad_w, 0, pad_h))
    hp, wp = (hh + pad_h) // ps, (ww + pad_w) // ps

    def patchify(z):
        zb, zh, zw, zc = z.shape
        zp = z.view(zb, zh // ps, ps, zw // ps, ps, zc)
        zp = zp.permute(0, 1, 3, 2, 4, 5)
        return zp.reshape(zb, (zh // ps) * (zw // ps), ps * ps * zc)

    img = _lin(p, "x_embedder", patchify(x))
    n_img = img.shape[1]

    t_inv = 1.0 - timesteps.float()
    t_proj = timestep_embedding(t_inv * cfg.timestep_scale, 256)
    temb = _lin(p, "time_caption_embed.timestep_embedder.linear_1", t_proj)
    temb = _lin(p, "time_caption_embed.timestep_embedder.linear_2",
                F.silu(temb))

    txt = _rms(context, p["time_caption_embed.caption_embedder.0.weight"],
               cfg.norm_eps)
    txt = _lin(p, "time_caption_embed.caption_embedder.1", txt)
    n_txt = txt.shape[1]

    ref_img = None
    ref_sizes = []
    for i, ref in enumerate(ref_latents):
        rp = _lin(p, "ref_image_patch_embedder", patchify(ref))
        rp = rp + p["image_index_embedding"][min(i, 4)][None, None].float()
        ref_img = rp if ref_img is None else torch.cat([ref_img, rp], dim=1)
        ref_sizes.append((ref.shape[1] // ps, ref.shape[2] // ps))
    n_ref = 0 if ref_img is None else ref_img.shape[1]

    rot = _rope(hp, wp, n_txt, cfg, ref_sizes)
    txt_rot = rot[:n_txt]
    noise_rot = rot[n_txt + n_ref:]

    for i in range(cfg.num_refiner_layers):
        txt = _block(p, f"context_refiner.{i}", txt, txt_rot, None, cfg)
    for i in range(cfg.num_refiner_layers):
        img = _block(p, f"noise_refiner.{i}", img, noise_rot, temb, cfg)

    combined = img
    if ref_img is not None:
        ref_rot = rot[n_txt: n_txt + n_ref]
        for i in range(cfg.num_refiner_layers):
            ref_img = _block(p, f"ref_image_refiner.{i}", ref_img, ref_rot,
                             temb, cfg)
        combined = torch.cat([ref_img, img], dim=1)

    img_rot = rot[n_txt: n_txt + combined.shape[1]]
    for i in range(cfg.num_double_stream_layers):
        combined, txt = _double_block(p, f"double_stream_layers.{i}", combined,
                                      txt, rot, img_rot, temb, cfg)

    hseq = torch.cat([txt, combined], dim=1)
    for i in range(cfg.num_layers):
        hseq = _block(p, f"single_stream_layers.{i}", hseq, rot, temb, cfg)

    emb = _lin(p, "norm_out.linear_1", F.silu(temb))
    out = F.layer_norm(hseq, (cfg.hidden_size,), eps=1e-6)
    out = out * (1.0 + emb[:, None])
    out = _lin(p, "norm_out.linear_2", out)
    out = out[:, out.shape[1] - n_img:]

    out = out.view(b, hp, wp, ps, ps, cfg.out_channels)
    out = out.permute(0, 1, 3, 2, 4, 5).reshape(b, hp * ps, wp * ps,
                                                cfg.out_channels)
    if pad_h or pad_w:
        out = out[:, :hh, :ww]
    return -out

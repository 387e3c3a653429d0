"""Test-only torch Lens reference (transcribed from the reference C++ math,
src/model/diffusion/lens.hpp: LensJointAttention :112, block :198, final
AdaLN-continuous :258, per-layer txt RMS :323, rope gen_lens_ids
rope.hpp:694).  Consumes the same checkpoint-named param dict as
sdtpu.models.lens."""
import numpy as np
import torch
import torch.nn.functional as F

from .flux import apply_rope, rope_rot, timestep_embedding


def _lin(p, name, x):
    return F.linear(x, p[f"{name}.weight"], p.get(f"{name}.bias"))


def _rms(x, w, eps):
    v = x.float()
    return v * torch.rsqrt(v.pow(2).mean(-1, keepdim=True) + eps) * w.float()


def _rope(hl, wl, n_txt, cfg):
    ids = np.zeros((hl * wl + n_txt, 3), dtype=np.float64)
    rows = np.arange(hl, dtype=np.float64) - hl // 2
    cols = np.arange(wl, dtype=np.float64) - wl // 2
    ii, jj = np.meshgrid(rows, cols, indexing="ij")
    ids[: hl * wl, 1] = ii.reshape(-1)
    ids[: hl * wl, 2] = jj.reshape(-1)
    start = max(hl // 2, wl // 2)
    txt = np.linspace(start, n_txt + start, n_txt) if n_txt > 1 else \
        np.full((n_txt,), float(start))
    ids[hl * wl:, 0] = txt
    ids[hl * wl:, 1] = txt
    ids[hl * wl:, 2] = txt
    return rope_rot(ids, cfg.axes_dim, cfg.theta)


def _gate_mlp(p, pre, x):
    return _lin(p, f"{pre}.w2", F.silu(_lin(p, f"{pre}.w1", x)) * _lin(p, f"{pre}.w3", x))


def lens_forward_torch(p, x, timesteps, context, cfg):
    b, hl, wl, c = x.shape
    inner = cfg.num_heads * cfg.head_dim
    nh, hd = cfg.num_heads, cfg.head_dim

    img = _lin(p, "img_in", x.reshape(b, hl * wl, c))
    t_emb = _lin(p, "time_text_embed.timestep_embedder.linear_1",
                 timestep_embedding(timesteps * 1000.0, 256))
    t_emb = _lin(p, "time_text_embed.timestep_embedder.linear_2", F.silu(t_emb))

    chunks = context.chunk(cfg.selected_layer_count, dim=-1)
    txt = torch.cat(
        [_rms(ck, p[f"txt_norm.{i}.weight"], 1e-5) for i, ck in enumerate(chunks)],
        dim=-1)
    txt = _lin(p, "txt_in", txt)
    lt = txt.shape[1]
    li = hl * wl

    rot = _rope(hl, wl, lt, cfg)
    for i in range(cfg.num_layers):
        pre = f"transformer_blocks.{i}"
        temb = F.silu(t_emb)
        im = _lin(p, f"{pre}.img_mod.1", temb)[:, None].chunk(6, dim=-1)
        tm = _lin(p, f"{pre}.txt_mod.1", temb)[:, None].chunk(6, dim=-1)

        img_n = _rms(img, p[f"{pre}.img_norm1.weight"], 1e-6) * (1 + im[1]) + im[0]
        txt_n = _rms(txt, p[f"{pre}.txt_norm1.weight"], 1e-6) * (1 + tm[1]) + tm[0]

        def qkv(xx, name, qn, kn, l):
            v3 = _lin(p, f"{pre}.{name}", xx)
            q, k, v = v3.chunk(3, dim=-1)
            q = _rms(q.view(b, l, nh, hd), p[f"{pre}.{qn}.weight"], 1e-5)
            k = _rms(k.view(b, l, nh, hd), p[f"{pre}.{kn}.weight"], 1e-5)
            return (q.permute(0, 2, 1, 3), k.permute(0, 2, 1, 3),
                    v.view(b, l, nh, hd).permute(0, 2, 1, 3))

        iq, ik, iv = qkv(img_n, "attn.img_qkv", "attn.norm_q", "attn.norm_k", li)
        tq, tk, tv = qkv(txt_n, "attn.txt_qkv", "attn.norm_added_q",
                         "attn.norm_added_k", lt)
        q = apply_rope(torch.cat([iq, tq], dim=2), rot)
        k = apply_rope(torch.cat([ik, tk], dim=2), rot)
        v = torch.cat([iv, tv], dim=2).float()
        o = F.scaled_dot_product_attention(q, k, v)
        o = o.permute(0, 2, 1, 3).reshape(b, li + lt, inner)
        img = img + _lin(p, f"{pre}.attn.to_out.0", o[:, :li]) * im[2]
        txt = txt + _lin(p, f"{pre}.attn.to_add_out", o[:, li:]) * tm[2]

        img_n = _rms(img, p[f"{pre}.img_norm2.weight"], 1e-6) * (1 + im[4]) + im[3]
        txt_n = _rms(txt, p[f"{pre}.txt_norm2.weight"], 1e-6) * (1 + tm[4]) + tm[3]
        img = img + _gate_mlp(p, f"{pre}.img_mlp", img_n) * im[5]
        txt = txt + _gate_mlp(p, f"{pre}.txt_mlp", txt_n) * tm[5]

    mods = _lin(p, "norm_out.linear", F.silu(t_emb))[:, None]
    scale, shift = mods.chunk(2, dim=-1)
    img = F.layer_norm(img, (inner,), eps=1e-6)
    img = img * (1.0 + scale) + shift
    img = _lin(p, "proj_out", img)
    return img.reshape(b, hl, wl, -1)

"""Test-only torch Anima reference (transcribed from the reference C++ math,
src/model/diffusion/anima.hpp: AnimaAttention :175, LoRA AdaLN :96/:136,
LLMAdapter :341, NTK rope gen_anima_image_pe_vec :609, block :461).
Consumes the same checkpoint-named param dict as sdtpu.models.anima."""
import math

import numpy as np
import torch
import torch.nn.functional as F


def _lin(p, name, x):
    return F.linear(x, p[f"{name}.weight"], p.get(f"{name}.bias"))


def _rms(x, w, eps=1e-6):
    v = x.float()
    return v * torch.rsqrt(v.pow(2).mean(-1, keepdim=True) + eps) * w.float()


def _timestep_embedding(t, dim, max_period=10000):
    half = dim // 2
    freqs = torch.exp(
        -math.log(max_period) * torch.arange(half, dtype=torch.float64) / half
    ).to(torch.float32)
    args = t[:, None].float() * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


def _ntk_factor(ratio, axis_dim):
    if ratio == 1.0 or axis_dim <= 2:
        return 1.0
    return ratio ** (axis_dim / (axis_dim - 2))


def _anima_rope(hp, wp, cfg, h_ratio=4.0, w_ratio=4.0):
    thetas = (cfg.theta * _ntk_factor(1.0, cfg.axes_dim[0]),
              cfg.theta * _ntk_factor(h_ratio, cfg.axes_dim[1]),
              cfg.theta * _ntk_factor(w_ratio, cfg.axes_dim[2]))
    ids = np.zeros((hp * wp, 3), dtype=np.float64)
    ii, jj = np.meshgrid(np.arange(hp), np.arange(wp), indexing="ij")
    ids[:, 1] = ii.reshape(-1)
    ids[:, 2] = jj.reshape(-1)
    angs = []
    for a, dim in enumerate(cfg.axes_dim):
        omega = 1.0 / (thetas[a] ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
        angs.append(ids[:, a:a + 1] * omega[None])
    ang = np.concatenate(angs, axis=1)
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


def _attn(p, pre, x, ctx, nh, hd, pe_q=None, pe_k=None, out_name="output_proj"):
    if ctx is None:
        ctx = x
    b, lq, _ = x.shape
    lk = ctx.shape[1]
    q = _lin(p, f"{pre}.q_proj", x).view(b, lq, nh, hd)
    k = _lin(p, f"{pre}.k_proj", ctx).view(b, lk, nh, hd)
    v = _lin(p, f"{pre}.v_proj", ctx).view(b, lk, nh, hd)
    q = _rms(q, p[f"{pre}.q_norm.weight"]).permute(0, 2, 1, 3)
    k = _rms(k, p[f"{pre}.k_norm.weight"]).permute(0, 2, 1, 3)
    v = v.permute(0, 2, 1, 3).float()
    if pe_q is not None or pe_k is not None:
        pq = pe_q if pe_q is not None else pe_k
        pk = pe_k if pe_k is not None else pe_q
        q = _rope_halves(q, *pq)
        k = _rope_halves(k, *pk)
    o = F.scaled_dot_product_attention(q, k, v)
    o = o.permute(0, 2, 1, 3).reshape(b, lq, nh * hd)
    return _lin(p, f"{pre}.{out_name}", o)


def _adaln(p, pre, x, embedded_t, temb, n_chunks):
    emb = F.silu(embedded_t)
    emb = _lin(p, f"{pre}.1", emb)
    emb = _lin(p, f"{pre}.2", emb)
    c = emb.shape[-1] // n_chunks
    if temb is not None:
        emb = emb + temb[..., : n_chunks * c]
    chunks = emb.chunk(n_chunks, dim=-1)
    h = F.layer_norm(x, (x.shape[-1],), eps=1e-6)
    h = h * (1.0 + chunks[1][:, None]) + chunks[0][:, None]
    return (h, chunks[2][:, None]) if n_chunks == 3 else (h, None)


def llm_adapter_forward_torch(p, source_states, t5_ids,
                              prefix="net.llm_adapter"):
    b, lt = t5_ids.shape
    ls = source_states.shape[1]
    x = p[f"{prefix}.embed.weight"][t5_ids].float()

    def rope1d(length):
        omega = 1.0 / (10000.0 ** (np.arange(0, 64, 2, dtype=np.float64) / 64))
        ang = np.arange(length, dtype=np.float64)[:, None] * omega[None]
        return (torch.from_numpy(np.cos(ang).astype(np.float32)),
                torch.from_numpy(np.sin(ang).astype(np.float32)))

    q_pe = rope1d(lt)
    k_pe = rope1d(ls)
    i = 0
    while f"{prefix}.blocks.{i}.self_attn.q_proj.weight" in p:
        pre = f"{prefix}.blocks.{i}"
        h = _rms(x, p[f"{pre}.norm_self_attn.weight"])
        x = x + _attn(p, f"{pre}.self_attn", h, None, 16, 64, pe_q=q_pe,
                      pe_k=q_pe, out_name="o_proj")
        h = _rms(x, p[f"{pre}.norm_cross_attn.weight"])
        x = x + _attn(p, f"{pre}.cross_attn", h, source_states, 16, 64,
                      pe_q=q_pe, pe_k=k_pe, out_name="o_proj")
        h = _rms(x, p[f"{pre}.norm_mlp.weight"])
        h = _lin(p, f"{pre}.mlp.0", h)
        h = _lin(p, f"{pre}.mlp.2", F.gelu(h, approximate="tanh"))
        x = x + h
        i += 1
    x = _lin(p, f"{prefix}.out_proj", x)
    return _rms(x, p[f"{prefix}.norm.weight"])


def anima_forward_torch(p, x, timesteps, context, cfg):
    b, hh, ww, c = x.shape
    ps = cfg.patch_size
    pad_h, pad_w = (-hh) % ps, (-ww) % ps
    x = torch.cat([x, torch.zeros(b, hh, ww, 1)], dim=-1)
    if pad_h or pad_w:
        x = F.pad(x, (0, 0, 0, pad_w, 0, pad_h))
    hp, wp = (hh + pad_h) // ps, (ww + pad_w) // ps
    img = x.view(b, hp, ps, wp, ps, c + 1).permute(0, 1, 3, 5, 2, 4)
    img = img.reshape(b, hp * wp, (c + 1) * ps * ps)
    img = _lin(p, "net.x_embedder.proj.1", img)

    t_proj = _timestep_embedding(timesteps, cfg.hidden_size)
    temb = _lin(p, "net.t_embedder.1.linear_1", t_proj)
    temb = _lin(p, "net.t_embedder.1.linear_2", F.silu(temb))
    embedded_t = _rms(t_proj, p["net.t_embedding_norm.weight"])

    pe = _anima_rope(hp, wp, cfg)
    nh, hd = cfg.num_heads, cfg.head_dim
    for i in range(cfg.num_layers):
        pre = f"net.blocks.{i}"
        h, gate = _adaln(p, f"{pre}.adaln_modulation_self_attn", img,
                         embedded_t, temb, 3)
        h = _attn(p, f"{pre}.self_attn", h, None, nh, hd, pe_q=pe, pe_k=pe)
        img = img + h * gate
        h, gate = _adaln(p, f"{pre}.adaln_modulation_cross_attn", img,
                         embedded_t, temb, 3)
        h = _attn(p, f"{pre}.cross_attn", h, context, nh, hd)
        img = img + h * gate
        h, gate = _adaln(p, f"{pre}.adaln_modulation_mlp", img, embedded_t,
                         temb, 3)
        h = _lin(p, f"{pre}.mlp.layer1", h)
        h = _lin(p, f"{pre}.mlp.layer2", F.gelu(h, approximate="tanh"))
        img = img + h * gate

    h, _ = _adaln(p, "net.final_layer.adaln_modulation", img, embedded_t,
                  temb, 2)
    out = _lin(p, "net.final_layer.linear", h)
    out = out.view(b, hp, wp, ps, ps, cfg.out_channels)
    out = out.permute(0, 1, 3, 2, 4, 5).reshape(b, hp * ps, wp * ps,
                                                cfg.out_channels)
    if pad_h or pad_w:
        out = out[:, :hh, :ww]
    return out

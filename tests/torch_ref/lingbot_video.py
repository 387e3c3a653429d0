"""Test-only torch LingBot-Video reference (transcribed from the reference
C++ math, src/model/diffusion/lingbot_video.hpp: sparse MoE :243-436, block
:506, forward :530-605; rope gen_lingbot_video_ids rope.hpp:822-840).
Consumes the same checkpoint-named param dict as sdtpu.models.lingbot_video."""
import numpy as np
import torch
import torch.nn.functional as F

from .flux import apply_rope, rope_rot, timestep_embedding


def _lin(p, name, x):
    return F.linear(x, p[f"{name}.weight"], p.get(f"{name}.bias"))


def _rms(x, w, eps):
    v = x.float()
    return v * torch.rsqrt(v.pow(2).mean(-1, keepdim=True) + eps) * w.float()


def _rope(tl, hl, wl, n_txt, cfg):
    n_vid = tl * hl * wl
    ids = np.zeros((n_vid + n_txt, 3), dtype=np.float64)
    tt, hh, ww = np.meshgrid(np.arange(tl), np.arange(hl), np.arange(wl),
                             indexing="ij")
    ids[:n_vid, 0] = tt.reshape(-1) + n_txt + 1
    ids[:n_vid, 1] = hh.reshape(-1)
    ids[:n_vid, 2] = ww.reshape(-1)
    ids[n_vid:, 0] = np.arange(1, n_txt + 1)
    return rope_rot(ids, cfg.axes_dim, cfg.rope_theta)


def _mlp(p, pre, x):
    gate = F.silu(_lin(p, f"{pre}.gate_proj", x))
    return _lin(p, f"{pre}.down_proj", gate * _lin(p, f"{pre}.up_proj", x))


def _moe_ffn(p, pre, x, cfg):
    b, l, hid = x.shape
    e, k = cfg.num_experts, cfg.num_experts_per_tok
    logits = torch.einsum("blh,eh->ble", x, p[f"{pre}.router.weight"].float())
    probs = torch.sigmoid(logits.float())
    scores = probs
    bias = p.get(f"{pre}.router.e_score_correction_bias")
    if bias is not None:
        scores = scores + bias.float()

    if cfg.n_group > 1 and cfg.topk_group > 0:
        epg = e // cfg.n_group
        grouped = scores.reshape(b, l, cfg.n_group, epg)
        top2 = torch.topk(grouped, 2, dim=-1).values.sum(dim=-1)
        gsel = torch.topk(top2, cfg.topk_group, dim=-1).indices
        gmask = F.one_hot(gsel, cfg.n_group).float().sum(dim=2)
        emask = gmask.repeat_interleave(epg, dim=-1)
        scores = scores + (emask - 1.0) * 1e9

    topv, topi = torch.topk(scores, k, dim=-1)
    w = torch.gather(probs, -1, topi)
    if cfg.norm_topk_prob and k > 1:
        w = w / torch.clamp(w.sum(dim=-1, keepdim=True), min=6.103515625e-5)
    w = w * cfg.routed_scaling_factor
    dispatch = (F.one_hot(topi, e).float() * w[..., None]).sum(dim=2)

    gate = torch.einsum("blh,eih->blei", x, p[f"{pre}.experts.w1"].float())
    up = torch.einsum("blh,eih->blei", x, p[f"{pre}.experts.w3"].float())
    act = F.silu(gate) * up
    out = torch.einsum("blei,ehi->bleh", act, p[f"{pre}.experts.w2"].float())
    out = torch.einsum("bleh,ble->blh", out, dispatch)
    if cfg.n_shared_experts > 0:
        out = out + _mlp(p, f"{pre}.shared_experts", x)
    return out


def _attn(p, pre, x, rot, cfg):
    b, l, _ = x.shape
    nh = cfg.num_heads
    hd = cfg.hidden_size // nh
    q = _lin(p, f"{pre}.to_q", x).view(b, l, nh, hd)
    k = _lin(p, f"{pre}.to_k", x).view(b, l, nh, hd)
    v = _lin(p, f"{pre}.to_v", x).view(b, l, nh, hd).permute(0, 2, 1, 3)
    q = _rms(q, p[f"{pre}.norm_q.weight"], cfg.norm_eps).permute(0, 2, 1, 3)
    k = _rms(k, p[f"{pre}.norm_k.weight"], cfg.norm_eps).permute(0, 2, 1, 3)
    q = apply_rope(q, rot)
    k = apply_rope(k, rot)
    o = F.scaled_dot_product_attention(q, k, v.float())
    o = o.permute(0, 2, 1, 3).reshape(b, l, nh * hd)
    return _lin(p, f"{pre}.to_out", o)


def lingbot_forward_torch(p, x, timesteps, context, cfg):
    b, tl, hh, ww, c = x.shape
    pt, ph, pw = cfg.patch_t, cfg.patch_h, cfg.patch_w
    t_len, h_len, w_len = tl // pt, hh // ph, ww // pw
    n_vid = t_len * h_len * w_len

    img = (x.view(b, t_len, pt, h_len, ph, w_len, pw, c)
           .permute(0, 1, 3, 5, 2, 4, 6, 7)
           .reshape(b, n_vid, pt * ph * pw * c))
    img = _lin(p, "patch_embedder", img)

    txt = _rms(context, p["text_embedder.norm.weight"], cfg.norm_eps)
    txt = _lin(p, "text_embedder.linear_1", txt)
    txt = _lin(p, "text_embedder.linear_2", F.silu(txt))
    n_txt = txt.shape[1]
    h = torch.cat([img, txt], dim=1)

    if timesteps.ndim == 1:
        tok_t = timesteps[:, None].expand(b, n_vid + n_txt)
    else:
        vid_t = timesteps[:, ::pt].repeat_interleave(h_len * w_len, dim=1)
        tok_t = torch.cat(
            [vid_t, timesteps[:, :1].expand(b, n_txt)], dim=1)
    t_emb = timestep_embedding(tok_t.reshape(-1), cfg.freq_dim)
    t_emb = _lin(p, "time_embedder.linear_1", t_emb)
    t_emb = _lin(p, "time_embedder.linear_2", F.silu(t_emb))
    t_emb = t_emb.view(b, n_vid + n_txt, cfg.hidden_size)
    temb6 = _lin(p, "time_modulation.1", F.silu(t_emb))

    rot = _rope(t_len, h_len, w_len, n_txt, cfg)

    for i in range(cfg.depth):
        pre = f"blocks.{i}"
        mod = temb6 + p[f"{pre}.scale_shift_table"].reshape(1, 1, -1).float()
        m = mod.chunk(6, dim=-1)
        a_in = _rms(h, p[f"{pre}.norm1.weight"], cfg.norm_eps)
        a_in = a_in * (1.0 + m[1]) + m[0]
        a = _attn(p, f"{pre}.attn", a_in, rot, cfg)
        a = _rms(a, p[f"{pre}.norm_post_attn.weight"], cfg.norm_eps)
        h = h + torch.tanh(m[2]) * a
        f_in = _rms(h, p[f"{pre}.norm2.weight"], cfg.norm_eps)
        f_in = f_in * (1.0 + m[4]) + m[3]
        if i in cfg.sparse_layers:
            f = _moe_ffn(p, f"{pre}.ffn", f_in, cfg)
        else:
            f = _mlp(p, f"{pre}.ffn", f_in)
        f = _rms(f, p[f"{pre}.norm_post_ffn.weight"], cfg.norm_eps)
        h = h + torch.tanh(m[5]) * f

    fm = _lin(p, "norm_out_modulation.1", F.silu(t_emb))
    shift, scale = fm.chunk(2, dim=-1)
    h = F.layer_norm(h, (cfg.hidden_size,), eps=cfg.norm_eps)
    h = h * (1.0 + scale) + shift
    h = _lin(p, "proj_out", h)
    h = h[:, :n_vid]
    out = (h.view(b, t_len, h_len, w_len, pt, ph, pw, cfg.out_channels)
           .permute(0, 1, 4, 2, 5, 3, 6, 7)
           .reshape(b, tl, hh, ww, cfg.out_channels))
    return out

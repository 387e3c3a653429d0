"""LingBot-Video — Wan-style video DiT with a sparse-MoE FFN.

Reference analog: LingBotVideo::LingBotVideoModel / LingBotVideoRunner
(src/model/diffusion/lingbot_video.hpp:506,609).  Joint attention over
[video tokens | text tokens] with 3-axis rope (theta 256, axes 32/48/48):
video ids offset by context_len+1 on the frame axis, text token j at
(j+1, 0, 0).  Blocks are RMSNorm-everywhere with a per-block
scale_shift_table added to the 6-way timestep modulation and tanh'd gates;
sparse layers swap the SwiGLU FFN for a 128-expert top-8 MoE with sigmoid
routing, group-limited expert selection (4 groups, top-2) and a shared
expert.  Checkpoint naming: ``blocks.N.{norm1,attn.{to_q,to_k,to_v,norm_q,
norm_k,to_out},norm_post_attn,norm2,ffn.*,norm_post_ffn,scale_shift_table}``,
``patch_embedder``, ``time_embedder.{linear_1,linear_2}``,
``time_modulation.1``, ``text_embedder.{norm,linear_1,linear_2}``,
``norm_out_modulation.1``, ``proj_out``.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sdtpu.ops import attention, layer_norm, linear, rms_norm, timestep_embedding
from sdtpu.ops.basic import silu


@dataclasses.dataclass(frozen=True)
class LingBotVideoConfig:
    patch_t: int = 1
    patch_h: int = 2
    patch_w: int = 2
    in_channels: int = 16
    out_channels: int = 16
    hidden_size: int = 2048
    num_heads: int = 16
    depth: int = 24
    intermediate_size: int = 6144
    text_dim: int = 2560
    freq_dim: int = 256
    norm_eps: float = 1e-6
    rope_theta: int = 256
    axes_dim: Tuple[int, int, int] = (32, 48, 48)
    qkv_bias: bool = False
    # MoE (sparse layers): 128 experts, top-8, sigmoid router with group
    # limiting (reference lingbot_video.hpp:117-129)
    num_experts: int = 0
    num_experts_per_tok: int = 8
    moe_intermediate_size: int = 768
    n_shared_experts: int = 1
    norm_topk_prob: bool = True
    routed_scaling_factor: float = 2.5
    n_group: int = 4
    topk_group: int = 2
    sparse_layers: Tuple[int, ...] = ()


LINGBOT_VIDEO_CONFIG = LingBotVideoConfig()


def detect_lingbot_config(names, shapes) -> LingBotVideoConfig:
    """Shape-driven config (reference detect_from_weights,
    lingbot_video.hpp:54-143)."""
    names = set(names)
    kw = {}
    depth = 0
    sparse = set()
    for n in names:
        if n.startswith("blocks."):
            i = int(n.split(".")[1])
            depth = max(depth, i + 1)
            if ".ffn.experts.w1" in n:
                sparse.add(i)
    if depth:
        kw["depth"] = depth
    w = shapes.get("patch_embedder.weight")
    if w:
        kw["hidden_size"] = w[0]
        kw["in_channels"] = w[1] // 4  # patch volume 1*2*2
    w = shapes.get("text_embedder.linear_1.weight")
    if w:
        kw["text_dim"] = w[1]
    w = shapes.get("time_embedder.linear_1.weight")
    if w:
        kw["freq_dim"] = w[1]
    hd = shapes.get("blocks.0.attn.norm_q.weight")
    if hd and kw.get("hidden_size"):
        kw["num_heads"] = kw["hidden_size"] // hd[0]
    if any(".attn.to_q.bias" in n for n in names):
        kw["qkv_bias"] = True
    w = shapes.get("blocks.0.ffn.gate_proj.weight")
    if w:
        kw["intermediate_size"] = w[0]
    w = shapes.get("proj_out.weight")
    if w:
        kw["out_channels"] = w[0] // 4
    for n in names:
        if n.endswith(".ffn.experts.w1"):
            sh = shapes[n]  # [E, inter, hid]
            kw["num_experts"] = sh[0]
            kw["moe_intermediate_size"] = sh[1]
            break
    if sparse:
        kw["sparse_layers"] = tuple(sorted(sparse))
        kw.setdefault("num_experts", 128)
    return dataclasses.replace(LINGBOT_VIDEO_CONFIG, **kw)


def lingbot_rope(tl: int, hl: int, wl: int, n_txt: int,
                 cfg: LingBotVideoConfig) -> jnp.ndarray:
    """Video ids (frame axis offset by n_txt+1) followed by text ids
    (j+1, 0, 0) (reference gen_lingbot_video_ids, rope.hpp:822-840)."""
    from sdtpu.models.flux import rope_freqs

    n_vid = tl * hl * wl
    ids = np.zeros((n_vid + n_txt, 3), dtype=np.float64)
    tt, hh, ww = np.meshgrid(np.arange(tl), np.arange(hl), np.arange(wl),
                             indexing="ij")
    ids[:n_vid, 0] = tt.reshape(-1) + n_txt + 1
    ids[:n_vid, 1] = hh.reshape(-1)
    ids[:n_vid, 2] = ww.reshape(-1)
    ids[n_vid:, 0] = np.arange(1, n_txt + 1)
    return jnp.asarray(rope_freqs(ids, cfg.axes_dim, cfg.rope_theta))


def _moe_ffn(p, pre: str, x: jnp.ndarray, cfg: LingBotVideoConfig) -> jnp.ndarray:
    """Sparse MoE (reference LingBotVideoSparseMoeBlock, lingbot_video.hpp:
    243-436): sigmoid router (+ optional correction bias applied to the
    SELECTION scores only), group-limited top-k, weight normalization and
    routed scaling, plus a shared-expert SwiGLU.  Computed densely over all
    experts with a dispatch mask (correct; a sorted-dispatch pallas kernel
    is the planned fast path)."""
    b, l, hid = x.shape
    e, k = cfg.num_experts, cfg.num_experts_per_tok
    logits = jnp.einsum("blh,eh->ble", x, p[f"{pre}.router.weight"].astype(x.dtype))
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    scores = probs
    bias = p.get(f"{pre}.router.e_score_correction_bias")
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)

    if cfg.n_group > 1 and cfg.topk_group > 0:
        epg = e // cfg.n_group
        grouped = scores.reshape(b, l, cfg.n_group, epg)
        top2 = jax.lax.top_k(grouped, 2)[0].sum(axis=-1)  # [B, L, G]
        _, gsel = jax.lax.top_k(top2, cfg.topk_group)
        gmask = jax.nn.one_hot(gsel, cfg.n_group, dtype=jnp.float32).sum(axis=2)
        emask = jnp.repeat(gmask, epg, axis=-1)  # [B, L, E]
        scores = scores + (emask - 1.0) * 1e9

    topv, topi = jax.lax.top_k(scores, k)
    w = jnp.take_along_axis(probs, topi, axis=-1)  # weights from raw probs
    if cfg.norm_topk_prob and k > 1:
        w = w / jnp.clip(w.sum(axis=-1, keepdims=True), 6.103515625e-5, None)
    w = w * cfg.routed_scaling_factor
    dispatch = (jax.nn.one_hot(topi, e, dtype=jnp.float32)
                * w[..., None]).sum(axis=2)  # [B, L, E]

    gate = jnp.einsum("blh,eih->blei", x, p[f"{pre}.experts.w1"].astype(x.dtype))
    up = jnp.einsum("blh,eih->blei", x, p[f"{pre}.experts.w3"].astype(x.dtype))
    act = silu(gate) * up
    out = jnp.einsum("blei,ehi->bleh", act, p[f"{pre}.experts.w2"].astype(x.dtype))
    out = jnp.einsum("bleh,ble->blh", out, dispatch.astype(out.dtype))
    if cfg.n_shared_experts > 0:
        out = out + _mlp(p, f"{pre}.shared_experts", x)
    return out


def _mlp(p, pre, x):
    gate = silu(linear(x, p[f"{pre}.gate_proj.weight"]))
    return linear(gate * linear(x, p[f"{pre}.up_proj.weight"]),
                  p[f"{pre}.down_proj.weight"])


def _attn(p, pre, x, rot, cfg: LingBotVideoConfig):
    from sdtpu.models.flux import apply_rope

    b, l, _ = x.shape
    nh = cfg.num_heads
    hd = cfg.hidden_size // nh
    q = linear(x, p[f"{pre}.to_q.weight"], p.get(f"{pre}.to_q.bias"))
    k = linear(x, p[f"{pre}.to_k.weight"], p.get(f"{pre}.to_k.bias"))
    v = linear(x, p[f"{pre}.to_v.weight"], p.get(f"{pre}.to_v.bias"))
    q = q.reshape(b, l, nh, hd)
    k = k.reshape(b, l, nh, hd)
    v = v.reshape(b, l, nh, hd).transpose(0, 2, 1, 3)
    q = rms_norm(q, p[f"{pre}.norm_q.weight"], eps=cfg.norm_eps).transpose(0, 2, 1, 3)
    k = rms_norm(k, p[f"{pre}.norm_k.weight"], eps=cfg.norm_eps).transpose(0, 2, 1, 3)
    q = apply_rope(q, rot)
    k = apply_rope(k, rot)
    o = attention(q, k, v).transpose(0, 2, 1, 3).reshape(b, l, nh * hd)
    return linear(o, p[f"{pre}.to_out.weight"], p.get(f"{pre}.to_out.bias"))


def lingbot_forward(
    p,
    x: jnp.ndarray,
    timesteps: jnp.ndarray,
    context: jnp.ndarray,
    cfg: LingBotVideoConfig = LINGBOT_VIDEO_CONFIG,
) -> jnp.ndarray:
    """x: [B,T,H,W,C] video latent; timesteps: [B] or [B,T_latent] (raw
    1..1000 flow t — per-frame for i2v masking); context: [B,L,text_dim]
    Qwen3-VL hidden states (reference LingBotVideoModel::forward,
    lingbot_video.hpp:530-605)."""
    b, tl, hh, ww, c = x.shape
    pt, ph, pw = cfg.patch_t, cfg.patch_h, cfg.patch_w
    t_len, h_len, w_len = tl // pt, hh // ph, ww // pw
    n_vid = t_len * h_len * w_len

    # patchify_3d patch_last=false: feature order (pt, ph, pw, c)
    img = (x.reshape(b, t_len, pt, h_len, ph, w_len, pw, c)
           .transpose(0, 1, 3, 5, 2, 4, 6, 7)
           .reshape(b, n_vid, pt * ph * pw * c))
    img = linear(img, p["patch_embedder.weight"], p.get("patch_embedder.bias"))

    txt = rms_norm(context.astype(x.dtype), p["text_embedder.norm.weight"],
                   eps=cfg.norm_eps)
    txt = linear(txt, p["text_embedder.linear_1.weight"],
                 p["text_embedder.linear_1.bias"])
    txt = linear(silu(txt), p["text_embedder.linear_2.weight"],
                 p["text_embedder.linear_2.bias"])
    n_txt = txt.shape[1]
    h = jnp.concatenate([img, txt], axis=1)

    # timestep embedding per TOKEN: per-frame timesteps broadcast over the
    # spatial grid, text tokens take the first frame's value
    if timesteps.ndim == 1:
        tok_t = jnp.broadcast_to(timesteps[:, None], (b, n_vid + n_txt))
    else:
        vid_t = jnp.repeat(timesteps[:, ::pt], h_len * w_len, axis=1)
        tok_t = jnp.concatenate(
            [vid_t, jnp.broadcast_to(timesteps[:, :1], (b, n_txt))], axis=1)
    t_emb = timestep_embedding(tok_t.reshape(-1), cfg.freq_dim).astype(x.dtype)
    t_emb = linear(t_emb, p["time_embedder.linear_1.weight"],
                   p["time_embedder.linear_1.bias"])
    t_emb = linear(silu(t_emb), p["time_embedder.linear_2.weight"],
                   p["time_embedder.linear_2.bias"])
    t_emb = t_emb.reshape(b, n_vid + n_txt, cfg.hidden_size)
    temb6 = linear(silu(t_emb), p["time_modulation.1.weight"],
                   p["time_modulation.1.bias"])  # [B, L, 6*hid]

    rot = lingbot_rope(t_len, h_len, w_len, n_txt, cfg)

    for i in range(cfg.depth):
        pre = f"blocks.{i}"
        mod = temb6 + p[f"{pre}.scale_shift_table"].reshape(1, 1, -1).astype(temb6.dtype)
        m = jnp.split(mod, 6, axis=-1)
        a_in = rms_norm(h, p[f"{pre}.norm1.weight"], eps=cfg.norm_eps)
        a_in = a_in * (1.0 + m[1]) + m[0]
        a = _attn(p, f"{pre}.attn", a_in, rot, cfg)
        a = rms_norm(a, p[f"{pre}.norm_post_attn.weight"], eps=cfg.norm_eps)
        h = h + jnp.tanh(m[2]) * a
        f_in = rms_norm(h, p[f"{pre}.norm2.weight"], eps=cfg.norm_eps)
        f_in = f_in * (1.0 + m[4]) + m[3]
        if i in cfg.sparse_layers:
            f = _moe_ffn(p, f"{pre}.ffn", f_in, cfg)
        else:
            f = _mlp(p, f"{pre}.ffn", f_in)
        f = rms_norm(f, p[f"{pre}.norm_post_ffn.weight"], eps=cfg.norm_eps)
        h = h + jnp.tanh(m[5]) * f

    fm = linear(silu(t_emb), p["norm_out_modulation.1.weight"],
                p["norm_out_modulation.1.bias"])
    shift, scale = jnp.split(fm, 2, axis=-1)
    h = layer_norm(h, eps=cfg.norm_eps) * (1.0 + scale) + shift
    h = linear(h, p["proj_out.weight"], p["proj_out.bias"])
    h = h[:, :n_vid]
    out = (h.reshape(b, t_len, h_len, w_len, pt, ph, pw, cfg.out_channels)
           .transpose(0, 1, 4, 2, 5, 3, 6, 7)
           .reshape(b, tl, hh, ww, cfg.out_channels))
    return out


def init_lingbot_params(cfg: LingBotVideoConfig = LINGBOT_VIDEO_CONFIG,
                        seed: int = 0, dtype=jnp.float32) -> dict:
    g = np.random.default_rng(seed)
    p: dict = {}

    def wt(*shape, scale=0.02):
        return jnp.asarray(g.standard_normal(shape, dtype=np.float32) * scale,
                           dtype=dtype)

    def lin(pre, o, i, bias=True):
        p[f"{pre}.weight"] = wt(o, i)
        if bias:
            p[f"{pre}.bias"] = jnp.zeros((o,), dtype=dtype)

    def norm(name, d):
        p[name] = jnp.ones((d,), dtype=dtype)

    hid = cfg.hidden_size
    hd = hid // cfg.num_heads
    pv = cfg.patch_t * cfg.patch_h * cfg.patch_w
    lin("patch_embedder", hid, pv * cfg.in_channels)
    lin("time_embedder.linear_1", hid, cfg.freq_dim)
    lin("time_embedder.linear_2", hid, hid)
    lin("time_modulation.1", 6 * hid, hid)
    norm("text_embedder.norm.weight", cfg.text_dim)
    lin("text_embedder.linear_1", hid, cfg.text_dim)
    lin("text_embedder.linear_2", hid, hid)
    for i in range(cfg.depth):
        pre = f"blocks.{i}"
        p[f"{pre}.scale_shift_table"] = wt(6 * hid, scale=0.1)
        for nn in ("norm1", "norm_post_attn", "norm2", "norm_post_ffn"):
            norm(f"{pre}.{nn}.weight", hid)
        lin(f"{pre}.attn.to_q", hid, hid, bias=cfg.qkv_bias)
        lin(f"{pre}.attn.to_k", hid, hid, bias=cfg.qkv_bias)
        lin(f"{pre}.attn.to_v", hid, hid, bias=cfg.qkv_bias)
        norm(f"{pre}.attn.norm_q.weight", hd)
        norm(f"{pre}.attn.norm_k.weight", hd)
        lin(f"{pre}.attn.to_out", hid, hid)
        if i in cfg.sparse_layers:
            e, mi = cfg.num_experts, cfg.moe_intermediate_size
            p[f"{pre}.ffn.router.weight"] = wt(e, hid)
            p[f"{pre}.ffn.router.e_score_correction_bias"] = jnp.zeros(
                (e,), dtype=dtype)
            p[f"{pre}.ffn.experts.w1"] = wt(e, mi, hid)
            p[f"{pre}.ffn.experts.w2"] = wt(e, hid, mi)
            p[f"{pre}.ffn.experts.w3"] = wt(e, mi, hid)
            if cfg.n_shared_experts > 0:
                si = mi * cfg.n_shared_experts
                lin(f"{pre}.ffn.shared_experts.gate_proj", si, hid, bias=False)
                lin(f"{pre}.ffn.shared_experts.up_proj", si, hid, bias=False)
                lin(f"{pre}.ffn.shared_experts.down_proj", hid, si, bias=False)
        else:
            lin(f"{pre}.ffn.gate_proj", cfg.intermediate_size, hid, bias=False)
            lin(f"{pre}.ffn.up_proj", cfg.intermediate_size, hid, bias=False)
            lin(f"{pre}.ffn.down_proj", hid, cfg.intermediate_size, bias=False)
    lin("norm_out_modulation.1", 2 * hid, hid)
    lin("proj_out", pv * cfg.out_channels, hid)
    return p

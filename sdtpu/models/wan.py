"""Wan 2.1/2.2 video DiT — rectified-flow transformer over 3-D video latents.

Reference analog: WanRunner (src/model/diffusion/wan.hpp:793; upstream
Wan-Video/Wan2.1).  Checkpoint naming: ``blocks.N.{self_attn,cross_attn}.
{q,k,v,o,norm_q,norm_k,k_img,v_img,norm_k_img}``, ``blocks.N.norm3``,
``blocks.N.ffn.{0,2}``, ``blocks.N.modulation``, ``patch_embedding``,
``text_embedding.{0,2}``, ``time_embedding.{0,2}``, ``time_projection.1``,
``head.{head,modulation}``, ``img_emb.proj.{0,1,3,4}`` (i2v).

TPU-first notes: the whole clip is a single token sequence
(t_len*h_len*w_len ≈ 32k for 81-frame 480p) processed in one jitted forward —
3-axis RoPE (t,h,w) with axes_dim (44,42,42) reuses the FLUX rotation helpers;
attention over the long sequence uses the shared flash-attention path.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from sdtpu.models.flux import apply_rope, rope_freqs
from sdtpu.ops import attention, layer_norm, linear, rms_norm, timestep_embedding
from sdtpu.ops.basic import gelu as gelu_exact, gelu_tanh, silu


@dataclasses.dataclass(frozen=True)
class WanConfig:
    model_type: str = "t2v"  # "t2v" | "i2v"
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    in_dim: int = 16
    dim: int = 1536
    ffn_dim: int = 8960
    freq_dim: int = 256
    text_dim: int = 4096
    out_dim: int = 16
    num_heads: int = 12
    num_layers: int = 30
    qk_norm: bool = True
    cross_attn_norm: bool = True
    eps: float = 1e-6
    theta: int = 10000
    axes_dim: Tuple[int, ...] = (44, 42, 42)
    # VACE video editing/control blocks (reference wan.hpp:382,572-593)
    vace_layers: int = 0
    vace_in_dim: int = 96


WAN21_T2V_1_3B_CONFIG = WanConfig()
WAN21_T2V_14B_CONFIG = WanConfig(
    dim=5120, ffn_dim=13824, num_heads=40, num_layers=40
)
WAN21_I2V_14B_CONFIG = dataclasses.replace(
    WAN21_T2V_14B_CONFIG, model_type="i2v", in_dim=36
)
WAN22_TI2V_5B_CONFIG = WanConfig(
    dim=3072, ffn_dim=14336, num_heads=24, num_layers=30, in_dim=48, out_dim=48
)


def detect_wan_config(names, shapes, version: str = "wan2.1") -> WanConfig:
    """Config from checkpoint fingerprints (reference wan.hpp:42 + :808)."""
    num_layers = 0
    vace_layers = 0
    is_i2v = False
    for n in names:
        if n.startswith("blocks."):
            num_layers = max(num_layers, int(n.split(".")[1]) + 1)
        if n.startswith("vace_blocks."):
            vace_layers = max(vace_layers, int(n.split(".")[1]) + 1)
        if "img_emb" in n:
            is_i2v = True
    in_dim = shapes.get("patch_embedding.weight", (0, 16))[1]
    if num_layers == 40:
        base = WAN21_I2V_14B_CONFIG if (is_i2v or in_dim == 36) else WAN21_T2V_14B_CONFIG
    elif num_layers == 30 and in_dim == 48:
        base = WAN22_TI2V_5B_CONFIG
    else:
        base = WAN21_T2V_1_3B_CONFIG
    base = dataclasses.replace(
        base,
        in_dim=in_dim or base.in_dim,
        num_layers=num_layers or base.num_layers,
        model_type="i2v" if is_i2v else base.model_type,
        vace_layers=vace_layers,
        vace_in_dim=shapes.get("vace_patch_embedding.weight",
                               (0, base.vace_in_dim))[1],
    )
    # prefer exact dims from the weights; every published Wan uses d_head=128
    dim = shapes.get("patch_embedding.weight", (0,))[0]
    ffn = shapes.get("blocks.0.ffn.0.weight", (0,))[0]
    out = shapes.get("head.head.weight", (0,))
    if dim and dim % 128 == 0:
        pt, ph, pw = base.patch_size
        base = dataclasses.replace(
            base,
            dim=dim,
            num_heads=dim // 128,
            ffn_dim=ffn or base.ffn_dim,
            out_dim=(out[0] // (pt * ph * pw)) if out[0] else base.out_dim,
            text_dim=shapes.get("text_embedding.0.weight", (0, base.text_dim))[1],
        )
    return base


def _wan_attention(p, pre, x, rot, num_heads, eps):
    """Self-attention with full-dim q/k RMSNorm + 3-axis RoPE."""
    b, l, dim = x.shape
    d = dim // num_heads
    q = linear(x, p[f"{pre}.q.weight"], p[f"{pre}.q.bias"])
    q = rms_norm(q, p[f"{pre}.norm_q.weight"], eps=eps)
    k = linear(x, p[f"{pre}.k.weight"], p[f"{pre}.k.bias"])
    k = rms_norm(k, p[f"{pre}.norm_k.weight"], eps=eps)
    v = linear(x, p[f"{pre}.v.weight"], p[f"{pre}.v.bias"])
    q = q.reshape(b, l, num_heads, d).transpose(0, 2, 1, 3)
    k = k.reshape(b, l, num_heads, d).transpose(0, 2, 1, 3)
    v = v.reshape(b, l, num_heads, d).transpose(0, 2, 1, 3)
    q = apply_rope(q, rot)
    k = apply_rope(k, rot)
    o = attention(q, k, v).transpose(0, 2, 1, 3).reshape(b, l, dim)
    return linear(o, p[f"{pre}.o.weight"], p[f"{pre}.o.bias"])


def _wan_cross_attention(p, pre, x, context, num_heads, eps, context_img_len=0):
    """T2V: plain cross-attn on text.  I2V: extra k_img/v_img attention over
    the CLIP-vision tokens prefix, summed (reference wan.hpp:200)."""
    b, l, dim = x.shape
    d = dim // num_heads

    def heads(t):
        return t.reshape(b, t.shape[1], num_heads, d).transpose(0, 2, 1, 3)

    q = linear(x, p[f"{pre}.q.weight"], p[f"{pre}.q.bias"])
    q = heads(rms_norm(q, p[f"{pre}.norm_q.weight"], eps=eps))

    ctx_txt = context[:, context_img_len:]
    k = linear(ctx_txt, p[f"{pre}.k.weight"], p[f"{pre}.k.bias"])
    k = heads(rms_norm(k, p[f"{pre}.norm_k.weight"], eps=eps))
    v = heads(linear(ctx_txt, p[f"{pre}.v.weight"], p[f"{pre}.v.bias"]))
    o = attention(q, k, v)

    if context_img_len > 0:
        ctx_img = context[:, :context_img_len]
        k_img = linear(ctx_img, p[f"{pre}.k_img.weight"], p[f"{pre}.k_img.bias"])
        k_img = heads(rms_norm(k_img, p[f"{pre}.norm_k_img.weight"], eps=eps))
        v_img = heads(linear(ctx_img, p[f"{pre}.v_img.weight"], p[f"{pre}.v_img.bias"]))
        o = o + attention(q, k_img, v_img)

    o = o.transpose(0, 2, 1, 3).reshape(b, l, dim)
    return linear(o, p[f"{pre}.o.weight"], p[f"{pre}.o.bias"])


def wan_block_params(p, pre: str):
    """Local (prefix-stripped) view of one transformer block's params."""
    plen = len(pre) + 1
    return {k[plen:]: v for k, v in p.items() if k.startswith(pre + ".")}


def wan_block_forward(bp, h, e0, ctx, rot, cfg: WanConfig, context_img_len: int = 0):
    """One Wan transformer block on local params (reference WanAttentionBlock,
    wan.hpp:244).  Shared by the fully-jitted forward and the host-RAM
    weight-streaming path (WanStreamer)."""
    es = (e0 + bp["modulation"].reshape(1, 6, cfg.dim)).astype(h.dtype)
    shift_sa, scale_sa, gate_sa = es[:, 0, None], es[:, 1, None], es[:, 2, None]
    shift_ff, scale_ff, gate_ff = es[:, 3, None], es[:, 4, None], es[:, 5, None]

    y = layer_norm(h, eps=cfg.eps) * (1 + scale_sa) + shift_sa
    y = _wan_attention(bp, "self_attn", y, rot, cfg.num_heads, cfg.eps)
    h = h + y * gate_sa

    hn = (
        layer_norm(h, bp["norm3.weight"], bp["norm3.bias"], eps=cfg.eps)
        if cfg.cross_attn_norm
        else h
    )
    h = h + _wan_cross_attention(
        bp, "cross_attn", hn, ctx, cfg.num_heads, cfg.eps, context_img_len
    )

    y = layer_norm(h, eps=cfg.eps) * (1 + scale_ff) + shift_ff
    y = linear(y, bp["ffn.0.weight"], bp["ffn.0.bias"])
    y = linear(gelu_tanh(y), bp["ffn.2.weight"], bp["ffn.2.bias"])
    return h + y * gate_ff


def wan_prologue(p, x, timesteps, context, clip_fea, cfg: WanConfig):
    """Patchify + embeddings + RoPE → (img, e, e0, ctx, context_img_len,
    dims); dims are the static patch-grid sizes for the head."""
    b, t, hh, ww, c = x.shape
    pt, ph, pw = cfg.patch_size
    # pad to patch multiples (reference pad_to_patch_size, wan.hpp:598)
    pad_t, pad_h, pad_w = (-t) % pt, (-hh) % ph, (-ww) % pw
    if pad_t or pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_t), (0, pad_h), (0, pad_w), (0, 0)))
    tl, hl, wl = (t + pad_t) // pt, (hh + pad_h) // ph, (ww + pad_w) // pw

    # patchify → tokens ordered (t, h, w); patch vector ordered (C, pt, ph, pw)
    # to match the torch Conv3d weight layout [dim, C, pt, ph, pw]
    img = x.reshape(b, tl, pt, hl, ph, wl, pw, c)
    img = img.transpose(0, 1, 3, 5, 7, 2, 4, 6).reshape(b, tl * hl * wl, c * pt * ph * pw)
    w_patch = p["patch_embedding.weight"].reshape(cfg.dim, -1)
    img = linear(img, w_patch, p["patch_embedding.bias"])

    # time embedding → e [B, dim]; projection → e0 [B, 6, dim]
    t_emb = timestep_embedding(timesteps, cfg.freq_dim).astype(x.dtype)
    e = linear(t_emb, p["time_embedding.0.weight"], p["time_embedding.0.bias"])
    e = linear(silu(e), p["time_embedding.2.weight"], p["time_embedding.2.bias"])
    e0 = linear(silu(e), p["time_projection.1.weight"], p["time_projection.1.bias"])
    e0 = e0.reshape(b, 6, cfg.dim)

    # text embedding (exact GELU, reference wan.hpp:684)
    ctx = linear(context.astype(x.dtype), p["text_embedding.0.weight"], p["text_embedding.0.bias"])
    ctx = linear(gelu_exact(ctx), p["text_embedding.2.weight"], p["text_embedding.2.bias"])

    context_img_len = 0
    if clip_fea is not None and cfg.model_type == "i2v":
        # MLPProj (reference wan.hpp:479)
        ci = layer_norm(
            clip_fea.astype(x.dtype), p["img_emb.proj.0.weight"], p["img_emb.proj.0.bias"]
        )
        ci = linear(ci, p["img_emb.proj.1.weight"], p["img_emb.proj.1.bias"])
        ci = linear(gelu_tanh(ci), p["img_emb.proj.3.weight"], p["img_emb.proj.3.bias"])
        ci = layer_norm(ci, p["img_emb.proj.4.weight"], p["img_emb.proj.4.bias"])
        ctx = jnp.concatenate([ci, ctx], axis=1)
        context_img_len = clip_fea.shape[1]

    # 3-axis RoPE over the (t, h, w) grid — host-static per shape
    ids = np.zeros((tl * hl * wl, 3), dtype=np.int64)
    ti, hi, wi = np.meshgrid(np.arange(tl), np.arange(hl), np.arange(wl), indexing="ij")
    ids[:, 0], ids[:, 1], ids[:, 2] = ti.reshape(-1), hi.reshape(-1), wi.reshape(-1)
    rot = jnp.asarray(rope_freqs(ids, cfg.axes_dim, cfg.theta))
    return img, e, e0, ctx, context_img_len, rot, (b, t, hh, ww, tl, hl, wl)


def wan_head(p, h, e, cfg: WanConfig, dims):
    """Final modulated norm + head + unpatchify (reference wan.hpp:433)."""
    b, t, hh, ww, tl, hl, wl = dims
    pt, ph, pw = cfg.patch_size
    e2 = (e[:, None, :] + p["head.modulation"].reshape(1, 2, cfg.dim)).astype(h.dtype)
    h = layer_norm(h, eps=cfg.eps) * (1 + e2[:, 1, None]) + e2[:, 0, None]
    h = linear(h, p["head.head.weight"], p["head.head.bias"])
    out = h.reshape(b, tl, hl, wl, cfg.out_dim, pt, ph, pw)
    out = out.transpose(0, 1, 5, 2, 6, 3, 7, 4).reshape(
        b, tl * pt, hl * ph, wl * pw, cfg.out_dim
    )
    return out[:, :t, :hh, :ww, :]


def wan_forward(
    p,
    x: jnp.ndarray,
    timesteps: jnp.ndarray,
    context: jnp.ndarray,
    clip_fea: Optional[jnp.ndarray] = None,
    cfg: WanConfig = WAN21_T2V_1_3B_CONFIG,
    vace_context: Optional[jnp.ndarray] = None,
    vace_strength: float = 1.0,
    skip_layers: tuple = (),
) -> jnp.ndarray:
    """x: [B, T, H, W, C] video latent (NTHWC); timesteps: [B] in [0,1000];
    context: [B, 512, text_dim] UMT5 states; clip_fea: [B, 257, 1280] (i2v).
    Returns velocity [B, T, H, W, out_dim]."""
    b, t, hh, ww, c = x.shape
    pt, ph, pw = cfg.patch_size
    pad_t, pad_h, pad_w = (-t) % pt, (-hh) % ph, (-ww) % pw
    img, e, e0, ctx, context_img_len, rot, dims = wan_prologue(
        p, x, timesteps, context, clip_fea, cfg
    )
    tl, hl, wl = dims[4], dims[5], dims[6]

    def _block(pre, h):
        return wan_block_forward(
            wan_block_params(p, pre), h, e0, ctx, rot, cfg, context_img_len
        )

    # VACE (reference wan.hpp:695-731): the control stream c runs its own
    # attention blocks spliced every num_layers/vace_layers layers; each
    # vace block's after_proj lands on x scaled by vace_strength
    c = None
    vace_map = {}
    if vace_context is not None and cfg.vace_layers > 0:
        vc = vace_context
        if pad_t or pad_h or pad_w:
            vc = jnp.pad(vc, ((0, 0), (0, pad_t), (0, pad_h), (0, pad_w), (0, 0)))
        vc = vc.reshape(b, tl, pt, hl, ph, wl, pw, cfg.vace_in_dim)
        vc = vc.transpose(0, 1, 3, 5, 7, 2, 4, 6).reshape(
            b, tl * hl * wl, cfg.vace_in_dim * pt * ph * pw)
        wv = p["vace_patch_embedding.weight"].reshape(cfg.dim, -1)
        c = linear(vc.astype(img.dtype), wv, p["vace_patch_embedding.bias"])
        step = cfg.num_layers // cfg.vace_layers
        vace_map = {n * step: n for n in range(cfg.vace_layers)}

    h = img
    x_orig = img
    for i in range(cfg.num_layers):
        # Skip-Layer Guidance pass: block i is identity when skipped (the
        # VACE control splice still applies — it is a separate stream)
        if i not in skip_layers:
            h = _block(f"blocks.{i}", h)
        if i in vace_map:
            n = vace_map[i]
            if n == 0:
                c = linear(c, p["vace_blocks.0.before_proj.weight"],
                           p["vace_blocks.0.before_proj.bias"]) + x_orig
            c = _block(f"vace_blocks.{n}", c)
            c_skip = linear(c, p[f"vace_blocks.{n}.after_proj.weight"],
                            p[f"vace_blocks.{n}.after_proj.bias"])
            h = h + c_skip * vace_strength

    return wan_head(p, h, e, cfg, dims)


def init_wan_params(cfg: WanConfig = WAN21_T2V_1_3B_CONFIG, seed: int = 0, dtype=jnp.float32):
    g = np.random.default_rng(seed)
    dim = cfg.dim

    p = {}

    def lin(name, o, i, bias=True):
        p[f"{name}.weight"] = jnp.asarray(
            g.standard_normal((o, i), dtype=np.float32) * 0.02, dtype=dtype
        )
        if bias:
            p[f"{name}.bias"] = jnp.zeros((o,), dtype=dtype)

    def norm(name, n, bias=False):
        p[f"{name}.weight"] = jnp.ones((n,), dtype=dtype)
        if bias:
            p[f"{name}.bias"] = jnp.zeros((n,), dtype=dtype)

    pt, ph, pw = cfg.patch_size
    p["patch_embedding.weight"] = jnp.asarray(
        g.standard_normal((dim, cfg.in_dim, pt, ph, pw), dtype=np.float32) * 0.02, dtype=dtype
    )
    p["patch_embedding.bias"] = jnp.zeros((dim,), dtype=dtype)
    lin("text_embedding.0", dim, cfg.text_dim)
    lin("text_embedding.2", dim, dim)
    lin("time_embedding.0", dim, cfg.freq_dim)
    lin("time_embedding.2", dim, dim)
    lin("time_projection.1", dim * 6, dim)
    for i in range(cfg.num_layers):
        pre = f"blocks.{i}"
        for attn in ("self_attn", "cross_attn"):
            for ln in ("q", "k", "v", "o"):
                lin(f"{pre}.{attn}.{ln}", dim, dim)
            norm(f"{pre}.{attn}.norm_q", dim)
            norm(f"{pre}.{attn}.norm_k", dim)
        if cfg.model_type == "i2v":
            lin(f"{pre}.cross_attn.k_img", dim, dim)
            lin(f"{pre}.cross_attn.v_img", dim, dim)
            norm(f"{pre}.cross_attn.norm_k_img", dim)
        if cfg.cross_attn_norm:
            norm(f"{pre}.norm3", dim, bias=True)
        lin(f"{pre}.ffn.0", cfg.ffn_dim, dim)
        lin(f"{pre}.ffn.2", dim, cfg.ffn_dim)
        p[f"{pre}.modulation"] = jnp.asarray(
            g.standard_normal((1, 6, dim), dtype=np.float32) * 0.02, dtype=dtype
        )
    for n in range(cfg.vace_layers):
        pre = f"vace_blocks.{n}"
        for attn in ("self_attn", "cross_attn"):
            for ln in ("q", "k", "v", "o"):
                lin(f"{pre}.{attn}.{ln}", dim, dim)
            norm(f"{pre}.{attn}.norm_q", dim)
            norm(f"{pre}.{attn}.norm_k", dim)
        if cfg.cross_attn_norm:
            norm(f"{pre}.norm3", dim, bias=True)
        lin(f"{pre}.ffn.0", cfg.ffn_dim, dim)
        lin(f"{pre}.ffn.2", dim, cfg.ffn_dim)
        p[f"{pre}.modulation"] = jnp.asarray(
            g.standard_normal((1, 6, dim), dtype=np.float32) * 0.02, dtype=dtype
        )
        if n == 0:
            lin(f"{pre}.before_proj", dim, dim)
        lin(f"{pre}.after_proj", dim, dim)
    if cfg.vace_layers:
        p["vace_patch_embedding.weight"] = jnp.asarray(
            g.standard_normal((dim, cfg.vace_in_dim, pt, ph, pw),
                              dtype=np.float32) * 0.02, dtype=dtype)
        p["vace_patch_embedding.bias"] = jnp.zeros((dim,), dtype=dtype)
    if cfg.model_type == "i2v":
        lin("img_emb.proj.1", 1280, 1280)
        lin("img_emb.proj.3", dim, 1280)
        norm("img_emb.proj.0", 1280, bias=True)
        norm("img_emb.proj.4", dim, bias=True)
    lin("head.head", cfg.out_dim * pt * ph * pw, dim)
    p["head.modulation"] = jnp.asarray(
        g.standard_normal((1, 2, dim), dtype=np.float32) * 0.02, dtype=dtype
    )
    return p

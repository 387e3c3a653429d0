"""Hunyuan Video 1.5 DiT — FLUX-style double-stream blocks over 3-D video
latents with a token-refiner text input.

Reference analog: HunyuanVideoModel (src/model/diffusion/hunyuan.hpp:284).
Checkpoint naming (flux-style internal scheme): ``double_blocks.N.…`` (same as
FLUX), ``img_in.proj``, ``txt_in.{input_embedder, t_embedder/c_embedder
.{in_layer,out_layer}, individual_token_refiner.blocks.K.…}``, ``time_in``,
``final_layer``.  RoPE: txt ids zero, video (t,h,w) grid, theta 256,
axes (16,56,56); timestep embedding uses time factor 1 (raw t, not ×1000).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from sdtpu.models.flux import _mlp_embed, _modulation, _qkv_norm, apply_rope, rope_freqs
from sdtpu.ops import attention, layer_norm, linear, rms_norm, timestep_embedding
from sdtpu.ops.basic import gelu_tanh, silu


@dataclasses.dataclass(frozen=True)
class HunyuanVideoConfig:
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    in_channels: int = 65
    out_channels: int = 32
    hidden_size: int = 2048
    context_in_dim: int = 3584
    mlp_ratio: float = 4.0
    num_heads: int = 16
    depth: int = 54
    depth_single: int = 0
    qkv_bias: bool = True
    guidance_embed: bool = False
    theta: float = 256.0
    axes_dim: Tuple[int, ...] = (16, 56, 56)
    refiner_depth: int = 2
    # meanflow variant (reference hunyuan.hpp:175,433): time_r_in embeds the
    # NEXT-step sigma (t×1000 factor); vec = (vec + vec_r), averaged unless
    # use_meanflow_sum
    use_meanflow: bool = False
    use_meanflow_sum: bool = False
    # ByT5 glyph branch (reference hunyuan.hpp:137,317,452): quoted prompt
    # text encoded by byt5-small is mapped to hidden via byt5_in and joins
    # the text stream; cond_type_embedding tags refiner tokens (row 0) vs
    # byt5 tokens (row 1)
    use_byt5: bool = False
    byt5_in_dim: int = 1472
    use_cond_type_embedding: bool = False


HUNYUAN_VIDEO_15_CONFIG = HunyuanVideoConfig()


def detect_hunyuan_config(names, shapes) -> HunyuanVideoConfig:
    depth = 0
    depth_single = 0
    for n in names:
        if n.startswith("double_blocks."):
            depth = max(depth, int(n.split(".")[1]) + 1)
        if n.startswith("single_blocks."):
            depth_single = max(depth_single, int(n.split(".")[1]) + 1)
    kw = {"depth": depth or 54, "depth_single": depth_single}
    if any(n.startswith("time_r_in.") for n in names):
        kw["use_meanflow"] = True
    if any(n.startswith("byt5_in.") for n in names):
        kw["use_byt5"] = True
        fc1 = shapes.get("byt5_in.fc1.weight")
        if fc1:
            kw["byt5_in_dim"] = fc1[1]
    if "cond_type_embedding.weight" in set(names):
        kw["use_cond_type_embedding"] = True
    proj = shapes.get("img_in.proj.weight")
    if proj:
        kw["hidden_size"] = proj[0]
        kw["in_channels"] = proj[1]
    ctx_w = shapes.get("txt_in.input_embedder.weight")
    if ctx_w:
        kw["context_in_dim"] = ctx_w[1]
    return dataclasses.replace(HUNYUAN_VIDEO_15_CONFIG, **kw)


def _token_refiner(p, txt, timesteps, cfg):
    """TokenRefiner (reference hunyuan.hpp:102): adaLN-gated self-attn blocks
    conditioned on t_emb + mean-pooled context embedding."""
    hid = cfg.hidden_size
    t_emb = timestep_embedding(timesteps, 256).astype(txt.dtype)
    vec = _mlp_embed(p, "txt_in.t_embedder", t_emb)
    pooled = txt.mean(axis=1)
    vec = vec + _mlp_embed(p, "txt_in.c_embedder", pooled)

    h = linear(txt, p["txt_in.input_embedder.weight"], p["txt_in.input_embedder.bias"])
    b, l, _ = h.shape
    nh = cfg.num_heads
    d = hid // nh
    for i in range(cfg.refiner_depth):
        pre = f"txt_in.individual_token_refiner.blocks.{i}"
        mods = linear(silu(vec), p[f"{pre}.adaLN_modulation.1.weight"],
                      p[f"{pre}.adaLN_modulation.1.bias"])
        gate_attn, gate_mlp = jnp.split(mods, 2, axis=-1)
        hn = layer_norm(h, p[f"{pre}.norm1.weight"], p[f"{pre}.norm1.bias"], eps=1e-6)
        qkv = linear(hn, p[f"{pre}.self_attn.qkv.weight"], p[f"{pre}.self_attn.qkv.bias"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, l, nh, d).transpose(0, 2, 1, 3)
        k = k.reshape(b, l, nh, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, l, nh, d).transpose(0, 2, 1, 3)
        o = attention(q, k, v).transpose(0, 2, 1, 3).reshape(b, l, hid)
        o = linear(o, p[f"{pre}.self_attn.proj.weight"], p[f"{pre}.self_attn.proj.bias"])
        h = h + o * gate_attn[:, None]
        hn = layer_norm(h, p[f"{pre}.norm2.weight"], p[f"{pre}.norm2.bias"], eps=1e-6)
        m = linear(hn, p[f"{pre}.mlp.0.weight"], p[f"{pre}.mlp.0.bias"])
        m = linear(silu(m), p[f"{pre}.mlp.2.weight"], p[f"{pre}.mlp.2.bias"])
        h = h + m * gate_mlp[:, None]
    return h, vec


def _k(pre: str, name: str) -> str:
    return f"{pre}.{name}" if pre else name


def hunyuan_double_block(p, pre, img, txt, vec, rot, cfg: "HunyuanVideoConfig"):
    """One HunyuanVideo double-stream block (reference hunyuan.hpp
    DoubleStreamBlock).  p may be the full dict (pre='double_blocks.i') or a
    block-local dict (pre='') for the weight-streamed path."""
    b = img.shape[0]
    hid = cfg.hidden_size
    nh = cfg.num_heads
    l_txt = txt.shape[1]
    img_mods = _modulation(p, _k(pre, "img_mod"), vec, 6)
    txt_mods = _modulation(p, _k(pre, "txt_mod"), vec, 6)
    img_n = layer_norm(img, eps=1e-6) * (1 + img_mods[1][:, None]) + img_mods[0][:, None]
    txt_n = layer_norm(txt, eps=1e-6) * (1 + txt_mods[1][:, None]) + txt_mods[0][:, None]
    iq, ik, iv = _qkv_norm(p, _k(pre, "img_attn"), img_n, nh)
    tq, tk, tv = _qkv_norm(p, _k(pre, "txt_attn"), txt_n, nh)
    q = apply_rope(jnp.concatenate([tq, iq], axis=2), rot)
    k = apply_rope(jnp.concatenate([tk, ik], axis=2), rot)
    v = jnp.concatenate([tv, iv], axis=2)
    att = attention(q, k, v).transpose(0, 2, 1, 3).reshape(b, -1, hid)
    txt_att, img_att = att[:, :l_txt], att[:, l_txt:]
    img = img + img_mods[2][:, None] * linear(
        img_att, p[_k(pre, "img_attn.proj.weight")], p[_k(pre, "img_attn.proj.bias")]
    )
    img_m = layer_norm(img, eps=1e-6) * (1 + img_mods[4][:, None]) + img_mods[3][:, None]
    img_mlp = linear(img_m, p[_k(pre, "img_mlp.0.weight")], p[_k(pre, "img_mlp.0.bias")])
    img = img + img_mods[5][:, None] * linear(
        gelu_tanh(img_mlp), p[_k(pre, "img_mlp.2.weight")], p[_k(pre, "img_mlp.2.bias")]
    )
    txt = txt + txt_mods[2][:, None] * linear(
        txt_att, p[_k(pre, "txt_attn.proj.weight")], p[_k(pre, "txt_attn.proj.bias")]
    )
    txt_m = layer_norm(txt, eps=1e-6) * (1 + txt_mods[4][:, None]) + txt_mods[3][:, None]
    txt_mlp = linear(txt_m, p[_k(pre, "txt_mlp.0.weight")], p[_k(pre, "txt_mlp.0.bias")])
    txt = txt + txt_mods[5][:, None] * linear(
        gelu_tanh(txt_mlp), p[_k(pre, "txt_mlp.2.weight")], p[_k(pre, "txt_mlp.2.bias")]
    )
    return img, txt


def _byt5_mapper(p, x):
    """ByT5Mapper (reference hunyuan.hpp:137): LayerNorm → fc1 → gelu →
    fc2 → gelu → fc3 lifts byt5-small states (1472) to hidden."""
    h = layer_norm(x, p["byt5_in.layernorm.weight"], p["byt5_in.layernorm.bias"])
    h = gelu_tanh(linear(h, p["byt5_in.fc1.weight"], p["byt5_in.fc1.bias"]))
    h = gelu_tanh(linear(h, p["byt5_in.fc2.weight"], p["byt5_in.fc2.bias"]))
    return linear(h, p["byt5_in.fc3.weight"], p["byt5_in.fc3.bias"])


def _add_cond_type(p, x, type_idx, cfg):
    """Condition-type embedding row added per token stream (reference
    add_condition_type, hunyuan.hpp:392)."""
    if not cfg.use_cond_type_embedding:
        return x
    return x + p["cond_type_embedding.weight"][type_idx][None, None].astype(x.dtype)


def hunyuan_prologue(p, x, timesteps, context, guidance, cfg,
                     timestep_r=None, context_byt5=None):
    """Embedding stage (patchify + token refiner + time/guidance vec + RoPE)
    — the resident prefix for the weight-streamed forward.
    context_byt5: [B, Lb, byt5_in_dim] glyph states joined to the text
    stream (reference hunyuan.hpp:452-456).
    Returns (img, txt, vec, rot, dims)."""
    b, t, hh, ww, c = x.shape
    pt, ph, pw = cfg.patch_size
    hid = cfg.hidden_size
    pad_t, pad_h, pad_w = (-t) % pt, (-hh) % ph, (-ww) % pw
    if pad_t or pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_t), (0, pad_h), (0, pad_w), (0, 0)))
    tl, hl, wl = (t + pad_t) // pt, (hh + pad_h) // ph, (ww + pad_w) // pw

    img = x.reshape(b, tl, pt, hl, ph, wl, pw, c)
    img = img.transpose(0, 1, 3, 5, 7, 2, 4, 6).reshape(b, tl * hl * wl, c * pt * ph * pw)
    w_patch = p["img_in.proj.weight"].reshape(hid, -1)
    img = linear(img, w_patch, p["img_in.proj.bias"])

    txt, _ = _token_refiner(p, context.astype(x.dtype), timesteps, cfg)
    if cfg.use_byt5 and context_byt5 is not None:
        # glyph tokens join the text stream; the cond-type variant puts them
        # FIRST (reference hunyuan.hpp:455-456)
        txt = _add_cond_type(p, txt, 0, cfg)
        txt_byt5 = _add_cond_type(
            p, _byt5_mapper(p, context_byt5.astype(x.dtype)), 1, cfg)
        txt = (jnp.concatenate([txt_byt5, txt], axis=1)
               if cfg.use_cond_type_embedding
               else jnp.concatenate([txt, txt_byt5], axis=1))
    l_txt = txt.shape[1]

    t_emb = timestep_embedding(timesteps, 256).astype(x.dtype)
    vec = _mlp_embed(p, "time_in", t_emb)
    if cfg.use_meanflow and timestep_r is not None:
        tr_emb = timestep_embedding(timestep_r, 256).astype(x.dtype)
        vec = vec + _mlp_embed(p, "time_r_in", tr_emb)
        if not cfg.use_meanflow_sum:
            vec = vec * 0.5
    if cfg.guidance_embed and guidance is not None:
        g_emb = timestep_embedding(guidance, 256).astype(x.dtype)
        vec = vec + _mlp_embed(p, "guidance_in", g_emb)

    ids = np.zeros((l_txt + tl * hl * wl, 3), dtype=np.int64)
    ti, hi, wi = np.meshgrid(np.arange(tl), np.arange(hl), np.arange(wl), indexing="ij")
    ids[l_txt:, 0] = ti.reshape(-1)
    ids[l_txt:, 1] = hi.reshape(-1)
    ids[l_txt:, 2] = wi.reshape(-1)
    rot = jnp.asarray(rope_freqs(ids, cfg.axes_dim, cfg.theta))
    return img, txt, vec, rot, (b, t, hh, ww, tl, hl, wl)


def hunyuan_head(p, img, vec, dims, cfg):
    """Final adaLN + unpatchify; dims from hunyuan_prologue."""
    b, t, hh, ww, tl, hl, wl = dims
    pt, ph, pw = cfg.patch_size
    mf = linear(silu(vec), p["final_layer.adaLN_modulation.1.weight"],
                p["final_layer.adaLN_modulation.1.bias"])
    shift, scale = jnp.split(mf, 2, axis=-1)
    img = layer_norm(img, eps=1e-6) * (1 + scale[:, None]) + shift[:, None]
    img = linear(img, p["final_layer.linear.weight"], p["final_layer.linear.bias"])
    out = img.reshape(b, tl, hl, wl, cfg.out_channels, pt, ph, pw)
    out = out.transpose(0, 1, 5, 2, 6, 3, 7, 4).reshape(
        b, tl * pt, hl * ph, wl * pw, cfg.out_channels
    )
    return out[:, :t, :hh, :ww, :]


def hunyuan_forward(
    p,
    x: jnp.ndarray,
    timesteps: jnp.ndarray,
    context: jnp.ndarray,
    guidance: Optional[jnp.ndarray] = None,
    cfg: HunyuanVideoConfig = HUNYUAN_VIDEO_15_CONFIG,
    timestep_r: Optional[jnp.ndarray] = None,
    context_byt5: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """x: [B, T, H, W, C] video latent; timesteps: [B] (flow t, raw scale);
    context: [B, L, 3584] Qwen2.5-VL states → velocity [B, T, H, W, out].
    timestep_r: [B] next-step t for meanflow checkpoints (reference
    hunyuan_timestep_r, stable-diffusion.cpp:2564-2566).
    context_byt5: [B, Lb, 1472] byt5-small glyph states (quoted prompt
    text; reference conditioner.hpp:2662-2700)."""
    img, txt, vec, rot, dims = hunyuan_prologue(
        p, x, timesteps, context, guidance, cfg, timestep_r=timestep_r,
        context_byt5=context_byt5,
    )
    for i in range(cfg.depth):
        img, txt = hunyuan_double_block(p, f"double_blocks.{i}", img, txt,
                                        vec, rot, cfg)
    return hunyuan_head(p, img, vec, dims, cfg)


def init_hunyuan_params(cfg: HunyuanVideoConfig = HUNYUAN_VIDEO_15_CONFIG, seed: int = 0,
                        dtype=jnp.float32):
    g = np.random.default_rng(seed)
    hid = cfg.hidden_size
    d_head = hid // cfg.num_heads
    mlp_h = int(hid * cfg.mlp_ratio)
    pt, ph, pw = cfg.patch_size
    p = {}

    def lin(name, o, i, bias=True):
        p[f"{name}.weight"] = jnp.asarray(
            g.standard_normal((o, i), dtype=np.float32) * 0.02, dtype=dtype
        )
        if bias:
            p[f"{name}.bias"] = jnp.zeros((o,), dtype=dtype)

    def norm(name, n):
        p[f"{name}.weight"] = jnp.ones((n,), dtype=dtype)
        p[f"{name}.bias"] = jnp.zeros((n,), dtype=dtype)

    p["img_in.proj.weight"] = jnp.asarray(
        g.standard_normal((hid, cfg.in_channels, pt, ph, pw), dtype=np.float32) * 0.02,
        dtype=dtype,
    )
    p["img_in.proj.bias"] = jnp.zeros((hid,), dtype=dtype)
    lin("txt_in.input_embedder", hid, cfg.context_in_dim)
    for emb in ("t_embedder", "c_embedder"):
        dim_in = 256 if emb == "t_embedder" else cfg.context_in_dim
        lin(f"txt_in.{emb}.in_layer", hid, dim_in)
        lin(f"txt_in.{emb}.out_layer", hid, hid)
    for i in range(cfg.refiner_depth):
        pre = f"txt_in.individual_token_refiner.blocks.{i}"
        lin(f"{pre}.self_attn.qkv", 3 * hid, hid)
        lin(f"{pre}.self_attn.proj", hid, hid)
        norm(f"{pre}.norm1", hid)
        norm(f"{pre}.norm2", hid)
        lin(f"{pre}.mlp.0", 4 * hid, hid)
        lin(f"{pre}.mlp.2", hid, 4 * hid)
        lin(f"{pre}.adaLN_modulation.1", 2 * hid, hid)
    lin("time_in.in_layer", hid, 256)
    lin("time_in.out_layer", hid, hid)
    if cfg.use_meanflow:
        lin("time_r_in.in_layer", hid, 256)
        lin("time_r_in.out_layer", hid, hid)
    if cfg.guidance_embed:
        lin("guidance_in.in_layer", hid, 256)
        lin("guidance_in.out_layer", hid, hid)
    if cfg.use_byt5:
        norm("byt5_in.layernorm", cfg.byt5_in_dim)
        lin("byt5_in.fc1", 2048, cfg.byt5_in_dim)
        lin("byt5_in.fc2", 2048, 2048)
        lin("byt5_in.fc3", hid, 2048)
    if cfg.use_cond_type_embedding:
        p["cond_type_embedding.weight"] = jnp.asarray(
            g.standard_normal((3, hid), dtype=np.float32) * 0.02, dtype=dtype)
    for i in range(cfg.depth):
        for s in ("img", "txt"):
            pre = f"double_blocks.{i}.{s}"
            lin(f"{pre}_mod.lin", 6 * hid, hid)
            lin(f"{pre}_attn.qkv", 3 * hid, hid, bias=cfg.qkv_bias)
            p[f"{pre}_attn.norm.query_norm.scale"] = jnp.ones((d_head,), dtype=dtype)
            p[f"{pre}_attn.norm.key_norm.scale"] = jnp.ones((d_head,), dtype=dtype)
            lin(f"{pre}_attn.proj", hid, hid)
            lin(f"{pre}_mlp.0", mlp_h, hid)
            lin(f"{pre}_mlp.2", hid, mlp_h)
    lin("final_layer.adaLN_modulation.1", 2 * hid, hid)
    lin("final_layer.linear", cfg.out_channels * pt * ph * pw, hid)
    return p

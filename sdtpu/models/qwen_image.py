"""Qwen-Image — joint-stream rectified-flow DiT conditioned by Qwen2.5-VL
hidden states.

Reference analog: QwenImageModel/Runner (src/model/diffusion/qwen_image.hpp;
upstream QwenLM/Qwen-Image).  Checkpoint naming: ``transformer_blocks.N.
{attn.{to_q,to_k,to_v,to_out.0,add_{q,k,v}_proj,to_add_out,norm_q,norm_k,
norm_added_q,norm_added_k}, img_mod.1, txt_mod.1, img_norm1/2, txt_norm1/2,
img_mlp.net.{0.proj,2}, txt_mlp.net.{0.proj,2}}``, ``img_in``, ``txt_in``,
``txt_norm``, ``time_text_embed.timestep_embedder.linear_{1,2}``,
``norm_out.linear``, ``proj_out``.

Position ids: text tokens lead with scalar ids starting at max(h,w)/2;
image tokens use centered (h,w) grids (reference rope.hpp
gen_qwen_image_ids).  Attention's kv_scale f16-overflow guard in the
reference is an exact mathematical identity, omitted here (f32 softmax).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from sdtpu.models.flux import apply_rope, rope_freqs
from sdtpu.ops import attention, layer_norm, linear, rms_norm, timestep_embedding
from sdtpu.ops.basic import gelu_tanh, silu


@dataclasses.dataclass(frozen=True)
class QwenImageConfig:
    patch_size: int = 2
    in_channels: int = 64  # packed 16ch × 2×2
    out_channels: int = 16
    num_layers: int = 60
    head_dim: int = 128
    num_heads: int = 24
    joint_attention_dim: int = 3584
    theta: int = 10000
    axes_dim: Tuple[int, ...] = (16, 56, 56)
    # Mage-Flow variant (reference mage_flow.hpp): zero text ids, ceil-half
    # centered image grid, bf16-rounded timestep projection
    rope_scheme: str = "qwen"       # "qwen" | "mage"
    bf16_timestep: bool = False
    # QWEN_IMAGE_LAYERED (reference qwen_image.hpp:589-632): extra learned
    # addition_t embedding on the timestep, layered 5-D latent with the RoPE
    # time axis counting layers, ref latents indexed DECREASE
    use_additional_t_cond: bool = False
    # Qwen-Image-Edit 2509+ (reference qwen_image.hpp:27,319-343,460): ref
    # tokens are modulated with the t=0 embedding, main tokens with t
    zero_cond_t: bool = False


QWEN_IMAGE_CONFIG = QwenImageConfig()


def detect_qwen_image_config(names) -> QwenImageConfig:
    num_layers = 0
    for n in names:
        if "transformer_blocks." in n:
            idx = n.split("transformer_blocks.")[1].split(".")[0]
            num_layers = max(num_layers, int(idx) + 1)
    layered = any("addition_t_embedding" in n for n in names)
    zero_cond = any("__index_timestep_zero__" in n for n in names)
    return dataclasses.replace(
        QWEN_IMAGE_CONFIG, num_layers=num_layers or 60,
        use_additional_t_cond=layered, zero_cond_t=zero_cond,
    )


def _heads(x, nh, hd):
    b, l, _ = x.shape
    return x.reshape(b, l, nh, hd).transpose(0, 2, 1, 3)


def _joint_attention(p, pre, img, txt, rot, cfg):
    """Separate img/txt projections, per-head RMS q/k norm, joint attention
    over [txt; img] (reference QwenImageAttention, qwen_image.hpp:125)."""
    b, li, inner = img.shape
    lt = txt.shape[1]
    nh, hd = cfg.num_heads, cfg.head_dim

    iq = rms_norm(_heads(linear(img, p[f"{pre}.to_q.weight"], p[f"{pre}.to_q.bias"]), nh, hd),
                  p[f"{pre}.norm_q.weight"], eps=1e-6)
    ik = rms_norm(_heads(linear(img, p[f"{pre}.to_k.weight"], p[f"{pre}.to_k.bias"]), nh, hd),
                  p[f"{pre}.norm_k.weight"], eps=1e-6)
    iv = _heads(linear(img, p[f"{pre}.to_v.weight"], p[f"{pre}.to_v.bias"]), nh, hd)

    tq = rms_norm(_heads(linear(txt, p[f"{pre}.add_q_proj.weight"], p[f"{pre}.add_q_proj.bias"]), nh, hd),
                  p[f"{pre}.norm_added_q.weight"], eps=1e-6)
    tk = rms_norm(_heads(linear(txt, p[f"{pre}.add_k_proj.weight"], p[f"{pre}.add_k_proj.bias"]), nh, hd),
                  p[f"{pre}.norm_added_k.weight"], eps=1e-6)
    tv = _heads(linear(txt, p[f"{pre}.add_v_proj.weight"], p[f"{pre}.add_v_proj.bias"]), nh, hd)

    q = apply_rope(jnp.concatenate([tq, iq], axis=2), rot)
    k = apply_rope(jnp.concatenate([tk, ik], axis=2), rot)
    v = jnp.concatenate([tv, iv], axis=2)
    att = attention(q, k, v).transpose(0, 2, 1, 3).reshape(b, lt + li, inner)
    txt_out = linear(att[:, :lt], p[f"{pre}.to_add_out.weight"], p[f"{pre}.to_add_out.bias"])
    img_out = linear(att[:, lt:], p[f"{pre}.to_out.0.weight"], p[f"{pre}.to_out.0.bias"])
    return img_out, txt_out


def _ff(p, pre, x):
    """GELU(tanh) FeedForward: net.0.proj → gelu → net.2."""
    h = linear(x, p[f"{pre}.net.0.proj.weight"], p[f"{pre}.net.0.proj.bias"])
    return linear(gelu_tanh(h), p[f"{pre}.net.2.weight"], p[f"{pre}.net.2.bias"])


def qwen_image_forward(
    p,
    x: jnp.ndarray,
    timesteps: jnp.ndarray,
    context: jnp.ndarray,
    cfg: QwenImageConfig = QWEN_IMAGE_CONFIG,
    ref_latents=None,
) -> jnp.ndarray:
    """x: [B, H, W, 16] latent NHWC — or [B, T, H, W, 16] for the layered
    variant (T = layers+1; reference VERSION_QWEN_IMAGE_LAYERED latent,
    stable-diffusion.cpp:4819); timesteps: [B] in [0,1]; context:
    [B, L, 3584] Qwen2.5-VL hidden states → velocity (same layout as x).
    ref_latents: list of [B, rh, rw, 16] edit reference latents appended to
    the image token stream with incrementing rope indices (reference
    QwenImageModel::forward ref concat, qwen_image.hpp:530-535; DECREASE
    indices for the layered variant)."""
    layered = x.ndim == 5
    if layered:
        b, nt, h, w, c = x.shape
    else:
        b, h, w, c = x.shape
        nt = 1
    ps = cfg.patch_size
    hp, wp = h // ps, w // ps
    inner = cfg.num_heads * cfg.head_dim

    def _patchify(t):
        tb, th, tw, tc = t.shape
        return (t.reshape(tb, th // ps, ps, tw // ps, ps, tc)
                .transpose(0, 1, 3, 2, 4, 5)
                .reshape(tb, (th // ps) * (tw // ps), ps * ps * tc))

    if layered:
        # token order (t, h, w): each layer patchified then concatenated
        # (reference gen_vid_ids ordering, rope.hpp:518-527)
        img = jnp.concatenate([_patchify(x[:, ti]) for ti in range(nt)], axis=1)
    else:
        img = _patchify(x)
    n_img = img.shape[1]
    ref_shapes = []
    if ref_latents:
        parts = [img]
        for ref in ref_latents:
            parts.append(_patchify(ref.astype(x.dtype)))
            ref_shapes.append((ref.shape[1] // ps, ref.shape[2] // ps))
        img = jnp.concatenate(parts, axis=1)
    img = linear(img, p["img_in.weight"], p["img_in.bias"])
    txt = rms_norm(context.astype(x.dtype), p["txt_norm.weight"], eps=1e-6)
    txt = linear(txt, p["txt_in.weight"], p["txt_in.bias"])
    lt = txt.shape[1]

    if cfg.bf16_timestep:
        # Mage-Flow was trained with bf16-rounded sinusoid frequencies
        # (MageFlowTimestepProjEmbeddings, mage_flow.hpp:13)
        half = 128
        freqs = np.exp(-np.log(10000.0) * np.arange(half, dtype=np.float32) / half)
        freqs = jnp.asarray(freqs).astype(jnp.bfloat16).astype(jnp.float32)
        sig = (timesteps.astype(jnp.float32) / 1000.0).astype(jnp.bfloat16).astype(jnp.float32)
        arg = sig[:, None] * freqs[None] * 1000.0
        cos = jnp.cos(arg).astype(jnp.bfloat16).astype(jnp.float32)
        sin = jnp.sin(arg).astype(jnp.bfloat16).astype(jnp.float32)
        t_emb = jnp.concatenate([cos, sin], axis=-1).astype(x.dtype)
    else:
        t_emb = timestep_embedding(timesteps * 1000.0, 256).astype(x.dtype)
    pre = "time_text_embed.timestep_embedder"

    def _temb_of(emb):
        h = linear(emb, p[f"{pre}.linear_1.weight"], p[f"{pre}.linear_1.bias"])
        return linear(silu(h), p[f"{pre}.linear_2.weight"], p[f"{pre}.linear_2.bias"])

    temb = _temb_of(t_emb)
    temb0 = zero_sel = None
    if cfg.zero_cond_t:
        # t=0 modulation stream for reference-image tokens (reference
        # forward_orig t_emb concat + get_mod_params_vec per-token select,
        # qwen_image.hpp:460-462, 319-343)
        temb0 = _temb_of(
            timestep_embedding(jnp.zeros_like(timesteps), 256).astype(x.dtype)
        )
        idx = np.concatenate([
            np.zeros(n_img, dtype=np.float32),
            np.ones(sum(rh * rw for rh, rw in ref_shapes), dtype=np.float32),
        ])
        zero_sel = jnp.asarray(idx)[None, :, None]
    if cfg.use_additional_t_cond:
        # layered variant: learned addition_t embedding, cond index 0
        # (reference QwenTimestepProjEmbeddings, qwen_image.hpp:95-120)
        temb = temb + p["time_text_embed.addition_t_embedding.weight"][0].astype(
            temb.dtype
        )

    n_ref_tok = sum(rh * rw for rh, rw in ref_shapes)
    ids = np.zeros((lt + nt * hp * wp + n_ref_tok, 3), dtype=np.float64)
    if cfg.rope_scheme == "mage":
        # Mage-Flow: zero text ids, image grid centered with ceil-half offset
        # (gen_mage_flow_pe, rope.hpp:657)
        hi, wi = np.meshgrid(
            np.arange(hp) - (hp - hp // 2), np.arange(wp) - (wp - wp // 2),
            indexing="ij")
    else:
        # position ids: txt scalar run starting at max(h,w)/2; img centered
        # grid (reference gen_qwen_image_ids, rope.hpp)
        txt_start = max(hp, wp) // 2
        ids[:lt] = (txt_start + np.arange(lt))[:, None]
        hi, wi = np.meshgrid(
            np.arange(hp) - hp // 2, np.arange(wp) - wp // 2, indexing="ij")
    # image tokens: per-layer grids with axis-0 = layer index (gen_vid_ids)
    for ti in range(nt):
        o = lt + ti * hp * wp
        ids[o:o + hp * wp, 0] = ti
        ids[o:o + hp * wp, 1] = hi.reshape(-1)
        ids[o:o + hp * wp, 2] = wi.reshape(-1)
    # ref latents: axis-0 index incrementing from 1 (INCREASE) or
    # decrementing from -1 (DECREASE — layered variant), centered grids
    # (reference gen_refs_ids, rope.hpp:350-396)
    off = lt + nt * hp * wp
    for ri, (rh, rw) in enumerate(ref_shapes):
        rhi, rwi = np.meshgrid(np.arange(rh) - rh // 2,
                               np.arange(rw) - rw // 2, indexing="ij")
        n = rh * rw
        ids[off:off + n, 0] = -(ri + 1) if cfg.use_additional_t_cond else ri + 1
        ids[off:off + n, 1] = rhi.reshape(-1)
        ids[off:off + n, 2] = rwi.reshape(-1)
        off += n
    rot = jnp.asarray(rope_freqs(ids, cfg.axes_dim, cfg.theta))

    for i in range(cfg.num_layers):
        blk = f"transformer_blocks.{i}"
        im = linear(silu(temb), p[f"{blk}.img_mod.1.weight"], p[f"{blk}.img_mod.1.bias"])
        tm = linear(silu(temb), p[f"{blk}.txt_mod.1.weight"], p[f"{blk}.txt_mod.1.bias"])
        im = [m[:, None] for m in jnp.split(im, 6, axis=-1)]
        tm = [m[:, None] for m in jnp.split(tm, 6, axis=-1)]
        if zero_sel is not None:
            im0 = linear(silu(temb0), p[f"{blk}.img_mod.1.weight"],
                         p[f"{blk}.img_mod.1.bias"])
            im0 = [m[:, None] for m in jnp.split(im0, 6, axis=-1)]
            # main tokens (sel 0) keep the t mods; ref tokens (sel 1) use t=0
            im = [a * (1.0 - zero_sel) + b0 * zero_sel
                  for a, b0 in zip(im, im0)]

        img_n = layer_norm(img, eps=1e-6) * (1 + im[1]) + im[0]
        txt_n = layer_norm(txt, eps=1e-6) * (1 + tm[1]) + tm[0]
        img_att, txt_att = _joint_attention(p, f"{blk}.attn", img_n, txt_n, rot, cfg)
        img = img + img_att * im[2]
        txt = txt + txt_att * tm[2]

        img_n = layer_norm(img, eps=1e-6) * (1 + im[4]) + im[3]
        txt_n = layer_norm(txt, eps=1e-6) * (1 + tm[4]) + tm[3]
        img = img + _ff(p, f"{blk}.img_mlp", img_n) * im[5]
        txt = txt + _ff(p, f"{blk}.txt_mlp", txt_n) * tm[5]

    img = img[:, :n_img]  # drop ref tokens (reference out slice, :541)
    # AdaLayerNormContinuous: note (scale, shift) chunk order
    # (reference qwen_image.hpp:407-414)
    m = linear(silu(temb), p["norm_out.linear.weight"], p["norm_out.linear.bias"])
    sc, sh = jnp.split(m, 2, axis=-1)
    img = layer_norm(img, eps=1e-6) * (1 + sc[:, None]) + sh[:, None]
    img = linear(img, p["proj_out.weight"], p["proj_out.bias"])

    out = img.reshape(b, nt, hp, wp, ps, ps, cfg.out_channels)
    out = out.transpose(0, 1, 2, 4, 3, 5, 6).reshape(b, nt, h, w, cfg.out_channels)
    return out if layered else out[:, 0]


def init_qwen_image_params(cfg: QwenImageConfig = QWEN_IMAGE_CONFIG, seed: int = 0,
                           dtype=jnp.float32):
    g = np.random.default_rng(seed)
    inner = cfg.num_heads * cfg.head_dim
    p = {}

    def lin(name, o, i):
        p[f"{name}.weight"] = jnp.asarray(
            g.standard_normal((o, i), dtype=np.float32) * 0.02, dtype=dtype
        )
        p[f"{name}.bias"] = jnp.zeros((o,), dtype=dtype)

    lin("img_in", inner, cfg.in_channels)
    lin("txt_in", inner, cfg.joint_attention_dim)
    p["txt_norm.weight"] = jnp.ones((cfg.joint_attention_dim,), dtype=dtype)
    lin("time_text_embed.timestep_embedder.linear_1", inner, 256)
    lin("time_text_embed.timestep_embedder.linear_2", inner, inner)
    if cfg.use_additional_t_cond:
        p["time_text_embed.addition_t_embedding.weight"] = jnp.asarray(
            g.standard_normal((2, inner), dtype=np.float32) * 0.02, dtype=dtype
        )
    for i in range(cfg.num_layers):
        blk = f"transformer_blocks.{i}"
        lin(f"{blk}.img_mod.1", 6 * inner, inner)
        lin(f"{blk}.txt_mod.1", 6 * inner, inner)
        for ln in ("to_q", "to_k", "to_v", "to_out.0", "add_q_proj", "add_k_proj",
                   "add_v_proj", "to_add_out"):
            lin(f"{blk}.attn.{ln}", inner, inner)
        for nn in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            p[f"{blk}.attn.{nn}.weight"] = jnp.ones((cfg.head_dim,), dtype=dtype)
        for s in ("img_mlp", "txt_mlp"):
            lin(f"{blk}.{s}.net.0.proj", 4 * inner, inner)
            lin(f"{blk}.{s}.net.2", inner, 4 * inner)
    lin("norm_out.linear", 2 * inner, inner)
    lin("proj_out", cfg.patch_size * cfg.patch_size * cfg.out_channels, inner)
    return p

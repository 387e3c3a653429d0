"""Lens: a qwen-image-style joint img/txt DiT over FLUX.2-family packed
latents (128-ch), conditioned on four selected GPT-OSS hidden-state layers
that are per-layer RMS-normed and concatenated.

Reference analog: Lens::LensModel / LensRunner
(src/model/diffusion/lens.hpp:277,353).  Checkpoint names: ``img_in``,
``txt_in``, ``txt_norm.K``, ``time_text_embed.timestep_embedder.linear_{1,2}``,
``transformer_blocks.N.{img_mod.1, txt_mod.1, img_norm{1,2}, txt_norm{1,2},
img_mlp.{w1,w2,w3}, txt_mlp.{w1,w2,w3}, attn.{img_qkv, txt_qkv, norm_q,
norm_k, norm_added_q, norm_added_k, to_out.0, to_add_out}}``,
``norm_out.linear``, ``proj_out``.

RoPE ids: image grid centered at 0 (scale_rope), text positions following at
max(h,w)/2 on all three axes (Rope::gen_lens_ids, rope.hpp:694); image tokens
come FIRST in the joint sequence.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from sdtpu.models.flux import apply_rope, rope_freqs
from sdtpu.ops import attention, layer_norm, linear, rms_norm, timestep_embedding
from sdtpu.ops.basic import silu


@dataclasses.dataclass(frozen=True)
class LensConfig:
    patch_size: int = 2           # packing factor inside the 128-ch latent
    in_channels: int = 128
    out_channels: int = 32
    num_layers: int = 48
    head_dim: int = 64
    num_heads: int = 24
    joint_attention_dim: int = 2880
    selected_layer_count: int = 4
    theta: int = 10000
    axes_dim: Tuple[int, ...] = (8, 28, 28)


LENS_CONFIG = LensConfig()


def detect_lens_config(names, shapes) -> LensConfig:
    """Reference LensConfig::detect_from_weights (lens.hpp:29)."""
    names = set(names)
    kw = {}
    nq = shapes.get("transformer_blocks.0.attn.norm_q.weight")
    hd = nq[0] if nq else 64
    kw["head_dim"] = hd
    ii = shapes.get("img_in.weight")
    if ii:
        kw["in_channels"] = ii[1]
        kw["num_heads"] = ii[0] // hd
    ti = shapes.get("txt_in.weight")
    jad = LENS_CONFIG.joint_attention_dim
    if ti:
        kw["selected_layer_count"] = ti[1] // jad
    po = shapes.get("proj_out.weight")
    if po:
        kw["out_channels"] = po[0] // 4
    layers = 0
    for n in names:
        if n.startswith("transformer_blocks."):
            layers = max(layers, int(n.split(".")[1]) + 1)
    kw["num_layers"] = layers or 48
    return dataclasses.replace(LENS_CONFIG, **kw)


def lens_rope(hl: int, wl: int, n_txt: int, cfg: LensConfig):
    """img grid centered at 0, then text ids = linspace(start, n_txt+start)
    on all axes with start = max(hl, wl)//2 (gen_lens_ids, rope.hpp:694)."""
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
    return jnp.asarray(rope_freqs(ids, cfg.axes_dim, cfg.theta))


def _gate_mlp(p, pre, x):
    gate = silu(linear(x, p[f"{pre}.w1.weight"]))
    up = linear(x, p[f"{pre}.w3.weight"])
    return linear(gate * up, p[f"{pre}.w2.weight"])


def _joint_attn(p, pre, img, txt, rot, cfg: LensConfig):
    """LensJointAttention (lens.hpp:112): separate img/txt fused qkv with
    per-head RMS qk norms, joint attention with img tokens first."""
    b, li, _ = img.shape
    lt = txt.shape[1]
    nh, hd = cfg.num_heads, cfg.head_dim

    def qkv(x, name, qn, kn, l):
        v3 = linear(x, p[f"{pre}.{name}.weight"], p.get(f"{pre}.{name}.bias"))
        q, k, v = jnp.split(v3, 3, axis=-1)
        q = rms_norm(q.reshape(b, l, nh, hd), p[f"{pre}.{qn}.weight"], eps=1e-5)
        k = rms_norm(k.reshape(b, l, nh, hd), p[f"{pre}.{kn}.weight"], eps=1e-5)
        return (q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.reshape(b, l, nh, hd).transpose(0, 2, 1, 3))

    iq, ik, iv = qkv(img, "img_qkv", "norm_q", "norm_k", li)
    tq, tk, tv = qkv(txt, "txt_qkv", "norm_added_q", "norm_added_k", lt)
    q = jnp.concatenate([iq, tq], axis=2)
    k = jnp.concatenate([ik, tk], axis=2)
    v = jnp.concatenate([iv, tv], axis=2)
    q = apply_rope(q, rot)
    k = apply_rope(k, rot)
    o = attention(q, k, v)
    o = o.transpose(0, 2, 1, 3).reshape(b, li + lt, nh * hd)
    img_o = linear(o[:, :li], p[f"{pre}.to_out.0.weight"],
                   p.get(f"{pre}.to_out.0.bias"))
    txt_o = linear(o[:, li:], p[f"{pre}.to_add_out.weight"],
                   p.get(f"{pre}.to_add_out.bias"))
    return img_o, txt_o


def _block(p, pre, img, txt, t_emb, rot, cfg: LensConfig):
    """LensTransformerBlock (lens.hpp:198): 6-way modulation from silu(t_emb)
    per stream, RMS norms, gated swiglu MLPs."""
    temb = silu(t_emb)
    imod = linear(temb, p[f"{pre}.img_mod.1.weight"], p.get(f"{pre}.img_mod.1.bias"))
    tmod = linear(temb, p[f"{pre}.txt_mod.1.weight"], p.get(f"{pre}.txt_mod.1.bias"))
    im = jnp.split(imod[:, None], 6, axis=-1)
    tm = jnp.split(tmod[:, None], 6, axis=-1)

    img_n = rms_norm(img, p[f"{pre}.img_norm1.weight"], eps=1e-6)
    img_n = img_n * (1.0 + im[1]) + im[0]
    txt_n = rms_norm(txt, p[f"{pre}.txt_norm1.weight"], eps=1e-6)
    txt_n = txt_n * (1.0 + tm[1]) + tm[0]
    ia, ta = _joint_attn(p, f"{pre}.attn", img_n, txt_n, rot, cfg)
    img = img + ia * im[2]
    txt = txt + ta * tm[2]

    img_n = rms_norm(img, p[f"{pre}.img_norm2.weight"], eps=1e-6)
    img_n = img_n * (1.0 + im[4]) + im[3]
    txt_n = rms_norm(txt, p[f"{pre}.txt_norm2.weight"], eps=1e-6)
    txt_n = txt_n * (1.0 + tm[4]) + tm[3]
    img = img + _gate_mlp(p, f"{pre}.img_mlp", img_n) * im[5]
    txt = txt + _gate_mlp(p, f"{pre}.txt_mlp", txt_n) * tm[5]
    return img, txt


def lens_forward(
    p,
    x: jnp.ndarray,
    timesteps: jnp.ndarray,
    context: jnp.ndarray,
    cfg: LensConfig = LENS_CONFIG,
) -> jnp.ndarray:
    """x: [B, H, W, 128] packed FLUX.2 latent; timesteps: [B] raw t (x1000
    sinusoid scaling is internal); context: [B, L, selected*2880] stacked
    GPT-OSS hidden layers."""
    b, hl, wl, c = x.shape
    inner = cfg.num_heads * cfg.head_dim

    img = x.reshape(b, hl * wl, c)
    img = linear(img, p["img_in.weight"], p.get("img_in.bias"))

    # reference: ggml_ext_timestep_embedding(t, 256, 10000, 1000) — flow t
    # scaled by 1000 before the sinusoid (lens.hpp:88)
    t_freq = timestep_embedding(timesteps * 1000.0, 256).astype(img.dtype)
    t_emb = linear(t_freq, p["time_text_embed.timestep_embedder.linear_1.weight"],
                   p["time_text_embed.timestep_embedder.linear_1.bias"])
    t_emb = linear(silu(t_emb),
                   p["time_text_embed.timestep_embedder.linear_2.weight"],
                   p["time_text_embed.timestep_embedder.linear_2.bias"])

    # per-selected-layer RMS norm then re-concat (lens.hpp:323-330)
    chunks = jnp.split(context, cfg.selected_layer_count, axis=-1)
    txt = jnp.concatenate(
        [rms_norm(ck, p[f"txt_norm.{i}.weight"], eps=1e-5)
         for i, ck in enumerate(chunks)], axis=-1)
    txt = linear(txt, p["txt_in.weight"], p.get("txt_in.bias"))

    rot = lens_rope(hl, wl, txt.shape[1], cfg)
    for i in range(cfg.num_layers):
        img, txt = _block(p, f"transformer_blocks.{i}", img, txt, t_emb, rot, cfg)

    # AdaLayerNormContinuous (lens.hpp:258): scale/shift from silu(t_emb)
    mods = linear(silu(t_emb), p["norm_out.linear.weight"],
                  p.get("norm_out.linear.bias"))
    scale, shift = jnp.split(mods[:, None], 2, axis=-1)
    img = layer_norm(img, eps=1e-6)
    img = img * (1.0 + scale) + shift
    img = linear(img, p["proj_out.weight"], p.get("proj_out.bias"))
    return img.reshape(b, hl, wl, -1)


def init_lens_params(cfg: LensConfig, seed: int = 0, dtype=jnp.float32) -> dict:
    g = np.random.default_rng(seed)

    def wt(*shape, scale=0.02):
        return jnp.asarray(g.standard_normal(shape, dtype=np.float32) * scale,
                           dtype=dtype)

    def lin(p, pre, din, dout, bias=True):
        p[f"{pre}.weight"] = wt(dout, din)
        if bias:
            p[f"{pre}.bias"] = jnp.zeros((dout,), dtype=dtype)

    inner = cfg.num_heads * cfg.head_dim
    mlp_hidden = inner // 3 * 8
    p: dict = {}
    lin(p, "img_in", cfg.in_channels, inner)
    lin(p, "txt_in", cfg.joint_attention_dim * cfg.selected_layer_count, inner)
    for i in range(cfg.selected_layer_count):
        p[f"txt_norm.{i}.weight"] = jnp.ones((cfg.joint_attention_dim,), dtype=dtype)
    lin(p, "time_text_embed.timestep_embedder.linear_1", 256, inner)
    lin(p, "time_text_embed.timestep_embedder.linear_2", inner, inner)
    for i in range(cfg.num_layers):
        pre = f"transformer_blocks.{i}"
        lin(p, f"{pre}.img_mod.1", inner, 6 * inner)
        lin(p, f"{pre}.txt_mod.1", inner, 6 * inner)
        for nm in ("img_norm1", "img_norm2", "txt_norm1", "txt_norm2"):
            p[f"{pre}.{nm}.weight"] = jnp.ones((inner,), dtype=dtype)
        for s in ("img_mlp", "txt_mlp"):
            lin(p, f"{pre}.{s}.w1", inner, mlp_hidden, bias=False)
            lin(p, f"{pre}.{s}.w2", mlp_hidden, inner, bias=False)
            lin(p, f"{pre}.{s}.w3", inner, mlp_hidden, bias=False)
        lin(p, f"{pre}.attn.img_qkv", inner, 3 * inner)
        lin(p, f"{pre}.attn.txt_qkv", inner, 3 * inner)
        for nm in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            p[f"{pre}.attn.{nm}.weight"] = jnp.ones((cfg.head_dim,), dtype=dtype)
        lin(p, f"{pre}.attn.to_out.0", inner, inner)
        lin(p, f"{pre}.attn.to_add_out", inner, inner)
    lin(p, "norm_out.linear", inner, 2 * inner)
    lin(p, "proj_out", inner, cfg.patch_size**2 * cfg.out_channels)
    return p

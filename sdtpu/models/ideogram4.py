"""Ideogram4: a single-stream joint txt/img DiT over FLUX.2-family packed
latents with tanh-gated scale-only adaLN from a 512-d projected timestep,
interleaved M-RoPE (t/h/w frequencies cycling every 3 slots), an
image-indicator embedding, and a 13-layer interleaved LLM conditioning
stack.  Checkpoints may carry a second full ``uncond`` transformer used for
the negative branch.

Reference analog: Ideogram4::Ideogram4Transformer / Ideogram4Runner
(src/model/diffusion/ideogram4.hpp:354,433).  Checkpoint names:
``input_proj``, ``llm_cond_norm``, ``llm_cond_proj``, ``t_embedding.
{mlp_in,mlp_out}``, ``adaln_proj``, ``embed_image_indicator``, ``layers.N.
{attention.{qkv,norm_q,norm_k,o}, feed_forward.{w1,w2,w3},
attention_norm{1,2}, ffn_norm{1,2}, adaln_modulation}``, ``final_layer.
{norm_final,linear,adaln_modulation}``; the uncond model repeats everything
under ``uncond.``.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from sdtpu.ops import attention, layer_norm, linear, rms_norm, timestep_embedding
from sdtpu.ops.basic import silu

IMAGE_POSITION_OFFSET = 65536
LLM_HIDDEN_STATE_LAYERS = 13


@dataclasses.dataclass(frozen=True)
class Ideogram4Config:
    emb_dim: int = 4608
    num_layers: int = 34
    num_heads: int = 18
    intermediate_size: int = 12288
    adaln_dim: int = 512
    in_channels: int = 128
    llm_features_dim: int = 53248
    rope_theta: float = 5000000.0
    norm_eps: float = 1e-5
    patch_size: int = 2
    ae_channels: int = 32
    mrope_section: Tuple[int, int, int] = (24, 20, 20)
    llm_layers: int = LLM_HIDDEN_STATE_LAYERS


IDEOGRAM4_CONFIG = Ideogram4Config()


def detect_ideogram4_config(names, shapes) -> Ideogram4Config:
    names = set(names)
    kw = {}
    layers = 0
    for n in names:
        if n.startswith("layers."):
            layers = max(layers, int(n.split(".")[1]) + 1)
    if layers:
        kw["num_layers"] = layers
    ip = shapes.get("input_proj.weight")
    if ip:
        kw["emb_dim"], kw["in_channels"] = ip
    lc = shapes.get("llm_cond_proj.weight")
    if lc:
        kw["llm_features_dim"] = lc[1]
    nq = shapes.get("layers.0.attention.norm_q.weight")
    if nq and ip:
        kw["num_heads"] = ip[0] // nq[0]
    w1 = shapes.get("layers.0.feed_forward.w1.weight")
    if w1:
        kw["intermediate_size"] = w1[0]
    ap = shapes.get("adaln_proj.weight")
    if ap:
        kw["adaln_dim"] = ap[0]
    return dataclasses.replace(IDEOGRAM4_CONFIG, **kw)


def ideogram4_rope(grid_h: int, grid_w: int, n_txt: int, cfg: Ideogram4Config):
    """(cos, sin) [S, head_dim/2] for non-interleaved (split-half) rotation.
    Text ids count 0..L-1 on every axis; image ids are offset by 65536 with
    an (h, w) grid.  Frequency slot j takes axis j%3 while j < section*3
    (embed_interleaved_mrope, rope.hpp:258; gen_ideogram4_pe,
    ideogram4.hpp:148)."""
    hd = cfg.emb_dim // cfg.num_heads
    half = hd // 2
    n_img = grid_h * grid_w
    ids = np.zeros((n_txt + n_img, 3), dtype=np.float64)
    ids[:n_txt, 0] = ids[:n_txt, 1] = ids[:n_txt, 2] = np.arange(n_txt)
    ii, jj = np.meshgrid(np.arange(grid_h), np.arange(grid_w), indexing="ij")
    ids[n_txt:, 0] = IMAGE_POSITION_OFFSET
    ids[n_txt:, 1] = IMAGE_POSITION_OFFSET + ii.reshape(-1)
    ids[n_txt:, 2] = IMAGE_POSITION_OFFSET + jj.reshape(-1)

    omega = 1.0 / (cfg.rope_theta ** (np.arange(half, dtype=np.float64) / half))
    axis_sel = np.zeros((half,), dtype=np.int64)
    for axis in (1, 2):
        length = min(cfg.mrope_section[axis] * 3, half)
        sel = np.arange(axis, length, 3)
        axis_sel[sel] = axis
    pos = ids[np.arange(ids.shape[0])[:, None], axis_sel[None, :]]  # [S, half]
    ang = pos * omega[None, :]
    return (jnp.asarray(np.cos(ang).astype(np.float32)),
            jnp.asarray(np.sin(ang).astype(np.float32)))


def _apply_rope_halves(x, cos, sin):
    """Non-interleaved rotation: pairs (i, i + d/2). x: [B, H, S, D]."""
    d = x.shape[-1]
    half = d // 2
    xf = x.astype(jnp.float32)
    x1, x2 = xf[..., :half], xf[..., half:]
    o1 = x1 * cos[None, None] - x2 * sin[None, None]
    o2 = x1 * sin[None, None] + x2 * cos[None, None]
    return jnp.concatenate([o1, o2], axis=-1).astype(x.dtype)


def _attn(p, pre, x, cos, sin, cfg: Ideogram4Config):
    b, s, _ = x.shape
    nh = cfg.num_heads
    hd = cfg.emb_dim // nh
    qkv = linear(x, p[f"{pre}.qkv.weight"])
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = rms_norm(q.reshape(b, s, nh, hd), p[f"{pre}.norm_q.weight"], eps=cfg.norm_eps)
    k = rms_norm(k.reshape(b, s, nh, hd), p[f"{pre}.norm_k.weight"], eps=cfg.norm_eps)
    q = _apply_rope_halves(q.transpose(0, 2, 1, 3), cos, sin)
    k = _apply_rope_halves(k.transpose(0, 2, 1, 3), cos, sin)
    v = v.reshape(b, s, nh, hd).transpose(0, 2, 1, 3)
    o = attention(q, k, v).transpose(0, 2, 1, 3).reshape(b, s, nh * hd)
    return linear(o, p[f"{pre}.o.weight"])


def ideogram4_forward(
    p,
    x: jnp.ndarray,
    timesteps: jnp.ndarray,
    context,
    cfg: Ideogram4Config = IDEOGRAM4_CONFIG,
    prefix: str = "",
) -> jnp.ndarray:
    """x: [B, h, w, 128] packed latent ((ae, ph, pw) channel order);
    timesteps: [B] (caller passes 1000 - t, see prepare_sample_timesteps);
    context: [B, L, 13*llm_hidden] stacked LLM layers (layer-major) or None
    for checkpoints with a separate uncond transformer (pass prefix="uncond.").
    """
    def key(n):
        return prefix + n

    b, hh, ww, c = x.shape
    ae, ps = cfg.ae_channels, cfg.patch_size
    n_img = hh * ww

    # packed (ae, ph, pw) -> token feature (ph, pw, ae) (patchify,
    # ideogram4.hpp:106)
    img = x.reshape(b, hh, ww, ae, ps, ps).transpose(0, 1, 2, 4, 5, 3)
    img = img.reshape(b, n_img, c)
    img = linear(img, p[key("input_proj.weight")], p.get(key("input_proj.bias")))

    n_txt = 0
    hseq = img
    if context is not None:
        lh = context.shape[-1] // cfg.llm_layers
        # layer-major -> interleaved (hidden, layers)
        txt = context.reshape(b, context.shape[1], cfg.llm_layers, lh)
        txt = txt.transpose(0, 1, 3, 2).reshape(b, context.shape[1], -1)
        txt = rms_norm(txt, p[key("llm_cond_norm.weight")], eps=1e-6)
        txt = linear(txt, p[key("llm_cond_proj.weight")],
                     p.get(key("llm_cond_proj.bias")))
        n_txt = txt.shape[1]
        hseq = jnp.concatenate([txt, img], axis=1)

    indicator = jnp.concatenate([
        jnp.zeros((n_txt,), jnp.int32), jnp.ones((n_img,), jnp.int32)])
    hseq = hseq + p[key("embed_image_indicator.weight")][indicator][None].astype(hseq.dtype)

    # timestep: sinusoid at 10x time factor, [sin|cos] order
    # (timestep_embedding_sin_cos, ideogram4.hpp:71)
    t_emb = timestep_embedding(timesteps * 10.0, cfg.emb_dim,
                               flip_sin_to_cos=False).astype(hseq.dtype)
    t_emb = silu(linear(t_emb, p[key("t_embedding.mlp_in.weight")],
                        p[key("t_embedding.mlp_in.bias")]))
    t_emb = linear(t_emb, p[key("t_embedding.mlp_out.weight")],
                   p[key("t_embedding.mlp_out.bias")])
    adaln = silu(linear(t_emb, p[key("adaln_proj.weight")],
                        p[key("adaln_proj.bias")]))

    cos, sin = ideogram4_rope(hh, ww, n_txt, cfg)
    for i in range(cfg.num_layers):
        pre = key(f"layers.{i}")
        mods = linear(adaln, p[f"{pre}.adaln_modulation.weight"],
                      p[f"{pre}.adaln_modulation.bias"])
        sc_msa, g_msa, sc_mlp, g_mlp = jnp.split(mods[:, None], 4, axis=-1)
        h = rms_norm(hseq, p[f"{pre}.attention_norm1.weight"], eps=cfg.norm_eps)
        h = h * (1.0 + sc_msa)
        h = _attn(p, f"{pre}.attention", h, cos, sin, cfg)
        h = rms_norm(h, p[f"{pre}.attention_norm2.weight"], eps=cfg.norm_eps)
        hseq = hseq + h * jnp.tanh(g_msa)
        h = rms_norm(hseq, p[f"{pre}.ffn_norm1.weight"], eps=cfg.norm_eps)
        h = h * (1.0 + sc_mlp)
        h = linear(silu(linear(h, p[f"{pre}.feed_forward.w1.weight"])) *
                   linear(h, p[f"{pre}.feed_forward.w3.weight"]),
                   p[f"{pre}.feed_forward.w2.weight"])
        h = rms_norm(h, p[f"{pre}.ffn_norm2.weight"], eps=cfg.norm_eps)
        hseq = hseq + h * jnp.tanh(g_mlp)

    scale = linear(silu(adaln), p[key("final_layer.adaln_modulation.weight")],
                   p[key("final_layer.adaln_modulation.bias")])
    out = layer_norm(hseq, eps=1e-6)
    out = out * (1.0 + scale[:, None])
    out = linear(out, p[key("final_layer.linear.weight")],
                 p.get(key("final_layer.linear.bias")))
    out = out[:, n_txt:]

    out = out.reshape(b, hh, ww, ps, ps, ae).transpose(0, 1, 2, 5, 3, 4)
    out = out.reshape(b, hh, ww, c)
    return -out  # negated velocity (ideogram4.hpp:428)


def init_ideogram4_params(cfg: Ideogram4Config, seed: int = 0,
                          dtype=jnp.float32, prefix: str = "") -> dict:
    g = np.random.default_rng(seed)

    def wt(*shape, scale=0.02):
        return jnp.asarray(g.standard_normal(shape, dtype=np.float32) * scale,
                           dtype=dtype)

    def lin(p, pre, din, dout, bias=True):
        p[f"{prefix}{pre}.weight"] = wt(dout, din)
        if bias:
            p[f"{prefix}{pre}.bias"] = jnp.zeros((dout,), dtype=dtype)

    hid = cfg.emb_dim
    hd = hid // cfg.num_heads
    p: dict = {}
    lin(p, "input_proj", cfg.in_channels, hid)
    p[f"{prefix}llm_cond_norm.weight"] = jnp.ones((cfg.llm_features_dim,), dtype=dtype)
    lin(p, "llm_cond_proj", cfg.llm_features_dim, hid)
    lin(p, "t_embedding.mlp_in", hid, hid)
    lin(p, "t_embedding.mlp_out", hid, hid)
    lin(p, "adaln_proj", hid, cfg.adaln_dim)
    p[f"{prefix}embed_image_indicator.weight"] = wt(2, hid)
    for i in range(cfg.num_layers):
        pre = f"layers.{i}"
        lin(p, f"{pre}.attention.qkv", hid, 3 * hid, bias=False)
        lin(p, f"{pre}.attention.o", hid, hid, bias=False)
        p[f"{prefix}{pre}.attention.norm_q.weight"] = jnp.ones((hd,), dtype=dtype)
        p[f"{prefix}{pre}.attention.norm_k.weight"] = jnp.ones((hd,), dtype=dtype)
        for nm in ("attention_norm1", "attention_norm2", "ffn_norm1", "ffn_norm2"):
            p[f"{prefix}{pre}.{nm}.weight"] = jnp.ones((hid,), dtype=dtype)
        lin(p, f"{pre}.feed_forward.w1", hid, cfg.intermediate_size, bias=False)
        lin(p, f"{pre}.feed_forward.w2", cfg.intermediate_size, hid, bias=False)
        lin(p, f"{pre}.feed_forward.w3", hid, cfg.intermediate_size, bias=False)
        lin(p, f"{pre}.adaln_modulation", cfg.adaln_dim, 4 * hid)
    lin(p, "final_layer.linear", hid, cfg.in_channels)
    lin(p, "final_layer.adaln_modulation", cfg.adaln_dim, hid)
    return p

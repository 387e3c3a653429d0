"""Anima: a Cosmos-style cross-attention DiT over Wan-VAE 16-ch latents with
LoRA-bottlenecked AdaLN-zero modulation, NTK-scaled 3-axis RoPE, and an
"LLM adapter" that translates Qwen3 hidden states into a T5-token-aligned
conditioning sequence (padded to 512 tokens).

Reference analog: Anima::AnimaNet / AnimaRunner
(src/model/diffusion/anima.hpp:461,586).  Checkpoint names (under the
``net.`` sub-prefix): ``net.x_embedder.proj.1``, ``net.t_embedder.1.
linear_{1,2}``, ``net.t_embedding_norm``, ``net.blocks.N.
{adaln_modulation_self_attn.{1,2}, self_attn.{q_proj,k_proj,v_proj,q_norm,
k_norm,output_proj}, adaln_modulation_cross_attn.*, cross_attn.*,
adaln_modulation_mlp.*, mlp.{layer1,layer2}}``, ``net.final_layer.
{adaln_modulation.{1,2}, linear}``, ``net.llm_adapter.{embed, blocks.K.
{norm_self_attn, self_attn.{..., o_proj}, norm_cross_attn, cross_attn.*,
norm_mlp, mlp.{0,2}}, out_proj, norm}``.

TPU-first note: the reference runs the LLM adapter inside every diffusion
forward (anima.hpp:522); the adapter depends only on the prompt, so here it
runs ONCE in the conditioner via ``llm_adapter_forward``.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from sdtpu.ops import attention, layer_norm, linear, rms_norm, timestep_embedding
from sdtpu.ops.basic import gelu_tanh, silu


@dataclasses.dataclass(frozen=True)
class AnimaConfig:
    in_channels: int = 16
    out_channels: int = 16
    hidden_size: int = 2048
    text_embed_dim: int = 1024
    num_heads: int = 16
    head_dim: int = 128
    patch_size: int = 2
    num_layers: int = 28
    axes_dim: Tuple[int, ...] = (44, 42, 42)
    theta: int = 10000
    adaln_lora_dim: int = 256


ANIMA_CONFIG = AnimaConfig()


def detect_anima_config(names, shapes) -> AnimaConfig:
    names = set(names)
    kw = {}
    layers = 0
    for n in names:
        if n.startswith("net.blocks."):
            layers = max(layers, int(n.split(".")[2]) + 1)
    if layers:
        kw["num_layers"] = layers
    xe = shapes.get("net.x_embedder.proj.1.weight")
    if xe:
        kw["hidden_size"] = xe[0]
        kw["in_channels"] = xe[1] // 4 - 1
        kw["out_channels"] = kw["in_channels"]
    qn = shapes.get("net.blocks.0.self_attn.q_norm.weight")
    if qn and xe:
        kw["head_dim"] = qn[0]
        kw["num_heads"] = xe[0] // qn[0]
    ck = shapes.get("net.blocks.0.cross_attn.k_proj.weight")
    if ck:
        kw["text_embed_dim"] = ck[1]
    al = shapes.get("net.blocks.0.adaln_modulation_self_attn.1.weight")
    if al:
        kw["adaln_lora_dim"] = al[0]
    return dataclasses.replace(ANIMA_CONFIG, **kw)


def _ntk_factor(ratio: float, axis_dim: int) -> float:
    if ratio == 1.0 or axis_dim <= 2:
        return 1.0
    return ratio ** (axis_dim / (axis_dim - 2))


def anima_rope(hp: int, wp: int, cfg: AnimaConfig,
               h_ratio: float = 4.0, w_ratio: float = 4.0):
    """(cos, sin) [L, head_dim/2] with per-axis NTK-scaled thetas
    (gen_anima_image_pe_vec, anima.hpp:609)."""
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
    return (jnp.asarray(np.cos(ang).astype(np.float32)),
            jnp.asarray(np.sin(ang).astype(np.float32)))


def _rope_halves(x, cos, sin):
    """Non-interleaved split-half rotation. x: [B, H, L, D]."""
    d = x.shape[-1]
    half = d // 2
    xf = x.astype(jnp.float32)
    x1, x2 = xf[..., :half], xf[..., half:]
    o1 = x1 * cos[None, None] - x2 * sin[None, None]
    o2 = x1 * sin[None, None] + x2 * cos[None, None]
    return jnp.concatenate([o1, o2], axis=-1).astype(x.dtype)


def _attn(p, pre, x, ctx, nh, hd, pe_q=None, pe_k=None, out_name="output_proj"):
    """AnimaAttention (anima.hpp:175): per-head qk RMS norm + optional rope."""
    if ctx is None:
        ctx = x
    b, lq, _ = x.shape
    lk = ctx.shape[1]
    q = linear(x, p[f"{pre}.q_proj.weight"]).reshape(b, lq, nh, hd)
    k = linear(ctx, p[f"{pre}.k_proj.weight"]).reshape(b, lk, nh, hd)
    v = linear(ctx, p[f"{pre}.v_proj.weight"]).reshape(b, lk, nh, hd)
    q = rms_norm(q, p[f"{pre}.q_norm.weight"]).transpose(0, 2, 1, 3)
    k = rms_norm(k, p[f"{pre}.k_norm.weight"]).transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    if pe_q is not None or pe_k is not None:
        pq = pe_q if pe_q is not None else pe_k
        pk = pe_k if pe_k is not None else pe_q
        q = _rope_halves(q, *pq)
        k = _rope_halves(k, *pk)
    o = attention(q, k, v).transpose(0, 2, 1, 3).reshape(b, lq, nh * hd)
    return linear(o, p[f"{pre}.{out_name}.weight"])


def _adaln(p, pre, x, embedded_t, temb, n_chunks):
    """AdaLayerNormZero / AdaLayerNorm (anima.hpp:96,136): LoRA bottleneck on
    the normed sinusoid plus the shared temb."""
    emb = silu(embedded_t)
    emb = linear(emb, p[f"{pre}.1.weight"])
    emb = linear(emb, p[f"{pre}.2.weight"])  # [B, n*C]
    c = emb.shape[-1] // n_chunks
    if temb is not None:
        emb = emb + temb[..., : n_chunks * c]
    chunks = jnp.split(emb, n_chunks, axis=-1)
    h = layer_norm(x, eps=1e-6)
    h = h * (1.0 + chunks[1][:, None]) + chunks[0][:, None]
    return (h, chunks[2][:, None]) if n_chunks == 3 else (h, None)


def llm_adapter_forward(p, source_states: jnp.ndarray, t5_ids: jnp.ndarray,
                        prefix: str = "net.llm_adapter") -> jnp.ndarray:
    """Qwen3 hidden states + T5 token ids -> adapted conditioning
    (Anima::LLMAdapter, anima.hpp:341).  Runs once per prompt."""
    b, lt = t5_ids.shape
    ls = source_states.shape[1]
    x = p[f"{prefix}.embed.weight"][t5_ids].astype(source_states.dtype)

    def rope1d(length):
        omega = 1.0 / (10000.0 ** (np.arange(0, 64, 2, dtype=np.float64) / 64))
        ang = np.arange(length, dtype=np.float64)[:, None] * omega[None]
        return (jnp.asarray(np.cos(ang).astype(np.float32)),
                jnp.asarray(np.sin(ang).astype(np.float32)))

    q_pe = rope1d(lt)
    k_pe = rope1d(ls)
    i = 0
    while f"{prefix}.blocks.{i}.self_attn.q_proj.weight" in p:
        pre = f"{prefix}.blocks.{i}"
        h = rms_norm(x, p[f"{pre}.norm_self_attn.weight"])
        x = x + _attn(p, f"{pre}.self_attn", h, None, 16, 64, pe_q=q_pe,
                      pe_k=q_pe, out_name="o_proj")
        h = rms_norm(x, p[f"{pre}.norm_cross_attn.weight"])
        x = x + _attn(p, f"{pre}.cross_attn", h, source_states, 16, 64,
                      pe_q=q_pe, pe_k=k_pe, out_name="o_proj")
        h = rms_norm(x, p[f"{pre}.norm_mlp.weight"])
        h = linear(h, p[f"{prefix}.blocks.{i}.mlp.0.weight"],
                   p[f"{prefix}.blocks.{i}.mlp.0.bias"])
        h = linear(gelu_tanh(h), p[f"{prefix}.blocks.{i}.mlp.2.weight"],
                   p[f"{prefix}.blocks.{i}.mlp.2.bias"])
        x = x + h
        i += 1
    x = linear(x, p[f"{prefix}.out_proj.weight"], p[f"{prefix}.out_proj.bias"])
    return rms_norm(x, p[f"{prefix}.norm.weight"])


def anima_forward(
    p,
    x: jnp.ndarray,
    timesteps: jnp.ndarray,
    context: jnp.ndarray,
    cfg: AnimaConfig = ANIMA_CONFIG,
) -> jnp.ndarray:
    """x: [B, H, W, 16] Wan-VAE latent; timesteps: [B] raw t (0..1000);
    context: [B, 512, 1024] adapter output (llm_adapter_forward)."""
    b, hh, ww, c = x.shape
    ps = cfg.patch_size
    pad_h, pad_w = (-hh) % ps, (-ww) % ps
    # zero "padding mask" channel appended before patchify (anima.hpp:503)
    x = jnp.concatenate([x, jnp.zeros((b, hh, ww, 1), x.dtype)], axis=-1)
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = (hh + pad_h) // ps, (ww + pad_w) // ps
    img = x.reshape(b, hp, ps, wp, ps, c + 1).transpose(0, 1, 3, 5, 2, 4)
    img = img.reshape(b, hp * wp, (c + 1) * ps * ps)
    img = linear(img, p["net.x_embedder.proj.1.weight"])

    t_proj = timestep_embedding(timesteps, cfg.hidden_size).astype(img.dtype)
    temb = linear(t_proj, p["net.t_embedder.1.linear_1.weight"])
    temb = linear(silu(temb), p["net.t_embedder.1.linear_2.weight"])  # [B, 3C]
    embedded_t = rms_norm(t_proj, p["net.t_embedding_norm.weight"])

    pe = anima_rope(hp, wp, cfg)
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
        h, gate = _adaln(p, f"{pre}.adaln_modulation_mlp", img, embedded_t, temb, 3)
        h = linear(h, p[f"{pre}.mlp.layer1.weight"])
        h = linear(gelu_tanh(h), p[f"{pre}.mlp.layer2.weight"])
        img = img + h * gate

    h, _ = _adaln(p, "net.final_layer.adaln_modulation", img, embedded_t, temb, 2)
    out = linear(h, p["net.final_layer.linear.weight"])
    out = out.reshape(b, hp, wp, ps, ps, cfg.out_channels)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp * ps, wp * ps,
                                                  cfg.out_channels)
    if pad_h or pad_w:
        out = out[:, :hh, :ww]
    return out


def init_anima_params(cfg: AnimaConfig, seed: int = 0, dtype=jnp.float32,
                      adapter_layers: int = 6, adapter_vocab: int = 32128,
                      adapter_dim: int = 1024) -> dict:
    g = np.random.default_rng(seed)

    def wt(*shape, scale=0.02):
        return jnp.asarray(g.standard_normal(shape, dtype=np.float32) * scale,
                           dtype=dtype)

    def lin(p, pre, din, dout, bias=False):
        p[f"{pre}.weight"] = wt(dout, din)
        if bias:
            p[f"{pre}.bias"] = jnp.zeros((dout,), dtype=dtype)

    hid = cfg.hidden_size
    nh, hd = cfg.num_heads, cfg.head_dim
    p: dict = {"net.t_embedding_norm.weight": jnp.ones((hid,), dtype=dtype)}
    lin(p, "net.x_embedder.proj.1", (cfg.in_channels + 1) * cfg.patch_size**2, hid)
    lin(p, "net.t_embedder.1.linear_1", hid, hid)
    lin(p, "net.t_embedder.1.linear_2", hid, 3 * hid)

    def anima_attn(p, pre, qdim, cdim, heads, hdim, out_name="output_proj"):
        lin(p, f"{pre}.q_proj", qdim, heads * hdim)
        lin(p, f"{pre}.k_proj", cdim, heads * hdim)
        lin(p, f"{pre}.v_proj", cdim, heads * hdim)
        p[f"{pre}.q_norm.weight"] = jnp.ones((hdim,), dtype=dtype)
        p[f"{pre}.k_norm.weight"] = jnp.ones((hdim,), dtype=dtype)
        lin(p, f"{pre}.{out_name}", heads * hdim, qdim)

    for i in range(cfg.num_layers):
        pre = f"net.blocks.{i}"
        for nm in ("adaln_modulation_self_attn", "adaln_modulation_cross_attn",
                   "adaln_modulation_mlp"):
            lin(p, f"{pre}.{nm}.1", hid, cfg.adaln_lora_dim)
            lin(p, f"{pre}.{nm}.2", cfg.adaln_lora_dim, 3 * hid)
        anima_attn(p, f"{pre}.self_attn", hid, hid, nh, hd)
        anima_attn(p, f"{pre}.cross_attn", hid, cfg.text_embed_dim, nh, hd)
        lin(p, f"{pre}.mlp.layer1", hid, 4 * hid)
        lin(p, f"{pre}.mlp.layer2", 4 * hid, hid)
    lin(p, "net.final_layer.adaln_modulation.1", hid, 256)
    lin(p, "net.final_layer.adaln_modulation.2", 256, 2 * hid)
    lin(p, "net.final_layer.linear", hid, cfg.patch_size**2 * cfg.out_channels)

    # llm adapter (1024-wide, 16x64 heads)
    ad = adapter_dim
    p["net.llm_adapter.embed.weight"] = wt(adapter_vocab, ad)
    for i in range(adapter_layers):
        pre = f"net.llm_adapter.blocks.{i}"
        p[f"{pre}.norm_self_attn.weight"] = jnp.ones((ad,), dtype=dtype)
        p[f"{pre}.norm_cross_attn.weight"] = jnp.ones((ad,), dtype=dtype)
        p[f"{pre}.norm_mlp.weight"] = jnp.ones((ad,), dtype=dtype)
        anima_attn(p, f"{pre}.self_attn", ad, ad, 16, 64, out_name="o_proj")
        anima_attn(p, f"{pre}.cross_attn", ad, cfg.text_embed_dim, 16, 64,
                   out_name="o_proj")
        lin(p, f"{pre}.mlp.0", ad, 4 * ad, bias=True)
        lin(p, f"{pre}.mlp.2", 4 * ad, ad, bias=True)
    lin(p, "net.llm_adapter.out_proj", ad, ad, bias=True)
    p["net.llm_adapter.norm.weight"] = jnp.ones((ad,), dtype=dtype)
    return p

"""Generic decoder-LLM-as-text-encoder (Qwen2.5-VL / Qwen3 / Gemma2 /
Mistral-style), used by 2025+ diffusion models (Qwen-Image, FLUX.2, Z-Image,
Wan2.2…) as the conditioning tower.

Reference analog: LLMRunner (src/model/te/llm.hpp:1408): GQA attention with
optional per-head qk RMSNorm, NEOX RoPE (M-RoPE degenerates to NEOX for
text-only prompts — all three position streams are equal), SwiGLU MLP,
pre/post RMS norms, causal masking, hidden-state extraction at a chosen layer.
HF checkpoint naming: ``model.layers.N.{self_attn.{q,k,v,o}_proj,
input_layernorm, post_attention_layernorm, mlp.{gate,up,down}_proj}``,
``model.embed_tokens.weight``, ``model.norm.weight``.
"""
from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sdtpu.ops import attention, linear, rms_norm
from sdtpu.ops.basic import gelu_tanh, silu


@dataclasses.dataclass(frozen=True)
class LLMConfig:
    arch: str = "qwen2.5vl"
    num_layers: int = 28
    hidden_size: int = 3584
    intermediate_size: int = 18944
    num_heads: int = 28
    num_kv_heads: int = 4
    head_dim: int = 128
    qkv_bias: bool = True
    attention_out_bias: bool = False
    qk_norm: bool = False
    vocab_size: int = 152064
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1e6
    mlp_activation: str = "silu"  # "silu" (SwiGLU) | "gelu_tanh"
    # gemma-family extras (reference llm.hpp:134-157)
    norm_add: bool = False          # RMS scale is (1 + weight)
    normalize_input: bool = False   # embeddings scaled by sqrt(hidden)
    gemma_norms: bool = False       # post-attn + pre/post-FFN norm structure
    sliding_attention: Tuple[int, ...] = ()   # per-layer window pattern
    rope_thetas: Tuple[float, ...] = ()       # (global, local); () -> rope_theta
    rope_scales: Tuple[float, ...] = ()       # linear position scaling per theta
    rope_style: str = "neox"        # "neox" (split halves) | "normal" (pairs)
    rope_yarn: bool = False         # YaRN extension (GPT-OSS)
    rope_orig_ctx: int = 4096       # YaRN original context
    attention_sinks: bool = False   # per-head sink logits (GPT-OSS)
    num_experts: int = 0            # MoE expert count (GPT-OSS)
    num_experts_per_tok: int = 0
    # interleaved M-RoPE (Qwen-VL family): per-pair (t,h,w,extra) stream
    # assignment; rope_style "imrope" consumes position_ids [4, L]
    mrope_sections: Tuple[int, ...] = ()


QWEN25_VL_7B_CONFIG = LLMConfig()
QWEN3_8B_CONFIG = LLMConfig(
    arch="qwen3", num_layers=36, hidden_size=4096, intermediate_size=12288,
    num_heads=32, num_kv_heads=8, qkv_bias=False, qk_norm=True,
    vocab_size=151936,
)
# Qwen3-4B — the FLUX.2-klein text tower.
QWEN3_4B_CONFIG = LLMConfig(
    arch="qwen3", num_layers=36, hidden_size=2560, intermediate_size=9728,
    num_heads=32, num_kv_heads=8, head_dim=128, qkv_bias=False, qk_norm=True,
    vocab_size=151936,
)
# Qwen3-VL-8B text tower — the HiDream-O1 unified LLM-DiT backbone
# (reference HiDreamO1Config::detect_from_weights, hidream_o1.hpp:30 +
# llm.hpp:1112: IMROPE sections {24,20,20}, theta 5e6)
QWEN3_VL_8B_CONFIG = LLMConfig(
    arch="qwen3_vl", num_layers=36, hidden_size=4096, intermediate_size=12288,
    num_heads=32, num_kv_heads=8, head_dim=128, qkv_bias=False, qk_norm=True,
    vocab_size=151936, rope_theta=5e6, rope_style="imrope",
    mrope_sections=(24, 20, 20, 0),
)
# Qwen3-VL-4B — the LingBot-Video text tower (text_dim 2560).
QWEN3_VL_4B_CONFIG = dataclasses.replace(
    QWEN3_VL_8B_CONFIG, hidden_size=2560, intermediate_size=9728,
)
GEMMA2_2B_CONFIG = LLMConfig(
    arch="gemma2_2b", num_layers=26, hidden_size=2304, intermediate_size=9216,
    num_heads=8, num_kv_heads=4, head_dim=256, qkv_bias=False,
    vocab_size=256000, rope_theta=1e4, mlp_activation="gelu_tanh",
    norm_add=True, normalize_input=True, gemma_norms=True,
)
# Gemma3-12B — the LTX-2 text tower (reference llm.hpp:134-147): qk-norm,
# dual RoPE (1e6 with 8x linear scaling on global layers, 1e4 on sliding
# layers), 1024-token sliding window on 5 of every 6 layers.
GEMMA3_12B_CONFIG = LLMConfig(
    arch="gemma3_12b", num_layers=48, hidden_size=3840,
    intermediate_size=15360, num_heads=16, num_kv_heads=8, head_dim=256,
    qkv_bias=False, qk_norm=True, vocab_size=262208,
    mlp_activation="gelu_tanh", normalize_input=True, gemma_norms=True,
    sliding_attention=(1024, 1024, 1024, 1024, 1024, 0),
    rope_thetas=(1e6, 1e4), rope_scales=(8.0, 1.0),
)
# Mistral-Small-3.2 — the FLUX.2 text tower (reference llm.hpp:116): GPT-style
# adjacent-pair RoPE with theta 1e9.
MISTRAL_SMALL_32_CONFIG = LLMConfig(
    arch="mistral_small_3_2", num_layers=40, hidden_size=5120,
    intermediate_size=32768, num_heads=32, num_kv_heads=8, head_dim=128,
    qkv_bias=False, rms_norm_eps=1e-5, vocab_size=131072, rope_theta=1e9,
    rope_style="normal",
)
# Ministral-3.3B — the ERNIE-Image text tower.
MINISTRAL_33B_CONFIG = LLMConfig(
    arch="ministral_3_3b", num_layers=26, hidden_size=3072,
    intermediate_size=9216, num_heads=32, num_kv_heads=8, head_dim=128,
    qkv_bias=False, rms_norm_eps=1e-5, vocab_size=131072, rope_theta=1e6,
)
# GPT-OSS-20B — the Lens text tower (reference llm.hpp:163-181): MoE (32
# experts, top-4, clamped-swiglu), per-head attention sinks, YaRN RoPE
# (theta 150k, 32x), 128-token sliding window on alternate layers.
GPT_OSS_20B_CONFIG = LLMConfig(
    arch="gpt_oss_20b", num_layers=24, hidden_size=2880,
    intermediate_size=2880, num_heads=64, num_kv_heads=8, head_dim=64,
    qkv_bias=True, attention_out_bias=True, rms_norm_eps=1e-5,
    vocab_size=201088, rope_theta=150000.0, rope_scales=(32.0,),
    rope_yarn=True, rope_orig_ctx=4096, sliding_attention=(128, 0),
    attention_sinks=True, num_experts=32, num_experts_per_tok=4,
)


def detect_llm_config(names, shapes, arch: str = "qwen2.5vl") -> LLMConfig:
    """Config from checkpoint shapes (reference detect_from_weights,
    llm.hpp:113)."""
    base = {
        "qwen2.5vl": QWEN25_VL_7B_CONFIG,
        "qwen3": QWEN3_8B_CONFIG,
        "qwen3_vl": QWEN3_VL_8B_CONFIG,
        "gemma2_2b": GEMMA2_2B_CONFIG,
        "gemma3_12b": GEMMA3_12B_CONFIG,
        "mistral_small_3_2": MISTRAL_SMALL_32_CONFIG,
        "ministral_3_3b": MINISTRAL_33B_CONFIG,
        "gpt_oss_20b": GPT_OSS_20B_CONFIG,
    }.get(arch, QWEN25_VL_7B_CONFIG)
    num_layers = 0
    for n in names:
        if n.startswith("model.layers."):
            num_layers = max(num_layers, int(n.split(".")[2]) + 1)
    emb = shapes.get("model.embed_tokens.weight")
    q = shapes.get("model.layers.0.self_attn.q_proj.weight")
    kv = shapes.get("model.layers.0.self_attn.k_proj.weight")
    gate = shapes.get("model.layers.0.mlp.gate_proj.weight")
    kw = {}
    if num_layers:
        kw["num_layers"] = num_layers
    if emb:
        kw["vocab_size"], kw["hidden_size"] = emb
    if q and emb and q[0] >= base.head_dim:
        kw["num_heads"] = q[0] // base.head_dim
    if kv and emb and kv[0] >= base.head_dim:
        kw["num_kv_heads"] = kv[0] // base.head_dim
    if gate:
        kw["intermediate_size"] = gate[0]
    return dataclasses.replace(base, **kw)


def _neox_rope(x: jnp.ndarray, pos: jnp.ndarray, theta: float,
               pos_scale: float = 1.0, style: str = "neox",
               yarn: bool = False, orig_ctx: int = 4096) -> jnp.ndarray:
    """RoPE. x: [B, H, L, D], pos: [L].  style "neox" rotates (i, i+d/2)
    pairs, "normal" rotates adjacent (2i, 2i+1) pairs.  pos_scale implements
    linear scaling (angle *= 1/scale); yarn=True applies ggml-style YaRN
    interpolation instead (beta_fast=32, beta_slow=1, ext_factor=1)."""
    b, h, l, d = x.shape
    half = d // 2
    freq = 1.0 / (theta ** (np.arange(0, half, dtype=np.float64) * 2 / d))
    mscale = 1.0
    if yarn and pos_scale > 1.0:
        # ggml rope_yarn: per-dim blend of interpolated and extrapolated
        # frequencies with a ramp between correction dims
        def corr_dim(n_rot):
            return d * math.log(orig_ctx / (n_rot * 2 * math.pi)) / (2 * math.log(theta))

        low = max(0.0, math.floor(corr_dim(32.0)))
        high = min(d - 1.0, math.ceil(corr_dim(1.0)))
        pair_idx = np.arange(half, dtype=np.float64)
        ramp = 1.0 - np.clip((pair_idx - low) / max(0.001, high - low), 0.0, 1.0)
        freq_interp = freq / pos_scale
        freq = freq_interp * (1.0 - ramp) + freq * ramp
        mscale = 1.0 + 0.1 * math.log(pos_scale)
        ang = jnp.asarray(pos, dtype=jnp.float32)[:, None] * jnp.asarray(
            freq, dtype=jnp.float32)[None, :]
    else:
        ang = (jnp.asarray(pos, dtype=jnp.float32)[:, None] / jnp.float32(pos_scale)
               ) * jnp.asarray(freq, dtype=jnp.float32)[None, :]  # [L, half]
    cos = jnp.cos(ang) * jnp.float32(mscale)
    sin = jnp.sin(ang) * jnp.float32(mscale)
    if style == "normal":
        x1 = x[..., 0::2].astype(jnp.float32)
        x2 = x[..., 1::2].astype(jnp.float32)
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        return jnp.stack([o1, o2], axis=-1).reshape(b, h, l, d).astype(x.dtype)
    x1, x2 = x[..., :half].astype(jnp.float32), x[..., half:].astype(jnp.float32)
    o1 = x1 * cos - x2 * sin
    o2 = x2 * cos + x1 * sin
    return jnp.concatenate([o1, o2], axis=-1).astype(x.dtype)


def _imrope(x: jnp.ndarray, pos4: jnp.ndarray, theta: float,
            sections) -> jnp.ndarray:
    """Interleaved M-RoPE (ggml GGML_ROPE_TYPE_IMROPE, Qwen3-VL): pair j
    takes its position from stream (j % 3) while j < 3*sections[j%3], else
    the 4th (extra) stream; neox split-half rotation.  x: [B,H,L,D],
    pos4: [4, L] int."""
    b, h, l, d = x.shape
    half = d // 2
    freq = 1.0 / (theta ** (np.arange(0, half, dtype=np.float64) * 2 / d))
    j = np.arange(half)
    stream = np.full(half, 3, dtype=np.int32)
    for s in range(3):
        stream[(j % 3 == s) & (j < 3 * sections[s])] = s
    pos_sel = pos4[jnp.asarray(stream)]  # [half, L]
    ang = (pos_sel.astype(jnp.float32).T
           * jnp.asarray(freq, dtype=jnp.float32)[None, :])  # [L, half]
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    x1, x2 = x[..., :half].astype(jnp.float32), x[..., half:].astype(jnp.float32)
    o1 = x1 * cos - x2 * sin
    o2 = x2 * cos + x1 * sin
    return jnp.concatenate([o1, o2], axis=-1).astype(x.dtype)


def _swiglu_oai(gate, up, alpha=1.702, limit=7.0):
    """GPT-OSS clamped swiglu (ggml_swiglu_oai): (up+1) * gate*sigmoid(a*gate)
    with gate clamped above, up clamped both sides."""
    g = jnp.minimum(gate, limit)
    u = jnp.clip(up, -limit, limit)
    return (u + 1.0) * (g * jax.nn.sigmoid(alpha * g))


def _moe_mlp(p, pre: str, x: jnp.ndarray, cfg: LLMConfig) -> jnp.ndarray:
    """GPT-OSS MoE (GPTOSSMLP, llm.hpp:339): top-k routing with softmax over
    the selected logits, clamped-swiglu experts.  Computed densely over all
    experts (token counts are small for conditioning) with a dispatch mask."""
    b, l, hid = x.shape
    e, k = cfg.num_experts, cfg.num_experts_per_tok
    logits = linear(x, p[f"{pre}.router.weight"], p.get(f"{pre}.router.bias"))
    topv, topi = jax.lax.top_k(logits, k)  # [B, L, k]
    w = jax.nn.softmax(topv.astype(jnp.float32), axis=-1)
    dispatch = (jax.nn.one_hot(topi, e, dtype=jnp.float32) *
                w[..., None]).sum(axis=2)  # [B, L, E]

    if f"{pre}.experts.gate_up_proj.weight" in p:
        gu_w = p[f"{pre}.experts.gate_up_proj.weight"]  # [E, 2*inter, hid]
        gu = jnp.einsum("blh,eih->blei", x, gu_w.astype(x.dtype))
        gu = gu + p[f"{pre}.experts.gate_up_proj.bias"].astype(gu.dtype)
        gate, up = gu[..., 0::2], gu[..., 1::2]
    else:
        gate = jnp.einsum("blh,eih->blei", x,
                          p[f"{pre}.experts.gate_proj.weight"].astype(x.dtype))
        gate = gate + p[f"{pre}.experts.gate_proj.bias"].astype(gate.dtype)
        up = jnp.einsum("blh,eih->blei", x,
                        p[f"{pre}.experts.up_proj.weight"].astype(x.dtype))
        up = up + p[f"{pre}.experts.up_proj.bias"].astype(up.dtype)
    act = _swiglu_oai(gate.astype(jnp.float32), up.astype(jnp.float32))
    down = jnp.einsum("blei,ehi->bleh", act.astype(x.dtype),
                      p[f"{pre}.experts.down_proj.weight"].astype(x.dtype))
    down = down + p[f"{pre}.experts.down_proj.bias"].astype(down.dtype)
    return jnp.einsum("bleh,ble->blh", down, dispatch.astype(down.dtype))


def _sink_attention(q, k, v, mask, sinks) -> jnp.ndarray:
    """Attention with per-head sink logits: the softmax denominator includes
    exp(sink_h) (reference ggml_soft_max_add_sinks use, llm.hpp:1140).
    q/k/v: [B, H, L, D]; sinks: [H]."""
    d = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) / jnp.sqrt(jnp.float32(d))
    if mask is not None:
        scores = scores + mask
    sink = sinks.astype(jnp.float32)[None, :, None]  # [1, H, 1]
    m = jnp.maximum(scores.max(axis=-1), sink)  # [B, H, Lq]
    num = jnp.exp(scores - m[..., None])
    denom = num.sum(axis=-1) + jnp.exp(sink - m)
    attn = num / denom[..., None]
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v.astype(jnp.float32)).astype(v.dtype)


def _llm_rms(p, name: str, x: jnp.ndarray, cfg: LLMConfig) -> jnp.ndarray:
    """RMS norm with the gemma (1 + weight) convention when cfg.norm_add
    (LLMRMSNorm, llm.hpp:272)."""
    w = p[name]
    if cfg.norm_add:
        w = w + 1.0
    return rms_norm(x, w, eps=cfg.rms_norm_eps)


def llm_forward(
    p,
    input_ids: jnp.ndarray,
    cfg: LLMConfig = QWEN25_VL_7B_CONFIG,
    attention_mask: Optional[jnp.ndarray] = None,
    output_layer: int = -1,
    all_hidden_states: bool = False,
    output_layers=(),
    input_embeds: Optional[jnp.ndarray] = None,
    position_ids: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """input_ids: [B, L] → hidden states [B, L, hidden] after `output_layer`
    decoder layers (-1 = final norm output, as the reference's per-model
    hidden-state picks, llm.hpp LLMEmbedder).

    attention_mask: [B, L] 0/1 padding mask, or a pre-built additive
    [B, L, L] / [L, L] bias (used by LTXAV's left-padded causal mask).
    all_hidden_states=True returns every state concatenated on the feature
    axis — [B, L, (num_layers+1)*hidden]: scaled embeddings, each layer
    output except the last, final-norm output (TextModel::forward_embeds,
    llm.hpp:1283)."""
    if input_embeds is not None:
        h = input_embeds
        b, l = h.shape[:2]
    else:
        b, l = input_ids.shape
        h = p["model.embed_tokens.weight"][input_ids]
        if cfg.normalize_input or cfg.arch.startswith("gemma"):
            h = h * jnp.asarray(cfg.hidden_size**0.5, h.dtype)
    states = [h] if all_hidden_states else None

    # causal + padding mask, additive [B, 1, L, L]
    causal = jnp.tril(jnp.ones((l, l), dtype=bool))
    mask = jnp.where(causal, 0.0, -1e9).astype(jnp.float32)[None, None]
    if attention_mask is not None:
        if attention_mask.ndim == 1:
            attention_mask = attention_mask[None]
        if attention_mask.ndim == 2 and attention_mask.shape[-1] == l and \
                attention_mask.shape[0] != l:
            pad = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e9)
            mask = mask + pad.astype(jnp.float32)
        else:  # pre-built additive [L, L] or [B, L, L] bias replaces the mask
            bias = attention_mask.astype(jnp.float32)
            while bias.ndim < 4:
                bias = bias[None]
            mask = bias
    sliding_mask = None
    if cfg.sliding_attention:
        window = max(cfg.sliding_attention)
        i0 = jnp.arange(l)[None, :]
        i1 = jnp.arange(l)[:, None]
        sl = jnp.where(i0 + window <= i1, -jnp.inf, 0.0).astype(jnp.float32)
        sliding_mask = mask + sl[None, None]

    pos = jnp.arange(l)
    thetas = cfg.rope_thetas or (cfg.rope_theta,)
    scales = cfg.rope_scales or (1.0,) * len(thetas)
    # output_layers: 1-indexed layer picks concatenated on the feature axis
    # (reference out_layers, llm.hpp forward_embeds:1283); num_layers+1 means
    # the final-norm output.
    picks = tuple(output_layers)
    n_layers = cfg.num_layers if (output_layer == -1 or picks) else output_layer
    picked = []
    nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    for i in range(n_layers):
        pre = f"model.layers.{i}"
        win = (cfg.sliding_attention[i % len(cfg.sliding_attention)]
               if cfg.sliding_attention else 0)
        rope_idx = 1 if (win > 0 and len(thetas) > 1) else 0
        layer_mask = sliding_mask if (win > 0 and sliding_mask is not None) else mask

        hn = _llm_rms(p, f"{pre}.input_layernorm.weight", h, cfg)
        q = linear(hn, p[f"{pre}.self_attn.q_proj.weight"],
                   p.get(f"{pre}.self_attn.q_proj.bias"))
        k = linear(hn, p[f"{pre}.self_attn.k_proj.weight"],
                   p.get(f"{pre}.self_attn.k_proj.bias"))
        v = linear(hn, p[f"{pre}.self_attn.v_proj.weight"],
                   p.get(f"{pre}.self_attn.v_proj.bias"))
        q = q.reshape(b, l, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, l, nkv, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, l, nkv, hd).transpose(0, 2, 1, 3)
        if cfg.qk_norm:
            qw = p[f"{pre}.self_attn.q_norm.weight"]
            kw = p[f"{pre}.self_attn.k_norm.weight"]
            if cfg.norm_add:
                qw, kw = qw + 1.0, kw + 1.0
            q = rms_norm(q, qw, eps=cfg.rms_norm_eps)
            k = rms_norm(k, kw, eps=cfg.rms_norm_eps)
        if cfg.rope_style == "imrope":
            pos4 = (position_ids if position_ids is not None
                    else jnp.stack([pos, pos, pos, jnp.zeros_like(pos)]))
            q = _imrope(q, pos4, thetas[rope_idx], cfg.mrope_sections)
            k = _imrope(k, pos4, thetas[rope_idx], cfg.mrope_sections)
        else:
            q = _neox_rope(q, pos, thetas[rope_idx], scales[rope_idx],
                           cfg.rope_style, cfg.rope_yarn, cfg.rope_orig_ctx)
            k = _neox_rope(k, pos, thetas[rope_idx], scales[rope_idx],
                           cfg.rope_style, cfg.rope_yarn, cfg.rope_orig_ctx)
        # GQA: repeat kv heads
        if nkv != nh:
            k = jnp.repeat(k, nh // nkv, axis=1)
            v = jnp.repeat(v, nh // nkv, axis=1)
        if cfg.attention_sinks:
            o = _sink_attention(q, k, v, layer_mask,
                                p[f"{pre}.self_attn.sinks"])
        else:
            o = attention(q, k, v, mask=layer_mask, flash=False)
        o = o.transpose(0, 2, 1, 3).reshape(b, l, nh * hd)
        o = linear(o, p[f"{pre}.self_attn.o_proj.weight"],
                   p.get(f"{pre}.self_attn.o_proj.bias"))
        if cfg.gemma_norms:
            o = _llm_rms(p, f"{pre}.post_attention_layernorm.weight", o, cfg)
        h = h + o

        ffn_norm = (f"{pre}.pre_feedforward_layernorm.weight" if cfg.gemma_norms
                    else f"{pre}.post_attention_layernorm.weight")
        hn = _llm_rms(p, ffn_norm, h, cfg)
        if cfg.num_experts > 0:
            m = _moe_mlp(p, f"{pre}.mlp", hn, cfg)
        else:
            gate = linear(hn, p[f"{pre}.mlp.gate_proj.weight"])
            up = linear(hn, p[f"{pre}.mlp.up_proj.weight"])
            act = silu(gate) if cfg.mlp_activation == "silu" else gelu_tanh(gate)
            m = linear(act * up, p[f"{pre}.mlp.down_proj.weight"])
        if cfg.gemma_norms:
            m = _llm_rms(p, f"{pre}.post_feedforward_layernorm.weight", m, cfg)
        h = h + m
        if all_hidden_states and i + 1 < n_layers:
            states.append(h)
        if (i + 1) in picks:
            picked.append(h)

    if output_layer == -1 or all_hidden_states or (cfg.num_layers + 1) in picks:
        h = _llm_rms(p, "model.norm.weight", h, cfg)
    if all_hidden_states:
        states.append(h)
        return jnp.concatenate(states, axis=-1)
    if picks:
        if (cfg.num_layers + 1) in picks:
            picked.append(h)
        return jnp.concatenate(picked, axis=-1)
    return h


# chat templates (reference llm.hpp:1016-1128)
CHAT_TEMPLATES = {
    "qwen_image": (
        "<|im_start|>system\nDescribe the image by detailing the color, shape, "
        "size, texture, quantity, text, spatial relationships of the objects and "
        "background:<|im_end|>\n<|im_start|>user\n{}<|im_end|>\n"
        "<|im_start|>assistant\n",
        34,  # drop_idx: template prefix tokens removed from the hidden states
    ),
    "qwen2.5vl": ("<|im_start|>user\n{}<|im_end|>\n<|im_start|>assistant\n", 0),
    "hunyuan_video": (
        "<|im_start|>system\nYou are a helpful assistant. Describe the video by "
        "detailing the following aspects:\n"
        "1. The main content and theme of the video.\n"
        "2. The color, shape, size, texture, quantity, text, and spatial "
        "relationships of the objects.\n"
        "3. Actions, events, behaviors temporal relationships, physical movement "
        "changes of the objects.\n"
        "4. background environment, light, style and atmosphere.\n"
        "5. camera angles, movements, and transitions used in the "
        "video.<|im_end|>\n<|im_start|>user\n{}<|im_end|>\n<|im_start|>assistant\n",
        98,
    ),
}


def init_llm_params(cfg: LLMConfig, seed: int = 0, dtype=jnp.float32) -> dict:
    g = np.random.default_rng(seed)

    def w(*shape, scale=0.02):
        return jnp.asarray(g.standard_normal(shape, dtype=np.float32) * scale, dtype=dtype)

    p = {
        "model.embed_tokens.weight": w(cfg.vocab_size, cfg.hidden_size),
        "model.norm.weight": jnp.ones((cfg.hidden_size,), dtype=dtype),
    }
    nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    for i in range(cfg.num_layers):
        pre = f"model.layers.{i}"
        p[f"{pre}.self_attn.q_proj.weight"] = w(nh * hd, cfg.hidden_size)
        p[f"{pre}.self_attn.k_proj.weight"] = w(nkv * hd, cfg.hidden_size)
        p[f"{pre}.self_attn.v_proj.weight"] = w(nkv * hd, cfg.hidden_size)
        p[f"{pre}.self_attn.o_proj.weight"] = w(cfg.hidden_size, nh * hd)
        if cfg.attention_out_bias:
            p[f"{pre}.self_attn.o_proj.bias"] = jnp.zeros((cfg.hidden_size,), dtype=dtype)
        if cfg.attention_sinks:
            p[f"{pre}.self_attn.sinks"] = jnp.zeros((nh,), dtype=dtype)
        if cfg.qkv_bias:
            p[f"{pre}.self_attn.q_proj.bias"] = jnp.zeros((nh * hd,), dtype=dtype)
            p[f"{pre}.self_attn.k_proj.bias"] = jnp.zeros((nkv * hd,), dtype=dtype)
            p[f"{pre}.self_attn.v_proj.bias"] = jnp.zeros((nkv * hd,), dtype=dtype)
        if cfg.qk_norm:
            p[f"{pre}.self_attn.q_norm.weight"] = jnp.ones((hd,), dtype=dtype)
            p[f"{pre}.self_attn.k_norm.weight"] = jnp.ones((hd,), dtype=dtype)
        p[f"{pre}.input_layernorm.weight"] = jnp.ones((cfg.hidden_size,), dtype=dtype)
        p[f"{pre}.post_attention_layernorm.weight"] = jnp.ones((cfg.hidden_size,), dtype=dtype)
        if cfg.gemma_norms:
            p[f"{pre}.pre_feedforward_layernorm.weight"] = jnp.ones(
                (cfg.hidden_size,), dtype=dtype)
            p[f"{pre}.post_feedforward_layernorm.weight"] = jnp.ones(
                (cfg.hidden_size,), dtype=dtype)
        if cfg.num_experts > 0:
            e, it = cfg.num_experts, cfg.intermediate_size
            p[f"{pre}.mlp.router.weight"] = w(e, cfg.hidden_size)
            p[f"{pre}.mlp.router.bias"] = jnp.zeros((e,), dtype=dtype)
            p[f"{pre}.mlp.experts.gate_up_proj.weight"] = w(e, 2 * it, cfg.hidden_size)
            p[f"{pre}.mlp.experts.gate_up_proj.bias"] = jnp.zeros((e, 2 * it), dtype=dtype)
            p[f"{pre}.mlp.experts.down_proj.weight"] = w(e, cfg.hidden_size, it)
            p[f"{pre}.mlp.experts.down_proj.bias"] = jnp.zeros((e, cfg.hidden_size), dtype=dtype)
        else:
            p[f"{pre}.mlp.gate_proj.weight"] = w(cfg.intermediate_size, cfg.hidden_size)
            p[f"{pre}.mlp.up_proj.weight"] = w(cfg.intermediate_size, cfg.hidden_size)
            p[f"{pre}.mlp.down_proj.weight"] = w(cfg.hidden_size, cfg.intermediate_size)
    return p

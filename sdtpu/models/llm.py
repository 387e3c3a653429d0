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


QWEN25_VL_7B_CONFIG = LLMConfig()
QWEN3_8B_CONFIG = LLMConfig(
    arch="qwen3", num_layers=36, hidden_size=4096, intermediate_size=12288,
    num_heads=32, num_kv_heads=8, qkv_bias=False, qk_norm=True,
    vocab_size=151936,
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


def detect_llm_config(names, shapes, arch: str = "qwen2.5vl") -> LLMConfig:
    """Config from checkpoint shapes (reference detect_from_weights,
    llm.hpp:113)."""
    base = {
        "qwen2.5vl": QWEN25_VL_7B_CONFIG,
        "qwen3": QWEN3_8B_CONFIG,
        "gemma2_2b": GEMMA2_2B_CONFIG,
        "gemma3_12b": GEMMA3_12B_CONFIG,
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
               pos_scale: float = 1.0) -> jnp.ndarray:
    """NEOX-style RoPE: rotate (i, i+d/2) pairs. x: [B, H, L, D], pos: [L].
    pos_scale implements linear RoPE scaling (angle *= 1/scale)."""
    b, h, l, d = x.shape
    half = d // 2
    freq = 1.0 / (theta ** (np.arange(0, half, dtype=np.float64) / half))
    ang = (jnp.asarray(pos, dtype=jnp.float32)[:, None] / jnp.float32(pos_scale)
           ) * jnp.asarray(freq, dtype=jnp.float32)[None, :]  # [L, half]
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    x1, x2 = x[..., :half].astype(jnp.float32), x[..., half:].astype(jnp.float32)
    o1 = x1 * cos - x2 * sin
    o2 = x2 * cos + x1 * sin
    return jnp.concatenate([o1, o2], axis=-1).astype(x.dtype)


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
    n_layers = cfg.num_layers if output_layer == -1 else output_layer
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
        q = _neox_rope(q, pos, thetas[rope_idx], scales[rope_idx])
        k = _neox_rope(k, pos, thetas[rope_idx], scales[rope_idx])
        # GQA: repeat kv heads
        if nkv != nh:
            k = jnp.repeat(k, nh // nkv, axis=1)
            v = jnp.repeat(v, nh // nkv, axis=1)
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
        gate = linear(hn, p[f"{pre}.mlp.gate_proj.weight"])
        up = linear(hn, p[f"{pre}.mlp.up_proj.weight"])
        act = silu(gate) if cfg.mlp_activation == "silu" else gelu_tanh(gate)
        m = linear(act * up, p[f"{pre}.mlp.down_proj.weight"])
        if cfg.gemma_norms:
            m = _llm_rms(p, f"{pre}.post_feedforward_layernorm.weight", m, cfg)
        h = h + m
        if all_hidden_states and i + 1 < n_layers:
            states.append(h)

    if output_layer == -1 or all_hidden_states:
        h = _llm_rms(p, "model.norm.weight", h, cfg)
    if all_hidden_states:
        states.append(h)
        return jnp.concatenate(states, axis=-1)
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
        p[f"{pre}.mlp.gate_proj.weight"] = w(cfg.intermediate_size, cfg.hidden_size)
        p[f"{pre}.mlp.up_proj.weight"] = w(cfg.intermediate_size, cfg.hidden_size)
        p[f"{pre}.mlp.down_proj.weight"] = w(cfg.hidden_size, cfg.intermediate_size)
    return p

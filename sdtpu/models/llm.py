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
)


def detect_llm_config(names, shapes, arch: str = "qwen2.5vl") -> LLMConfig:
    """Config from checkpoint shapes (reference detect_from_weights,
    llm.hpp:113)."""
    base = {
        "qwen2.5vl": QWEN25_VL_7B_CONFIG,
        "qwen3": QWEN3_8B_CONFIG,
        "gemma2_2b": GEMMA2_2B_CONFIG,
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


def _neox_rope(x: jnp.ndarray, pos: jnp.ndarray, theta: float) -> jnp.ndarray:
    """NEOX-style RoPE: rotate (i, i+d/2) pairs. x: [B, H, L, D], pos: [L]."""
    b, h, l, d = x.shape
    half = d // 2
    freq = 1.0 / (theta ** (np.arange(0, half, dtype=np.float64) / half))
    ang = jnp.asarray(pos, dtype=jnp.float32)[:, None] * jnp.asarray(
        freq, dtype=jnp.float32
    )[None, :]  # [L, half]
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    x1, x2 = x[..., :half].astype(jnp.float32), x[..., half:].astype(jnp.float32)
    o1 = x1 * cos - x2 * sin
    o2 = x2 * cos + x1 * sin
    return jnp.concatenate([o1, o2], axis=-1).astype(x.dtype)


def llm_forward(
    p,
    input_ids: jnp.ndarray,
    cfg: LLMConfig = QWEN25_VL_7B_CONFIG,
    attention_mask: Optional[jnp.ndarray] = None,
    output_layer: int = -1,
) -> jnp.ndarray:
    """input_ids: [B, L] → hidden states [B, L, hidden] after `output_layer`
    decoder layers (-1 = final norm output, as the reference's per-model
    hidden-state picks, llm.hpp LLMEmbedder)."""
    b, l = input_ids.shape
    h = p["model.embed_tokens.weight"][input_ids]
    if cfg.arch.startswith("gemma"):
        h = h * jnp.asarray(cfg.hidden_size**0.5, h.dtype)

    # causal + padding mask, additive [B, 1, L, L]
    causal = jnp.tril(jnp.ones((l, l), dtype=bool))
    mask = jnp.where(causal, 0.0, -1e9).astype(jnp.float32)[None, None]
    if attention_mask is not None:
        pad = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e9)
        mask = mask + pad.astype(jnp.float32)

    pos = jnp.arange(l)
    n_layers = cfg.num_layers if output_layer == -1 else output_layer
    nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    for i in range(n_layers):
        pre = f"model.layers.{i}"
        hn = rms_norm(h, p[f"{pre}.input_layernorm.weight"], eps=cfg.rms_norm_eps)
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
            q = rms_norm(q, p[f"{pre}.self_attn.q_norm.weight"], eps=cfg.rms_norm_eps)
            k = rms_norm(k, p[f"{pre}.self_attn.k_norm.weight"], eps=cfg.rms_norm_eps)
        q = _neox_rope(q, pos, cfg.rope_theta)
        k = _neox_rope(k, pos, cfg.rope_theta)
        # GQA: repeat kv heads
        if nkv != nh:
            k = jnp.repeat(k, nh // nkv, axis=1)
            v = jnp.repeat(v, nh // nkv, axis=1)
        o = attention(q, k, v, mask=mask, flash=False)
        o = o.transpose(0, 2, 1, 3).reshape(b, l, nh * hd)
        h = h + linear(o, p[f"{pre}.self_attn.o_proj.weight"],
                       p.get(f"{pre}.self_attn.o_proj.bias"))

        hn = rms_norm(h, p[f"{pre}.post_attention_layernorm.weight"], eps=cfg.rms_norm_eps)
        gate = linear(hn, p[f"{pre}.mlp.gate_proj.weight"])
        up = linear(hn, p[f"{pre}.mlp.up_proj.weight"])
        act = silu(gate) if cfg.mlp_activation == "silu" else gelu_tanh(gate)
        h = h + linear(act * up, p[f"{pre}.mlp.down_proj.weight"])

    if output_layer == -1:
        h = rms_norm(h, p["model.norm.weight"], eps=cfg.rms_norm_eps)
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
        p[f"{pre}.mlp.gate_proj.weight"] = w(cfg.intermediate_size, cfg.hidden_size)
        p[f"{pre}.mlp.up_proj.weight"] = w(cfg.intermediate_size, cfg.hidden_size)
        p[f"{pre}.mlp.down_proj.weight"] = w(cfg.hidden_size, cfg.intermediate_size)
    return p

"""CLIP text encoder towers (OpenAI-L, OpenCLIP-G) as pure JAX functions.

Reference analog: CLIPTextModel (src/model/te/clip.hpp:250) with
penultimate-layer / clip-skip support and the SDXL pooled projection.

Params are a flat dict keyed by HF ``CLIPTextModel`` names relative to the
tower root (``text_model.encoder.layers.N.self_attn.q_proj.weight`` …), which
is what checkpoints contain after name canonicalization; weights keep torch
layouts ([out, in] linears).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp

from sdtpu.ops import attention, gelu, layer_norm, linear, quick_gelu


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_position_embeddings: int = 77
    hidden_act: str = "quick_gelu"  # OpenAI-L; OpenCLIP-G uses "gelu"
    projection_dim: Optional[int] = None  # set for SDXL clip_g pooled output
    eos_token_id: int = 49407


CLIP_L_CONFIG = CLIPTextConfig()
CLIP_G_CONFIG = CLIPTextConfig(
    hidden_size=1280,
    intermediate_size=5120,
    num_layers=32,
    num_heads=20,
    hidden_act="gelu",
    projection_dim=1280,
)
# SD2.x open_clip ViT-H text tower
CLIP_H_CONFIG = CLIPTextConfig(
    hidden_size=1024,
    intermediate_size=4096,
    num_layers=23,
    num_heads=16,
    hidden_act="gelu",
)


def _act(name: str):
    return quick_gelu if name == "quick_gelu" else gelu


def clip_attention(p, prefix: str, x: jnp.ndarray, mask: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, l, c = x.shape
    d = c // num_heads

    def proj(name):
        return linear(x, p[f"{prefix}.{name}.weight"], p[f"{prefix}.{name}.bias"])

    q = proj("q_proj").reshape(b, l, num_heads, d).transpose(0, 2, 1, 3)
    k = proj("k_proj").reshape(b, l, num_heads, d).transpose(0, 2, 1, 3)
    v = proj("v_proj").reshape(b, l, num_heads, d).transpose(0, 2, 1, 3)
    o = attention(q, k, v, mask=mask)
    o = o.transpose(0, 2, 1, 3).reshape(b, l, c)
    return linear(o, p[f"{prefix}.out_proj.weight"], p[f"{prefix}.out_proj.bias"])


def clip_layer(p, prefix: str, x: jnp.ndarray, mask: jnp.ndarray, cfg: CLIPTextConfig) -> jnp.ndarray:
    act = _act(cfg.hidden_act)
    h = layer_norm(x, p[f"{prefix}.layer_norm1.weight"], p[f"{prefix}.layer_norm1.bias"])
    x = x + clip_attention(p, f"{prefix}.self_attn", h, mask, cfg.num_heads)
    h = layer_norm(x, p[f"{prefix}.layer_norm2.weight"], p[f"{prefix}.layer_norm2.bias"])
    h = linear(h, p[f"{prefix}.mlp.fc1.weight"], p[f"{prefix}.mlp.fc1.bias"])
    h = act(h)
    h = linear(h, p[f"{prefix}.mlp.fc2.weight"], p[f"{prefix}.mlp.fc2.bias"])
    return x + h


def clip_text_forward(
    p,
    input_ids: jnp.ndarray,
    cfg: CLIPTextConfig,
    clip_skip: int = -1,
    return_pooled: bool = False,
    custom_embeddings: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """input_ids: [B, L] int32 → (hidden [B, L, C], pooled [B, P] or None).

    clip_skip: webui semantics — 1 (or -1) = final layer output (after the
    final LN for hidden use in SD1), 2 = penultimate layer, etc.  The returned
    hidden states pass through final_layer_norm only when taking the last
    layer (diffusers behavior for SD1; SD2/XL consume penultimate pre-LN).

    custom_embeddings: optional [B, L, C] to use instead of the token
    embedding lookup (textual-inversion path).
    """
    b, l = input_ids.shape
    if custom_embeddings is not None:
        x = custom_embeddings
    else:
        x = p["text_model.embeddings.token_embedding.weight"][input_ids]
    pos = p["text_model.embeddings.position_embedding.weight"][:l]
    x = x + pos[None, :, :].astype(x.dtype)

    causal = jnp.where(
        jnp.tril(jnp.ones((l, l), dtype=bool)), jnp.float32(0), jnp.float32(-1e30)
    )

    n_layers = cfg.num_layers
    stop_at = n_layers if clip_skip <= 1 else n_layers - (clip_skip - 1)
    hidden = x
    for i in range(stop_at):
        hidden = clip_layer(p, f"text_model.encoder.layers.{i}", hidden, causal, cfg)

    out = hidden
    if clip_skip <= 1:
        out = layer_norm(
            out, p["text_model.final_layer_norm.weight"], p["text_model.final_layer_norm.bias"]
        )

    pooled = None
    if return_pooled:
        # run remaining layers to the top for the pooled path (pooled always
        # uses the final layer regardless of clip_skip)
        full = hidden
        for i in range(stop_at, n_layers):
            full = clip_layer(p, f"text_model.encoder.layers.{i}", full, causal, cfg)
        full = layer_norm(
            full, p["text_model.final_layer_norm.weight"], p["text_model.final_layer_norm.bias"]
        )
        eos_pos = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32), axis=1)
        pooled = full[jnp.arange(b), eos_pos]  # [B, C]
        if cfg.projection_dim is not None and "text_projection.weight" in p:
            pooled = linear(pooled, p["text_projection.weight"])
    return out, pooled


def init_clip_params(cfg: CLIPTextConfig, rng: "object", dtype=jnp.float32) -> dict:
    """Random-init params (tests/benchmarks without checkpoints)."""
    import numpy as np

    g = np.random.default_rng(rng if isinstance(rng, int) else 0)
    c, ff = cfg.hidden_size, cfg.intermediate_size

    def w(*shape, scale=0.02):
        return jnp.asarray(g.standard_normal(shape, dtype=np.float32) * scale, dtype=dtype)

    def zeros(*shape):
        return jnp.zeros(shape, dtype=dtype)

    def ones(*shape):
        return jnp.ones(shape, dtype=dtype)

    p = {
        "text_model.embeddings.token_embedding.weight": w(cfg.vocab_size, c),
        "text_model.embeddings.position_embedding.weight": w(cfg.max_position_embeddings, c),
        "text_model.final_layer_norm.weight": ones(c),
        "text_model.final_layer_norm.bias": zeros(c),
    }
    for i in range(cfg.num_layers):
        pre = f"text_model.encoder.layers.{i}"
        for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
            p[f"{pre}.self_attn.{nm}.weight"] = w(c, c)
            p[f"{pre}.self_attn.{nm}.bias"] = zeros(c)
        p[f"{pre}.layer_norm1.weight"] = ones(c)
        p[f"{pre}.layer_norm1.bias"] = zeros(c)
        p[f"{pre}.layer_norm2.weight"] = ones(c)
        p[f"{pre}.layer_norm2.bias"] = zeros(c)
        p[f"{pre}.mlp.fc1.weight"] = w(ff, c)
        p[f"{pre}.mlp.fc1.bias"] = zeros(ff)
        p[f"{pre}.mlp.fc2.weight"] = w(c, ff)
        p[f"{pre}.mlp.fc2.bias"] = zeros(c)
    if cfg.projection_dim is not None:
        p["text_projection.weight"] = w(cfg.projection_dim, c)
    return p

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

import jax
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


# ------------------------------------------------------------- vision tower

@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    """ViT vision tower (reference CLIPVisionModelProjection, clip.hpp:426)."""

    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1280  # ViT-H/14 (IP-Adapter / SD2.x image encoders)
    intermediate_size: int = 5120
    num_layers: int = 32
    num_heads: int = 16
    projection_dim: int = 1024
    hidden_act: str = "gelu"


CLIP_VIT_H_CONFIG = CLIPVisionConfig()
CLIP_VIT_L_CONFIG = CLIPVisionConfig(
    hidden_size=1024, intermediate_size=4096, num_layers=24, num_heads=16,
    projection_dim=768, hidden_act="quick_gelu",
)

# OpenAI CLIP preprocessing stats
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def clip_preprocess(image, size: int = 224):
    """uint8/float [H,W,3] → normalized [1,size,size,3] float32 (bilinear)."""
    import numpy as np

    img = np.asarray(image, dtype=np.float32)
    if img.max() > 1.5:
        img = img / 255.0
    x = jax.image.resize(jnp.asarray(img), (size, size, 3), method="bilinear")
    x = (x - jnp.asarray(CLIP_IMAGE_MEAN)) / jnp.asarray(CLIP_IMAGE_STD)
    return x[None]


def clip_vision_forward(
    p,
    pixels: jnp.ndarray,
    cfg: CLIPVisionConfig = CLIP_VIT_H_CONFIG,
    return_hidden: bool = False,
):
    """pixels: [B, size, size, 3] preprocessed → (image_embeds [B, proj_dim],
    penultimate hidden [B, 1+n_patches, hidden] if return_hidden).

    HF naming: vision_model.embeddings.{class_embedding, patch_embedding,
    position_embedding}, vision_model.pre_layrnorm (HF's typo preserved),
    vision_model.encoder.layers.N…, vision_model.post_layernorm,
    visual_projection."""
    from sdtpu.ops import conv2d

    b = pixels.shape[0]
    vm = "vision_model"
    h = conv2d(
        pixels, p[f"{vm}.embeddings.patch_embedding.weight"], None,
        stride=cfg.patch_size, padding=0,
    )  # [B, g, g, hidden]
    g2 = h.shape[1] * h.shape[2]
    h = h.reshape(b, g2, cfg.hidden_size)
    cls = jnp.broadcast_to(
        p[f"{vm}.embeddings.class_embedding"].reshape(1, 1, -1), (b, 1, cfg.hidden_size)
    ).astype(h.dtype)
    h = jnp.concatenate([cls, h], axis=1)
    h = h + p[f"{vm}.embeddings.position_embedding.weight"][None, : h.shape[1]]
    h = layer_norm(h, p[f"{vm}.pre_layrnorm.weight"], p[f"{vm}.pre_layrnorm.bias"])

    hidden_penultimate = None
    vcfg = CLIPTextConfig(
        hidden_size=cfg.hidden_size, intermediate_size=cfg.intermediate_size,
        num_layers=cfg.num_layers, num_heads=cfg.num_heads, hidden_act=cfg.hidden_act,
    )
    for i in range(cfg.num_layers):
        if i == cfg.num_layers - 1:
            hidden_penultimate = h
        h = clip_layer(p, f"{vm}.encoder.layers.{i}", h, None, vcfg)

    pooled = layer_norm(
        h[:, 0], p[f"{vm}.post_layernorm.weight"], p[f"{vm}.post_layernorm.bias"]
    )
    embeds = linear(pooled, p["visual_projection.weight"])
    if return_hidden:
        return embeds, hidden_penultimate
    return embeds


def init_clip_vision_params(cfg: CLIPVisionConfig, seed: int = 0, dtype=jnp.float32):
    import numpy as np

    g = np.random.default_rng(seed)
    n_pos = (cfg.image_size // cfg.patch_size) ** 2 + 1

    def w(*shape, scale=0.02):
        return jnp.asarray(g.standard_normal(shape, dtype=np.float32) * scale, dtype=dtype)

    vm = "vision_model"
    p = {
        f"{vm}.embeddings.class_embedding": w(cfg.hidden_size),
        f"{vm}.embeddings.patch_embedding.weight": w(
            cfg.hidden_size, 3, cfg.patch_size, cfg.patch_size
        ),
        f"{vm}.embeddings.position_embedding.weight": w(n_pos, cfg.hidden_size),
        "visual_projection.weight": w(cfg.projection_dim, cfg.hidden_size),
    }
    for ln in ("pre_layrnorm", "post_layernorm"):
        p[f"{vm}.{ln}.weight"] = jnp.ones((cfg.hidden_size,), dtype=dtype)
        p[f"{vm}.{ln}.bias"] = jnp.zeros((cfg.hidden_size,), dtype=dtype)
    for i in range(cfg.num_layers):
        pre = f"{vm}.encoder.layers.{i}"
        for nn in ("q_proj", "k_proj", "v_proj", "out_proj"):
            p[f"{pre}.self_attn.{nn}.weight"] = w(cfg.hidden_size, cfg.hidden_size)
            p[f"{pre}.self_attn.{nn}.bias"] = jnp.zeros((cfg.hidden_size,), dtype=dtype)
        p[f"{pre}.mlp.fc1.weight"] = w(cfg.intermediate_size, cfg.hidden_size)
        p[f"{pre}.mlp.fc1.bias"] = jnp.zeros((cfg.intermediate_size,), dtype=dtype)
        p[f"{pre}.mlp.fc2.weight"] = w(cfg.hidden_size, cfg.intermediate_size)
        p[f"{pre}.mlp.fc2.bias"] = jnp.zeros((cfg.hidden_size,), dtype=dtype)
        for ln in ("layer_norm1", "layer_norm2"):
            p[f"{pre}.{ln}.weight"] = jnp.ones((cfg.hidden_size,), dtype=dtype)
            p[f"{pre}.{ln}.bias"] = jnp.zeros((cfg.hidden_size,), dtype=dtype)
    return p

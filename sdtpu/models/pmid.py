"""PhotoMaker v1/v2 ID encoder (identity-conditioned SDXL generation).

Reference analog: PhotoMakerIDEncoder (src/model/adapter/pmid.hpp:397) +
photomaker_extension.cpp.  ID images run through the checkpoint's CLIP-ViT-L
vision tower; v1 concatenates two pooled projections (768 + 1280 → 2048) per
image, v2 instead maps insightface 512-d id embeddings through a QFormer
perceiver attending over the vision hidden states (2 tokens per image).
The FuseModule then replaces the trigger-word class-token embeddings inside
the SDXL prompt embedding with fused id embeddings.

Checkpoint naming (prefix ``pmid.``): ``vision_model.*``,
``visual_projection[_2]``, ``fuse_module.{mlp1,mlp2,layer_norm}``,
``qformer_perceiver.{token_proj,token_norm,perceiver_resampler}`` (v2).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sdtpu.models.clip import (
    CLIP_VIT_L_CONFIG,
    CLIPTextConfig,
    CLIPVisionConfig,
    clip_layer,
)
from sdtpu.ops import attention, conv2d, layer_norm, linear
from sdtpu.ops.basic import gelu_tanh


def detect_pmid_vision_config(p) -> CLIPVisionConfig:
    """Vision tower config from pmid checkpoint shapes."""
    import dataclasses

    pe = p["vision_model.embeddings.patch_embedding.weight"]
    layers = 0
    for n in p:
        if n.startswith("vision_model.encoder.layers."):
            layers = max(layers, int(n.split(".")[3]) + 1)
    fc1 = p["vision_model.encoder.layers.0.mlp.fc1.weight"]
    heads = max(1, pe.shape[0] // 64)
    proj = p["visual_projection.weight"].shape[0]
    return dataclasses.replace(
        CLIP_VIT_L_CONFIG, hidden_size=pe.shape[0], patch_size=pe.shape[2],
        intermediate_size=fc1.shape[0], num_layers=layers,
        num_heads=min(heads, 16), projection_dim=proj)


def _vision_features(p, pixels: jnp.ndarray, cfg: CLIPVisionConfig):
    """→ (pooled [B, hidden] post-layernorm CLS, last_hidden [B, L, hidden])."""
    b = pixels.shape[0]
    vm = "vision_model"
    h = conv2d(pixels, p[f"{vm}.embeddings.patch_embedding.weight"], None,
               stride=cfg.patch_size, padding=0)
    g2 = h.shape[1] * h.shape[2]
    h = h.reshape(b, g2, cfg.hidden_size)
    cls = jnp.broadcast_to(
        p[f"{vm}.embeddings.class_embedding"].reshape(1, 1, -1),
        (b, 1, cfg.hidden_size)).astype(h.dtype)
    h = jnp.concatenate([cls, h], axis=1)
    h = h + p[f"{vm}.embeddings.position_embedding.weight"][None, : h.shape[1]]
    h = layer_norm(h, p[f"{vm}.pre_layrnorm.weight"], p[f"{vm}.pre_layrnorm.bias"])
    vcfg = CLIPTextConfig(
        hidden_size=cfg.hidden_size, intermediate_size=cfg.intermediate_size,
        num_layers=cfg.num_layers, num_heads=cfg.num_heads,
        hidden_act=cfg.hidden_act)
    for i in range(cfg.num_layers):
        h = clip_layer(p, f"{vm}.encoder.layers.{i}", h, None, vcfg)
    pooled = layer_norm(h[:, 0], p[f"{vm}.post_layernorm.weight"],
                        p[f"{vm}.post_layernorm.bias"])
    return pooled, h


def _fuse_block(p, pre: str, x: jnp.ndarray, use_residue: bool) -> jnp.ndarray:
    """FuseBlock (pmid.hpp:11): LN → fc1 → gelu → fc2 (+x)."""
    h = layer_norm(x, p[f"{pre}.layernorm.weight"], p[f"{pre}.layernorm.bias"])
    h = gelu_tanh(linear(h, p[f"{pre}.fc1.weight"], p[f"{pre}.fc1.bias"]))
    h = linear(h, p[f"{pre}.fc2.weight"], p[f"{pre}.fc2.bias"])
    return x + h if use_residue else h


def photomaker_fuse(p, prompt_embeds: jnp.ndarray, id_embeds: jnp.ndarray,
                    class_mask: np.ndarray) -> jnp.ndarray:
    """Replace class-token positions of prompt_embeds [1, L, D] with fused
    [class_token | id_embed] features (reference FuseModule, pmid.hpp:249).
    id_embeds: [n_tokens, D] aligned with the True positions of class_mask."""
    pos = np.nonzero(np.asarray(class_mask))[0]
    img_tok = prompt_embeds[0, jnp.asarray(pos)]  # [n, D]
    stacked = jnp.concatenate([img_tok, id_embeds.astype(img_tok.dtype)], axis=-1)
    stacked = _fuse_block(p, "fuse_module.mlp1", stacked, use_residue=False)
    stacked = stacked + img_tok
    stacked = _fuse_block(p, "fuse_module.mlp2", stacked, use_residue=True)
    stacked = layer_norm(stacked, p["fuse_module.layer_norm.weight"],
                         p["fuse_module.layer_norm.bias"])
    return prompt_embeds.at[0, jnp.asarray(pos)].set(stacked)


def _perceiver_attention(p, pre: str, x: jnp.ndarray, latents: jnp.ndarray,
                         heads: int, dim_head: int) -> jnp.ndarray:
    """PerceiverAttention (pmid.hpp:70): latents query [x | latents]."""
    b = x.shape[0]
    xn = layer_norm(x, p[f"{pre}.norm1.weight"], p[f"{pre}.norm1.bias"])
    ln = layer_norm(latents, p[f"{pre}.norm2.weight"], p[f"{pre}.norm2.bias"])
    q = linear(ln, p[f"{pre}.to_q.weight"])
    kv = linear(jnp.concatenate([xn, ln], axis=1), p[f"{pre}.to_kv.weight"])
    k, v = jnp.split(kv, 2, axis=-1)
    def heads_split(t):
        return t.reshape(b, t.shape[1], heads, dim_head).transpose(0, 2, 1, 3)
    o = attention(heads_split(q), heads_split(k), heads_split(v))
    o = o.transpose(0, 2, 1, 3).reshape(b, latents.shape[1], heads * dim_head)
    return linear(o, p[f"{pre}.to_out.weight"])


def qformer_perceiver(p, id_embeds: jnp.ndarray, last_hidden: jnp.ndarray,
                      cross_dim: int = 2048, num_tokens: int = 2,
                      depth: int = 4) -> jnp.ndarray:
    """PhotoMaker v2 QFormerPerceiver (pmid.hpp:206): insightface embedding →
    num_tokens query tokens refined by a perceiver over the vision states."""
    pre = "qformer_perceiver"
    n = id_embeds.shape[0]
    x = gelu_tanh(linear(id_embeds, p[f"{pre}.token_proj.fc1.weight"],
                         p[f"{pre}.token_proj.fc1.bias"]))
    x = linear(x, p[f"{pre}.token_proj.fc2.weight"], p[f"{pre}.token_proj.fc2.bias"])
    x = x.reshape(n, num_tokens, cross_dim)
    x = layer_norm(x, p[f"{pre}.token_norm.weight"], p[f"{pre}.token_norm.bias"])
    rp = f"{pre}.perceiver_resampler"
    lat = x
    h = linear(last_hidden, p[f"{rp}.proj_in.weight"], p[f"{rp}.proj_in.bias"])
    dim_head = 128 if cross_dim >= 128 and cross_dim % 128 == 0 else cross_dim // 2
    heads = cross_dim // dim_head
    for i in range(depth):
        lat = lat + _perceiver_attention(p, f"{rp}.layers.{i}.0", h, lat,
                                         heads, dim_head)
        ff = f"{rp}.layers.{i}.1"
        t = layer_norm(lat, p[f"{ff}.0.weight"], p[f"{ff}.0.bias"])
        t = gelu_tanh(linear(t, p[f"{ff}.1.fc1.weight"], p[f"{ff}.1.fc1.bias"]))
        t = linear(t, p[f"{ff}.1.fc2.weight"], p[f"{ff}.1.fc2.bias"])
        lat = lat + t
    lat = linear(lat, p[f"{rp}.proj_out.weight"], p[f"{rp}.proj_out.bias"])
    lat = layer_norm(lat, p[f"{rp}.norm_out.weight"], p[f"{rp}.norm_out.bias"])
    return x + lat  # use_residul


def photomaker_encode(
    p,
    id_pixels: jnp.ndarray,
    prompt_embeds: jnp.ndarray,
    class_mask: np.ndarray,
    id_embeds: Optional[jnp.ndarray] = None,
    vision_cfg: CLIPVisionConfig = CLIP_VIT_L_CONFIG,
) -> jnp.ndarray:
    """→ updated prompt embeds [1, L, 2048] (reference
    PhotoMakerIDEncoder{,_CLIPInsightfaceExtendtoken}Block forward).
    id_pixels: [N, 224, 224, 3] preprocessed; id_embeds (v2 only): [N, 512]
    insightface embeddings (from the offline face_detect tooling)."""
    pooled, last_hidden = _vision_features(p, id_pixels, vision_cfg)
    if "qformer_perceiver.token_norm.weight" in p:  # v2
        assert id_embeds is not None, "PhotoMaker v2 needs insightface id embeds"
        cross = p["qformer_perceiver.token_norm.weight"].shape[0]
        tokens = qformer_perceiver(p, id_embeds, last_hidden, cross_dim=cross)
        tokens = tokens.reshape(-1, tokens.shape[-1])
    else:
        e1 = linear(pooled, p["visual_projection.weight"])
        e2 = linear(pooled, p["visual_projection_2.weight"])
        tokens = jnp.concatenate([e1, e2], axis=-1)  # [N, 2048]
    return photomaker_fuse(p, prompt_embeds, tokens, class_mask)


def init_pmid_params(vision_cfg: CLIPVisionConfig, embed_dim: int = 2048,
                     v2: bool = False, seed: int = 0, dtype=jnp.float32) -> dict:
    from sdtpu.models.clip import init_clip_vision_params

    g = np.random.default_rng(seed)
    p = dict(init_clip_vision_params(vision_cfg, seed=seed, dtype=dtype))

    def wt(*shape):
        return jnp.asarray(g.standard_normal(shape, dtype=np.float32) * 0.02,
                           dtype=dtype)

    def lin(pre, o, i, bias=True):
        p[f"{pre}.weight"] = wt(o, i)
        if bias:
            p[f"{pre}.bias"] = jnp.zeros((o,), dtype=dtype)

    def norm(pre, d):
        p[f"{pre}.weight"] = jnp.ones((d,), dtype=dtype)
        p[f"{pre}.bias"] = jnp.zeros((d,), dtype=dtype)

    hid = vision_cfg.hidden_size
    d2 = embed_dim - vision_cfg.projection_dim
    p["visual_projection_2.weight"] = wt(d2, hid)
    for pre, din in (("fuse_module.mlp1", embed_dim * 2),
                     ("fuse_module.mlp2", embed_dim)):
        lin(f"{pre}.fc1", embed_dim, din)
        lin(f"{pre}.fc2", embed_dim, embed_dim)
        norm(f"{pre}.layernorm", din)
    norm("fuse_module.layer_norm", embed_dim)
    if v2:
        qp = "qformer_perceiver"
        lin(f"{qp}.token_proj.fc1", 512 * 4, 512)
        lin(f"{qp}.token_proj.fc2", embed_dim * 2, 512 * 4)
        norm(f"{qp}.token_norm", embed_dim)
        rp = f"{qp}.perceiver_resampler"
        lin(f"{rp}.proj_in", embed_dim, hid)
        lin(f"{rp}.proj_out", embed_dim, embed_dim)
        norm(f"{rp}.norm_out", embed_dim)
        for i in range(4):
            pre = f"{rp}.layers.{i}.0"
            norm(f"{pre}.norm1", embed_dim)
            norm(f"{pre}.norm2", embed_dim)
            lin(f"{pre}.to_q", embed_dim, embed_dim, bias=False)
            lin(f"{pre}.to_kv", embed_dim * 2, embed_dim, bias=False)
            lin(f"{pre}.to_out", embed_dim, embed_dim, bias=False)
            ff = f"{rp}.layers.{i}.1"
            norm(f"{ff}.0", embed_dim)
            lin(f"{ff}.1.fc1", embed_dim * 4, embed_dim)
            lin(f"{ff}.1.fc2", embed_dim, embed_dim * 4)
    return p

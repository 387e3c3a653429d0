"""IP-Adapter (SD1.5/SDXL): image-prompt conditioning via decoupled
cross-attention.

Reference analog: IPAdapterRunner (src/model/adapter/ip_adapter.hpp:34) + the
decoupled to_k_ip/to_v_ip weights that live inside the UNet's attn2 blocks
(unet.hpp:779-857, activated through GGMLRunnerContext.ip_context/ip_scale).

Checkpoint layout (h94/IP-Adapter):
  image_proj.proj.{weight,bias}   CLIP image embed → n_tokens × ctx_dim
  image_proj.norm.{weight,bias}   LayerNorm over ctx_dim
  ip_adapter.{2k+1}.to_{k,v}_ip.weight  — decoupled weights for the k-th
  cross-attn (attn2) site in graph order (down → mid → up, matching the
  CompVis input_blocks → middle_block → output_blocks traversal).
"""
from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from sdtpu.models.unet import UNetConfig, _block_layout
from sdtpu.ops import layer_norm, linear


def attn2_paths(cfg: UNetConfig) -> List[str]:
    """Ordered attn2 prefixes for the UNet's cross-attn sites."""
    inputs, outputs = _block_layout(cfg)
    paths: List[str] = []

    def collect(blocks, base):
        for entry in blocks:
            bi, blk = entry[0], entry[1]
            for j, kind in enumerate(blk):
                if isinstance(kind, tuple) and kind[0] == "attn":
                    for d in range(kind[1]):
                        paths.append(
                            f"{base}.{bi}.{j}.transformer_blocks.{d}.attn2"
                        )

    collect(inputs, "input_blocks")
    mid_depth = cfg.transformer_depth[-1] if cfg.transformer_depth[-1] > 0 else 1
    for d in range(mid_depth):
        paths.append(f"middle_block.1.transformer_blocks.{d}.attn2")
    collect(outputs, "output_blocks")
    return paths


def load_ip_adapter(tensors: Dict[str, np.ndarray], cfg: UNetConfig):
    """Split an IP-Adapter checkpoint into (image_proj params, unet-merged
    decoupled weights keyed by attn2 path)."""
    proj = {k[len("image_proj.") :]: v for k, v in tensors.items()
            if k.startswith("image_proj.")}
    paths = attn2_paths(cfg)
    unet_extra: Dict[str, np.ndarray] = {}
    for k, v in tensors.items():
        if not k.startswith("ip_adapter."):
            continue
        parts = k.split(".")
        idx = (int(parts[1]) - 1) // 2  # keys 1,3,5,… → site 0,1,2,…
        if idx >= len(paths):
            continue
        unet_extra[f"{paths[idx]}.{parts[2]}.{parts[3]}"] = v
    return proj, unet_extra


def image_proj_tokens(proj_params, clip_embeds: jnp.ndarray, ctx_dim: int) -> jnp.ndarray:
    """CLIP image embedding [B, embed_dim] → [B, n_tokens, ctx_dim]
    (reference ip_adapter.hpp IPAdapterRunner projection)."""
    h = linear(clip_embeds, proj_params["proj.weight"], proj_params["proj.bias"])
    b = h.shape[0]
    tokens = h.reshape(b, -1, ctx_dim)
    return layer_norm(tokens, proj_params["norm.weight"], proj_params["norm.bias"])


def init_ip_adapter_params(unet_params, cfg: UNetConfig, clip_embed_dim: int = 1024,
                           n_tokens: int = 4, seed: int = 0, dtype=jnp.float32):
    """Random-init (tests): proj params + unet-mergeable decoupled weights
    shaped like the existing attn2 to_k/to_v."""
    g = np.random.default_rng(seed)
    ctx = cfg.context_dim
    proj = {
        "proj.weight": jnp.asarray(
            g.standard_normal((n_tokens * ctx, clip_embed_dim), dtype=np.float32) * 0.02,
            dtype=dtype,
        ),
        "proj.bias": jnp.zeros((n_tokens * ctx,), dtype=dtype),
        "norm.weight": jnp.ones((ctx,), dtype=dtype),
        "norm.bias": jnp.zeros((ctx,), dtype=dtype),
    }
    unet_extra = {}
    for path in attn2_paths(cfg):
        for nn in ("to_k_ip", "to_v_ip"):
            like = unet_params[f"{path}.to_k.weight"]
            unet_extra[f"{path}.{nn}.weight"] = jnp.asarray(
                g.standard_normal(like.shape, dtype=np.float32) * 0.02, dtype=dtype
            )
    return proj, unet_extra

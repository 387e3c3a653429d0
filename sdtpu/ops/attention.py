"""Attention dispatch: Pallas flash kernel on TPU, XLA softmax-attention
fallback elsewhere (reference analog: ggml_ext_attention_ext,
src/core/ggml_extend.hpp:1317, flash path :1392).

Shapes follow [B, H, L, D] (batch, heads, length, head_dim).
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp


def _xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    from .basic import matmul_precision

    if scale is None:
        scale = q.shape[-1] ** -0.5
    prec = matmul_precision(q.dtype)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32, precision=prec
    )
    logits = logits * jnp.float32(scale)
    if mask is not None:
        logits = logits + mask.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd",
        probs.astype(q.dtype),
        v,
        preferred_element_type=q.dtype,
        precision=prec,
    )


def compute_platform() -> str:
    """Platform computations actually run on (respects jax_default_device)."""
    try:
        dd = jax.config.jax_default_device
        if dd is not None:
            return dd.platform
        return jax.default_backend()
    except Exception:
        return "cpu"


def use_flash() -> bool:
    if os.environ.get("SDTPU_DISABLE_FLASH"):
        return False
    return compute_platform() == "tpu"


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    flash: Optional[bool] = None,
) -> jnp.ndarray:
    """Scaled dot-product attention, [B,H,L,D] layout.

    flash=None → auto (Pallas on TPU when shapes allow, XLA otherwise).
    """
    if flash is None:
        flash = use_flash()
    if flash:
        from .flash_attention import flash_attention, flash_supported

        if flash_supported(q, k, v, mask):
            return flash_attention(q, k, v, mask=mask, scale=scale)
    return _xla_attention(q, k, v, mask=mask, scale=scale)

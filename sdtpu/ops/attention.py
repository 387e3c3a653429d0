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


_FORCE_PLATFORM = None  # set while tracing a module placed on a specific device


class force_platform:
    """Context manager: pin the platform the attention dispatch assumes.

    Needed for per-module placement (set_module_devices): a module placed on
    the host CPU must trace the XLA attention path even when the default
    backend is a TPU — Pallas kernels cannot lower on the CPU backend."""

    def __init__(self, platform: str):
        self.platform = platform

    def __enter__(self):
        global _FORCE_PLATFORM
        self._prev = _FORCE_PLATFORM
        _FORCE_PLATFORM = self.platform
        return self

    def __exit__(self, *exc):
        global _FORCE_PLATFORM
        _FORCE_PLATFORM = self._prev
        return False


def compute_platform() -> str:
    """Platform computations actually run on (respects forced placement and
    jax_default_device)."""
    if _FORCE_PLATFORM is not None:
        return _FORCE_PLATFORM
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


_SEQ_PARALLEL = None  # (mesh, axis) — set while a sequence-parallel pipeline traces


class sequence_parallel:
    """Context manager: route eligible self-attention through ring attention
    over the given mesh axis (context parallelism — the capability the
    reference lacks, SURVEY.md §5).  Active during jit tracing; the resulting
    compiled program keeps the ring collectives."""

    def __init__(self, mesh, axis: str = "sp"):
        self.mesh = mesh
        self.axis = axis

    def __enter__(self):
        global _SEQ_PARALLEL
        self._prev = _SEQ_PARALLEL
        _SEQ_PARALLEL = (self.mesh, self.axis)
        return self

    def __exit__(self, *exc):
        global _SEQ_PARALLEL
        _SEQ_PARALLEL = self._prev
        return False


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
    Under a `sequence_parallel` context, self-attention (q/k same length,
    divisible by the sp axis, no mask) runs as ring attention over ICI.
    """
    if _SEQ_PARALLEL is not None and mask is None:
        sp_mesh, sp_axis = _SEQ_PARALLEL
        n = sp_mesh.shape[sp_axis]
        if n > 1 and q.shape[2] == k.shape[2] and q.shape[2] % n == 0:
            from sdtpu.parallel.ring_attention import ring_attention_sharded

            return ring_attention_sharded(q, k, v, sp_mesh, axis=sp_axis, scale=scale)
    if flash is None:
        flash = use_flash()
    if flash:
        from .flash_attention import flash_attention, flash_supported

        if flash_supported(q, k, v, mask):
            return flash_attention(q, k, v, mask=mask, scale=scale)
    return _xla_attention(q, k, v, mask=mask, scale=scale)

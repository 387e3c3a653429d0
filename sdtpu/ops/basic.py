"""Torch-compatible NN ops as pure JAX functions.

Analogous to the reference's ggml op extensions (src/core/ggml_extend.hpp) but
re-expressed for XLA: weights keep their checkpoint (torch) layouts so the
params pytree maps 1:1 onto tensor names; XLA's layout assignment handles the
physical tiling on TPU.

Conventions:
  linear weight: [out, in]  (torch nn.Linear)
  conv2d weight: [out, in, kh, kw] (torch OIHW); activations are NHWC on TPU
  norms accumulate in float32 regardless of activation dtype
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def matmul_precision(dtype) -> jax.lax.Precision:
    """f32 operands imply exact-parity mode → full-precision MXU passes;
    bf16/f16 use the fast default."""
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else jax.lax.Precision.DEFAULT


def linear(x: jnp.ndarray, weight, bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """x: [..., in], weight: [out, in] (dense, int8 QuantTensor, or packed
    4-bit Q4Tensor) → [..., out]."""
    if type(weight).__name__ == "LoraTensor":
        # runtime LoRA on a dense base (--lora-apply-mode at_runtime)
        y = linear(x, weight.w)
        h = jax.lax.dot_general(
            x, weight.lora_down.astype(x.dtype),
            (((x.ndim - 1,), (1,)), ((), ())),
        )
        y = y + jax.lax.dot_general(
            h, weight.lora_up.astype(x.dtype),
            (((h.ndim - 1,), (1,)), ((), ())),
        ).astype(y.dtype)
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y
    if type(weight).__name__ == "Q4Tensor":
        from .quant import q4_matmul

        y = q4_matmul(x, weight)
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y
    if type(weight).__name__ == "GroupQuantTensor":
        from .quant import group_quant_matmul

        y = group_quant_matmul(x, weight)
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y
    if type(weight).__name__ in ("QuantTensor", "QuantLoraTensor"):
        from .quant import quant_matmul

        y = quant_matmul(x, weight)
        if type(weight).__name__ == "QuantLoraTensor":
            # runtime LoRA on a quantized base (never merged into int8)
            h = jax.lax.dot_general(
                x, weight.lora_down.astype(x.dtype),
                (((x.ndim - 1,), (1,)), ((), ())),
            )
            y = y + jax.lax.dot_general(
                h, weight.lora_up.astype(x.dtype),
                (((h.ndim - 1,), (1,)), ((), ())),
            ).astype(y.dtype)
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y
    y = jax.lax.dot_general(
        x,
        weight,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=x.dtype,
        precision=matmul_precision(x.dtype),
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


_CIRCULAR = (False, False)  # (wrap_y, wrap_x) — seamless-texture conv padding


class circular_padding:
    """Context manager: conv2d pads circularly on the chosen axes while
    tracing (reference --circular/--circularx/--circulary — the
    circular-pad conv variants in ggml_extend.hpp).  Makes generated
    textures tile seamlessly."""

    def __init__(self, wrap_y: bool = True, wrap_x: bool = True):
        self.mode = (bool(wrap_y), bool(wrap_x))

    def __enter__(self):
        global _CIRCULAR
        self._prev = _CIRCULAR
        _CIRCULAR = self.mode
        return self

    def __exit__(self, *exc):
        global _CIRCULAR
        _CIRCULAR = self._prev
        return False


def conv2d(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride: int = 1,
    padding=1,
    groups: int = 1,
    dilation: int = 1,
) -> jnp.ndarray:
    """NHWC conv. x: [B,H,W,C], weight: torch OIHW [out,in/groups,kh,kw].
    Under a `circular_padding` context the padded axes wrap around."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    wrap_y, wrap_x = _CIRCULAR
    if (wrap_y or wrap_x) and any(p for dims in padding for p in dims):
        (py0, py1), (px0, px1) = padding
        pad_h = (py0, py1) if wrap_y else (0, 0)
        pad_w = (px0, px1) if wrap_x else (0, 0)
        if wrap_y or wrap_x:
            x = jnp.pad(x, ((0, 0), pad_h, pad_w, (0, 0)), mode="wrap")
        padding = (
            (0, 0) if wrap_y else (py0, py1),
            (0, 0) if wrap_x else (px0, px1),
        )
    kernel = jnp.transpose(weight, (2, 3, 1, 0))  # OIHW → HWIO
    y = jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=stride,
        padding=padding,
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=x.dtype,
        precision=matmul_precision(x.dtype),
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def group_norm(
    x: jnp.ndarray,
    weight: Optional[jnp.ndarray],
    bias: Optional[jnp.ndarray],
    num_groups: int = 32,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """NHWC group norm over channel groups; stats in float32."""
    orig_dtype = x.dtype
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h * w, num_groups, c // num_groups)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(b, h, w, c)
    if weight is not None:
        xf = xf * weight.astype(jnp.float32)
    if bias is not None:
        xf = xf + bias.astype(jnp.float32)
    return xf.astype(orig_dtype)


def layer_norm(
    x: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    eps: float = 1e-5,
) -> jnp.ndarray:
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        xf = xf * weight.astype(jnp.float32)
    if bias is not None:
        xf = xf + bias.astype(jnp.float32)
    return xf.astype(orig_dtype)


def rms_norm(
    x: jnp.ndarray, weight: Optional[jnp.ndarray] = None, eps: float = 1e-6
) -> jnp.ndarray:
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    xf = xf * jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps)
    if weight is not None:
        xf = xf * weight.astype(jnp.float32)
    return xf.astype(orig_dtype)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU — torch nn.GELU default, used by SD UNet GEGLU."""
    return jax.nn.gelu(x, approximate=False)


def gelu_tanh(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=True)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """x * sigmoid(1.702x) — OpenAI CLIP-L activation."""
    return x * jax.nn.sigmoid(1.702 * x)


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.silu(x)


def timestep_embedding(
    timesteps: jnp.ndarray, dim: int, max_period: int = 10000, flip_sin_to_cos: bool = True
) -> jnp.ndarray:
    """Sinusoidal timestep embedding (CompVis layout: [cos | sin]).

    timesteps: [N] float/int → [N, dim] float32.
    Matches ggml_ext_timestep_embedding / CompVis openaimodel
    timestep_embedding: freqs = exp(-ln(max_period) * arange(half)/half).
    """
    import numpy as np

    half = dim // 2
    # freqs are static constants — computed on host in f64, rounded once.
    # NOTE: implementations differing by 1 ulp in expf diverge by ~6e-5 rad at
    # t≈1000; exact cross-libm bit-parity is impossible here, so we take the
    # most accurate chain.
    freqs = jnp.asarray(
        np.exp(-math.log(max_period) * np.arange(half, dtype=np.float64) / half).astype(np.float32)
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    # Cody-Waite range reduction: args can reach ~1000 rad where single-pass
    # f32 trig loses ~1e-3; reduce mod 2π with a two-term split first.
    two_pi_hi = jnp.float32(6.28125)  # high bits of 2π, exactly representable
    two_pi_lo = jnp.float32(2 * math.pi - 6.28125)
    kq = jnp.round(args / jnp.float32(2 * math.pi))
    red = (args - kq * two_pi_hi) - kq * two_pi_lo
    if flip_sin_to_cos:
        emb = jnp.concatenate([jnp.cos(red), jnp.sin(red)], axis=-1)
    else:
        emb = jnp.concatenate([jnp.sin(red), jnp.cos(red)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb

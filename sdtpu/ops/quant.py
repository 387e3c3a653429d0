"""Quantized weight storage + on-device dequant matmul.

TPU-native replacement for ggml's quantized-weight compute (SURVEY.md §7
"dequant-matmul Pallas kernels"): weights stay int8 in HBM (per-output-channel
symmetric scales), and the Pallas kernel dequantizes tiles in VMEM right
before the MXU pass — HBM traffic is the int8 payload, compute is bf16.

This is what lets FLUX-class models (11.9B params) fit and run on a single
16 GB v5e chip, standing in for the reference's q8_0 GGUF path
(docs/flux.md:36).
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class QuantTensor(NamedTuple):
    """int8 weight [out, in] + f32 per-output-channel scale [out]."""

    q: jnp.ndarray
    scale: jnp.ndarray

    @property
    def shape(self):
        return self.q.shape

    @property
    def dtype(self):
        return jnp.int8


class QuantLoraTensor(NamedTuple):
    """Quantized weight with runtime LoRA factors (the reference's
    at_runtime apply mode for quantized weights, lora.hpp:897): the int8 base
    stays untouched in HBM; y += (x · downᵀ) · upᵀ · mult rides alongside.
    down: [r, in], up: [out, r] (ranks concatenated across stacked LoRAs)."""

    q: jnp.ndarray
    scale: jnp.ndarray
    lora_down: jnp.ndarray
    lora_up: jnp.ndarray

    @property
    def shape(self):
        return self.q.shape

    @property
    def dtype(self):
        return jnp.int8


def quantize_per_channel(w: np.ndarray) -> "QuantTensor":
    """f32/bf16 [out, in] → symmetric int8 with per-row scale."""
    w = np.asarray(w, dtype=np.float32)
    amax = np.abs(w).max(axis=1, keepdims=True)
    scale = (amax / 127.0).astype(np.float32)
    scale = np.where(scale == 0, 1.0, scale)
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return QuantTensor(q=jnp.asarray(q), scale=jnp.asarray(scale.reshape(-1)))


def dequantize(qt: QuantTensor, dtype=jnp.bfloat16) -> jnp.ndarray:
    return (qt.q.astype(jnp.float32) * qt.scale[:, None]).astype(dtype)


def _round_up(x, m):
    return (x + m - 1) // m * m


def quantize_activations(x: jnp.ndarray):
    """Dynamic per-row (per-token) symmetric int8: [..., K] →
    (int8 [..., K], f32 scale [..., 1])."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s = jnp.where(amax == 0, 1.0, amax / 127.0)
    q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return q, s


def quant_matmul_w8a8(x: jnp.ndarray, qt: QuantTensor) -> jnp.ndarray:
    """W8A8: dynamic per-token int8 activations × per-channel int8 weights on
    the int8 MXU path (2× bf16 peak on v5e) → x.dtype.

    out[m,n] = (Σ_k xq[m,k]·wq[n,k]) · s_x[m] · s_w[n]
    """
    orig_shape = x.shape
    k = orig_shape[-1]
    n = qt.q.shape[0]
    x2 = x.reshape(-1, k)
    xq, sx = quantize_activations(x2)
    acc = jax.lax.dot_general(
        xq, qt.q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )
    out = (acc.astype(jnp.float32) * sx * qt.scale[None, :]).astype(x.dtype)
    return out.reshape(orig_shape[:-1] + (n,))


def _q_matmul_kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *, n_k: int):
    # x_ref: [BM, BK] bf16, q_ref: [BN, BK] int8, s_ref: [1, BN] f32,
    # o_ref: [BM, BN], acc_ref: f32 scratch. Grid axis 2 tiles K.
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    acc_ref[:, :] += jax.lax.dot_general(
        x_ref[:, :],
        q_ref[:, :].astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ki == n_k - 1)
    def _():
        o_ref[:, :] = (acc_ref[:, :] * s_ref[0, :][None, :]).astype(o_ref.dtype)


def quant_matmul(
    x: jnp.ndarray,
    qt: QuantTensor,
    block_m: int = 256,
    block_n: int = 512,
    block_k: int = 512,
) -> jnp.ndarray:
    """x: [..., K] × int8 weight [N, K] → [..., N] in x.dtype."""
    if os.environ.get("SDTPU_QUANT_MODE", "w8a8") == "w8a8" and not _interpret():
        # default: int8 MXU path (W8A8) — ~1.4× the bf16 dequant kernel on
        # v5e; per-token activation scales keep q8-class accuracy
        return quant_matmul_w8a8(x, qt)

    orig_shape = x.shape
    k = orig_shape[-1]
    n = qt.q.shape[0]
    x2 = x.reshape(-1, k)
    m = x2.shape[0]

    interpret = _interpret()
    if interpret or os.environ.get("SDTPU_DISABLE_QUANT_KERNEL"):
        w = dequantize(qt, x.dtype)
        y = jax.lax.dot_general(
            x2, w, (((1,), (1,)), ((), ())), preferred_element_type=x.dtype
        )
        return y.reshape(orig_shape[:-1] + (n,))

    bm = min(block_m, _round_up(m, 128))
    bn = min(block_n, _round_up(n, 128))
    bk = min(block_k, _round_up(k, 256))
    mp, np_, kp = _round_up(m, bm), _round_up(n, bn), _round_up(k, bk)
    xp = jnp.pad(x2, ((0, mp - m), (0, kp - k)))
    qp = jnp.pad(qt.q, ((0, np_ - n), (0, kp - k)))
    sp = jnp.pad(qt.scale, (0, np_ - n)).reshape(1, np_)
    n_k = kp // bk

    out = pl.pallas_call(
        functools.partial(_q_matmul_kernel, n_k=n_k),
        grid=(mp // bm, np_ // bn, n_k),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, ki: (i, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, bk), lambda i, j, ki: (j, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, ki: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, ki: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp * 2 + np_ * kp + mp * np_ * 2,
            transcendentals=0,
        ),
    )(xp, qp, sp)
    return out[:m, :n].reshape(orig_shape[:-1] + (n,))


def _interpret() -> bool:
    from .attention import compute_platform

    return compute_platform() != "tpu"


def quantize_params(params: dict, min_size: int = 1 << 16, skip_patterns=()) -> dict:
    """Quantize all large 2-D weights in a param dict to int8 QuantTensors."""
    out = {}
    for name, v in params.items():
        arr = np.asarray(v)
        if (
            arr.ndim == 2
            and arr.size >= min_size
            and name.endswith(".weight")
            and not any(s in name for s in skip_patterns)
        ):
            out[name] = quantize_per_channel(arr)
        else:
            out[name] = v if isinstance(v, jnp.ndarray) else jnp.asarray(arr)
    return out

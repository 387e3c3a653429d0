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


class Q4Tensor:
    """4-bit packed weight: the q4_0 memory class kept packed in HBM.

    TPU-native analog of the reference's q4_0 GGUF path (docs/flux.md:36-38 —
    FLUX q4_0 = 6.4 GB vs 12 GB q8_0): weights stay 4-bit + per-group scales
    in HBM; the Pallas kernel unpacks nibbles and dequantizes group-wise in
    VMEM right before the MXU pass.

    Layout (chosen for TPU, not ggml bit-parity — we re-quantize the decoded
    values, which round-trips losslessly on the same grid):
      packed: uint8 [N, Kp//2] — within each K-tile of ``block_k`` columns,
        byte i holds original columns (t+i) in the low nibble and
        (t+i+block_k//2) in the high nibble, so the kernel's
        concat([lo, hi], axis=1) restores tile-local column order.
      scale: f32 [N, Kp//group] — symmetric per-(row, K-group) scales;
        values are (nibble−8)·scale.
    """

    __slots__ = ("packed", "scale", "k", "block_k", "group")

    def __init__(self, packed, scale, k, block_k, group):
        self.packed = packed
        self.scale = scale
        self.k = int(k)
        self.block_k = int(block_k)
        self.group = int(group)

    @property
    def shape(self):
        return (self.packed.shape[0], self.k)

    @property
    def dtype(self):
        return jnp.int4

    def tree_flatten(self):
        return (self.packed, self.scale), (self.k, self.block_k, self.group)

    @classmethod
    def tree_unflatten(cls, aux, children):
        packed, scale = children
        return cls(packed, scale, *aux)


jax.tree_util.register_pytree_node(
    Q4Tensor, Q4Tensor.tree_flatten, Q4Tensor.tree_unflatten
)


def quantize_q4(w: np.ndarray, block_k: int = 512, group: int = 128) -> "Q4Tensor":
    """f32/bf16 [N, K] → packed 4-bit with per-128-group scales."""
    w = np.asarray(w, dtype=np.float32)
    n, k = w.shape
    kp = _round_up(max(k, block_k), block_k)
    if kp != k:
        w = np.pad(w, ((0, 0), (0, kp - k)))
    g = w.reshape(n, kp // group, group)
    amax = np.abs(g).max(axis=2)
    scale = (amax / 7.0).astype(np.float32)
    scale = np.where(scale == 0, 1.0, scale)
    q = np.clip(np.round(g / scale[:, :, None]), -8, 7).astype(np.int8) + 8
    q = q.reshape(n, kp).astype(np.uint8)  # [0, 15]
    # per-tile split-half nibble packing
    qt = q.reshape(n, kp // block_k, 2, block_k // 2)
    packed = (qt[:, :, 0, :] | (qt[:, :, 1, :] << 4)).reshape(n, kp // 2)
    return Q4Tensor(
        packed=jnp.asarray(packed),
        scale=jnp.asarray(scale),
        k=k,
        block_k=block_k,
        group=group,
    )


def dequantize_q4(qt: "Q4Tensor", dtype=jnp.bfloat16) -> jnp.ndarray:
    n = qt.packed.shape[0]
    kp = qt.packed.shape[1] * 2
    p = qt.packed.reshape(n, kp // qt.block_k, qt.block_k // 2)
    lo = (p & 0xF).astype(jnp.int8) - 8
    hi = (p >> 4).astype(jnp.int8) - 8
    q = jnp.concatenate([lo, hi], axis=2).reshape(n, kp)
    s = jnp.repeat(qt.scale, qt.group, axis=1)
    return (q.astype(jnp.float32) * s)[:, : qt.k].astype(dtype)


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


def _q4_matmul_kernel(x_ref, p_ref, s_ref, o_ref, acc_ref, *, n_k: int, group: int):
    # x_ref: [BM, BK] bf16; p_ref: [BN, BK//2] uint8 (split-half nibbles);
    # s_ref: [BN, BK//group] f32; o_ref: [BM, BN]; acc f32 scratch.  Grid
    # axis 2 tiles K; nibbles unpack + group-wise dequant happen in VMEM.
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    p = p_ref[:, :]
    lo = (p & 0xF).astype(jnp.int8) - 8
    hi = (p >> 4).astype(jnp.int8) - 8
    w_int = jnp.concatenate([lo, hi], axis=1)  # [BN, BK] tile-local order
    bk = w_int.shape[1]
    acc = acc_ref[:, :]
    # per-group dequant folded into sub-matmuls: scale is a per-row scalar
    # within each K-group, so the multiply is a cheap sublane broadcast
    for g in range(bk // group):
        wg = w_int[:, g * group : (g + 1) * group].astype(jnp.bfloat16)
        wg = wg * s_ref[:, g][:, None].astype(jnp.bfloat16)
        acc = acc + jax.lax.dot_general(
            x_ref[:, g * group : (g + 1) * group],
            wg,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    acc_ref[:, :] = acc

    @pl.when(ki == n_k - 1)
    def _():
        o_ref[:, :] = acc_ref[:, :].astype(o_ref.dtype)


def q4_matmul(
    x: jnp.ndarray,
    qt: "Q4Tensor",
    block_m: int = 256,
    block_n: int = 512,
) -> jnp.ndarray:
    """x: [..., K] × packed-4-bit weight [N, K] → [..., N] in x.dtype.

    HBM traffic for the weight is 4 bits/element (+ scales); dequant runs in
    VMEM per tile — the kernel the reference's q4_0 CUDA path corresponds to
    (ggml dequantize_mul_mat), expressed TPU-first."""
    orig_shape = x.shape
    k = orig_shape[-1]
    n = qt.packed.shape[0]
    x2 = x.reshape(-1, k)
    m = x2.shape[0]
    kp = qt.packed.shape[1] * 2
    bk = qt.block_k
    group = qt.group

    if _interpret() or os.environ.get("SDTPU_DISABLE_QUANT_KERNEL"):
        w = dequantize_q4(qt, x.dtype)
        y = jax.lax.dot_general(
            x2, w, (((1,), (1,)), ((), ())), preferred_element_type=x.dtype
        )
        return y.reshape(orig_shape[:-1] + (n,))

    bm = min(block_m, _round_up(m, 128))
    bn = min(block_n, _round_up(n, 128))
    mp, np_ = _round_up(m, bm), _round_up(n, bn)
    xp = jnp.pad(x2, ((0, mp - m), (0, kp - k)))
    pp = jnp.pad(qt.packed, ((0, np_ - n), (0, 0)))
    sp = jnp.pad(qt.scale, ((0, np_ - n), (0, 0)))
    n_k = kp // bk

    out = pl.pallas_call(
        functools.partial(_q4_matmul_kernel, n_k=n_k, group=group),
        grid=(mp // bm, np_ // bn, n_k),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, ki: (i, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, bk // 2), lambda i, j, ki: (j, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, bk // group), lambda i, j, ki: (j, ki), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, ki: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp * 2 + np_ * kp // 2 + mp * np_ * 2,
            transcendentals=0,
        ),
    )(xp, pp, sp)
    return out[:m, :n].reshape(orig_shape[:-1] + (n,))


def _interpret() -> bool:
    from .attention import compute_platform

    return compute_platform() != "tpu"


def quantize_params(
    params: dict, min_size: int = 1 << 16, skip_patterns=(), bits: int = 8
) -> dict:
    """Quantize all large 2-D weights in a param dict: bits=8 → int8
    QuantTensors (q8_0 memory class), bits=4 → packed Q4Tensors (q4_0
    class, docs/flux.md:36-38)."""
    if bits not in (4, 8):
        raise ValueError(f"bits must be 4 or 8, got {bits}")
    out = {}
    for name, v in params.items():
        arr = np.asarray(v)
        if (
            arr.ndim == 2
            and arr.size >= min_size
            and name.endswith(".weight")
            and not any(s in name for s in skip_patterns)
        ):
            out[name] = quantize_per_channel(arr) if bits == 8 else quantize_q4(arr)
        else:
            out[name] = v if isinstance(v, jnp.ndarray) else jnp.asarray(arr)
    return out

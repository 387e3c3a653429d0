"""T5 encoder (T5-XXL / UMT5 text encoder for SD3, FLUX, Wan…).

Reference analog: T5Runner (src/model/te/t5.hpp:387).  HF naming
(``encoder.block.N.layer.{0,1}…``, ``shared.weight``); RMS layer norms,
relative attention bias on the first block shared across layers, gated-GELU
feed-forward, and T5's unscaled dot-product attention.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sdtpu.ops import attention, linear, rms_norm
from sdtpu.ops.basic import gelu_tanh


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_eps: float = 1e-6
    is_umt5: bool = False  # UMT5: per-layer relative attention bias


T5_XXL_CONFIG = T5Config()
UMT5_XXL_CONFIG = dataclasses.replace(T5_XXL_CONFIG, vocab_size=256384, is_umt5=True)


def _relative_position_bucket(rel_pos: np.ndarray, num_buckets: int, max_distance: int) -> np.ndarray:
    """Bidirectional T5 bucket function (host-side, static per length)."""
    num_buckets //= 2
    ret = (rel_pos > 0).astype(np.int64) * num_buckets
    n = np.abs(rel_pos)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int64)
    val_if_large = np.minimum(val_if_large, num_buckets - 1)
    return ret + np.where(is_small, n, val_if_large)


def t5_position_bias(p, length: int, cfg: T5Config, layer: int = 0) -> jnp.ndarray:
    """[1, heads, L, L] additive bias from the relative embedding (shared
    table for T5, per-layer for UMT5)."""
    ctx = np.arange(length)
    rel = ctx[None, :] - ctx[:, None]  # memory - query
    buckets = _relative_position_bucket(
        rel, cfg.relative_attention_num_buckets, cfg.relative_attention_max_distance
    )
    src = layer if cfg.is_umt5 else 0
    table = p[f"encoder.block.{src}.layer.0.SelfAttention.relative_attention_bias.weight"]
    bias = table[jnp.asarray(buckets)]  # [L, L, heads]
    return bias.transpose(2, 0, 1)[None]


def t5_encoder_forward(
    p,
    input_ids: jnp.ndarray,
    cfg: T5Config = T5_XXL_CONFIG,
    attention_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """input_ids: [B, L] → hidden [B, L, d_model]."""
    b, l = input_ids.shape
    x = p["shared.weight"][input_ids]
    mask = (
        jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e9).astype(jnp.float32)
        if attention_mask is not None
        else None
    )

    h = x
    for i in range(cfg.num_layers):
        pre = f"encoder.block.{i}"
        pos_bias = t5_position_bias(p, l, cfg, layer=i).astype(jnp.float32)
        if mask is not None:
            pos_bias = pos_bias + mask
        # self attention (T5: no 1/sqrt(d) scaling)
        hn = rms_norm(h, p[f"{pre}.layer.0.layer_norm.weight"], eps=cfg.layer_norm_eps)
        q = linear(hn, p[f"{pre}.layer.0.SelfAttention.q.weight"])
        k = linear(hn, p[f"{pre}.layer.0.SelfAttention.k.weight"])
        v = linear(hn, p[f"{pre}.layer.0.SelfAttention.v.weight"])
        inner = cfg.num_heads * cfg.d_kv
        q = q.reshape(b, l, cfg.num_heads, cfg.d_kv).transpose(0, 2, 1, 3)
        k = k.reshape(b, l, cfg.num_heads, cfg.d_kv).transpose(0, 2, 1, 3)
        v = v.reshape(b, l, cfg.num_heads, cfg.d_kv).transpose(0, 2, 1, 3)
        o = attention(q, k, v, mask=None if pos_bias is None else pos_bias, scale=1.0, flash=False)
        o = o.transpose(0, 2, 1, 3).reshape(b, l, inner)
        h = h + linear(o, p[f"{pre}.layer.0.SelfAttention.o.weight"])
        # gated-GELU FF
        hn = rms_norm(h, p[f"{pre}.layer.1.layer_norm.weight"], eps=cfg.layer_norm_eps)
        g = gelu_tanh(linear(hn, p[f"{pre}.layer.1.DenseReluDense.wi_0.weight"]))
        u = linear(hn, p[f"{pre}.layer.1.DenseReluDense.wi_1.weight"])
        h = h + linear(g * u, p[f"{pre}.layer.1.DenseReluDense.wo.weight"])

    return rms_norm(h, p["encoder.final_layer_norm.weight"], eps=cfg.layer_norm_eps)


def init_t5_params(cfg: T5Config = T5_XXL_CONFIG, seed: int = 0, dtype=jnp.float32) -> dict:
    g = np.random.default_rng(seed)
    inner = cfg.num_heads * cfg.d_kv

    def w(*shape, scale=0.02):
        return jnp.asarray(g.standard_normal(shape, dtype=np.float32) * scale, dtype=dtype)

    p = {
        "shared.weight": w(cfg.vocab_size, cfg.d_model),
        "encoder.final_layer_norm.weight": jnp.ones((cfg.d_model,), dtype=dtype),
    }
    for i in range(cfg.num_layers):
        pre = f"encoder.block.{i}"
        if i == 0 or cfg.is_umt5:
            p[f"{pre}.layer.0.SelfAttention.relative_attention_bias.weight"] = w(
                cfg.relative_attention_num_buckets, cfg.num_heads
            )
        p[f"{pre}.layer.0.SelfAttention.q.weight"] = w(inner, cfg.d_model)
        p[f"{pre}.layer.0.SelfAttention.k.weight"] = w(inner, cfg.d_model)
        p[f"{pre}.layer.0.SelfAttention.v.weight"] = w(inner, cfg.d_model)
        p[f"{pre}.layer.0.SelfAttention.o.weight"] = w(cfg.d_model, inner)
        p[f"{pre}.layer.0.layer_norm.weight"] = jnp.ones((cfg.d_model,), dtype=dtype)
        p[f"{pre}.layer.1.DenseReluDense.wi_0.weight"] = w(cfg.d_ff, cfg.d_model)
        p[f"{pre}.layer.1.DenseReluDense.wi_1.weight"] = w(cfg.d_ff, cfg.d_model)
        p[f"{pre}.layer.1.DenseReluDense.wo.weight"] = w(cfg.d_model, cfg.d_ff)
        p[f"{pre}.layer.1.layer_norm.weight"] = jnp.ones((cfg.d_model,), dtype=dtype)
    return p

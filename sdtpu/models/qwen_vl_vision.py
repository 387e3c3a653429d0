"""Qwen2.5-VL / Qwen3-VL vision towers — ref-image encoders for the edit
pipelines (Qwen-Image-Edit, Mage-Flow edit, LongCat edit, LingBot i2v,
Z-Image omni, HiDream-O1 edit).

Reference analog: LLM::VisionModel + LLMRunner::encode_image_common
(src/model/te/llm.hpp:840, 1516).  Patches are extracted in 2x2
spatial-merge-block raster order with the temporal patch duplicated
(single images repeat for pt=2); Qwen2.5-VL runs 112px window attention
with full-attention blocks at {7,15,23,31} and window gather/scatter,
Qwen3-VL instead adds bilinearly-resampled learned position embeddings.
A spatial-merge MLP head maps 4 patches to one LLM token.

Param naming (inside the llm bundle): ``visual.patch_embed.proj[.0/.1]``,
``visual.blocks.N.{norm1,norm2,attn.{qkv|q_proj,k_proj,v_proj,proj},
mlp.*}``, ``visual.merger.{ln_q,mlp.0,mlp.2}`` (2.5) /
``visual.merger.{norm,linear_fc1,linear_fc2}`` + ``visual.pos_embed`` (3).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sdtpu.ops import attention, conv2d, layer_norm, linear, rms_norm
from sdtpu.ops.basic import gelu_tanh, silu


@dataclasses.dataclass(frozen=True)
class QwenVLVisionConfig:
    arch: str = "qwen2.5vl"  # "qwen2.5vl" | "qwen3vl"
    num_layers: int = 32
    hidden_size: int = 1280
    intermediate_size: int = 3420
    num_heads: int = 16
    in_channels: int = 3
    out_hidden_size: int = 3584
    temporal_patch_size: int = 2
    patch_size: int = 14
    spatial_merge_size: int = 2
    window_size: int = 112
    num_position_embeddings: int = 0
    fullatt_block_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    split_patch_embed: bool = False


QWEN25_VL_VISION_CONFIG = QwenVLVisionConfig()
QWEN3_VL_VISION_CONFIG = QwenVLVisionConfig(
    arch="qwen3vl", num_layers=27, hidden_size=1152, intermediate_size=4304,
    num_heads=16, out_hidden_size=4096, patch_size=16,
    num_position_embeddings=2304, fullatt_block_indexes=(),
)


def detect_vision_config(names, shapes) -> QwenVLVisionConfig:
    names = set(names)
    is_q3 = any("visual.merger.linear_fc2.weight" in n for n in names) or \
        any("visual.pos_embed" in n for n in names)
    base = QWEN3_VL_VISION_CONFIG if is_q3 else QWEN25_VL_VISION_CONFIG
    kw = {}
    layers = 0
    for n in names:
        if ".visual.blocks." in n or n.startswith("visual.blocks."):
            layers = max(layers, int(n.split("visual.blocks.")[1].split(".")[0]) + 1)
    if layers:
        kw["num_layers"] = layers
    w = shapes.get("visual.patch_embed.proj.weight") or \
        shapes.get("visual.patch_embed.proj.0.weight")
    if w:
        kw["hidden_size"] = w[0]
        kw["patch_size"] = w[-1]
        if "visual.patch_embed.proj.0.weight" in shapes:
            kw["split_patch_embed"] = True
    if is_q3:
        w = shapes.get("visual.merger.linear_fc2.weight")
        if w:
            kw["out_hidden_size"] = w[0]
        pe = shapes.get("visual.pos_embed.weight")
        if pe:
            kw["num_position_embeddings"] = pe[0]
    else:
        w = shapes.get("visual.merger.mlp.2.weight")
        if w:
            kw["out_hidden_size"] = w[0]
    w = shapes.get("visual.blocks.0.mlp.gate_proj.weight") or \
        shapes.get("visual.blocks.0.mlp.linear_fc1.weight")
    if w:
        kw["intermediate_size"] = w[0]
    return dataclasses.replace(base, **kw)


def _extract_patches(img: np.ndarray, cfg: QwenVLVisionConfig) -> np.ndarray:
    """[H, W, 3] → [n_patches, C*pt*ph*pw], tokens in 2x2 merge-block raster
    order, feature (C, pt, ph, pw) with the image duplicated over pt
    (reference process_image_common, llm.hpp:1423)."""
    hh, ww, c = img.shape
    ps, ms = cfg.patch_size, cfg.spatial_merge_size
    gh, gw = hh // ps, ww // ps
    x = img.reshape(gh // ms, ms, ps, gw // ms, ms, ps, c)
    x = x.transpose(0, 3, 1, 4, 6, 2, 5)  # [bh, bw, mh, mw, C, ph, pw]
    x = x.reshape(-1, c, ps, ps)
    x = np.repeat(x[:, :, None], cfg.temporal_patch_size, axis=2)
    return x.reshape(x.shape[0], -1).astype(np.float32)


def _window_order(gh: int, gw: int, cfg: QwenVLVisionConfig):
    """→ (order [n_blocks] merged-block indices in window order, seqlens)
    (reference encode_image_common window loop, llm.hpp:1563-1585)."""
    ms = cfg.spatial_merge_size
    lh, lw = gh // ms, gw // ms
    win = cfg.window_size // cfg.patch_size // ms
    order = []
    seqlens = []
    for ih in range(0, lh, win):
        for iw in range(0, lw, win):
            wh, ww2 = min(win, lh - ih), min(win, lw - iw)
            for iy in range(wh):
                for ix in range(ww2):
                    order.append((ih + iy) * lw + iw + ix)
            seqlens.append(wh * ww2 * ms * ms)
    return np.asarray(order, dtype=np.int64), seqlens


def _rope_cos_sin(rows: np.ndarray, cols: np.ndarray, head_dim: int,
                  theta: float = 10000.0):
    """Split-half 2D rope table: first hd/4 entries from the row position,
    next hd/4 from the column (reference gen_qwen2vl_pe with axes
    {hd/2, hd/2}; Rope::attention rope_interleaved=false)."""
    quarter = head_dim // 4
    freq = 1.0 / theta ** (np.arange(quarter) * 2.0 / (head_dim // 2))
    ang = np.concatenate([rows[:, None] * freq[None],
                          cols[:, None] * freq[None]], axis=1)  # [L, hd/2]
    return (jnp.asarray(np.cos(ang), dtype=jnp.float32),
            jnp.asarray(np.sin(ang), dtype=jnp.float32))


def _apply_rope_halves(x, cos, sin):
    """x: [B, H, L, D]; rotate pairs (i, i + D/2)."""
    half = x.shape[-1] // 2
    x1 = x[..., :half].astype(jnp.float32)
    x2 = x[..., half:].astype(jnp.float32)
    o1 = x1 * cos - x2 * sin
    o2 = x2 * cos + x1 * sin
    return jnp.concatenate([o1, o2], axis=-1).astype(x.dtype)


def _vis_norm(p, name, x, cfg):
    if cfg.arch == "qwen3vl":
        return layer_norm(x, p[f"{name}.weight"], p[f"{name}.bias"], eps=1e-6)
    return rms_norm(x, p[f"{name}.weight"], eps=1e-6)


def _vis_block(p, pre, x, cos, sin, mask, cfg: QwenVLVisionConfig):
    b, l, hid = x.shape
    nh = cfg.num_heads
    d = hid // nh
    h = _vis_norm(p, f"{pre}.norm1", x, cfg)
    if f"{pre}.attn.qkv.weight" in p:
        qkv = linear(h, p[f"{pre}.attn.qkv.weight"], p[f"{pre}.attn.qkv.bias"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
    else:  # llama.cpp-style split projections
        q = linear(h, p[f"{pre}.attn.q_proj.weight"], p[f"{pre}.attn.q_proj.bias"])
        k = linear(h, p[f"{pre}.attn.k_proj.weight"], p[f"{pre}.attn.k_proj.bias"])
        v = linear(h, p[f"{pre}.attn.v_proj.weight"], p[f"{pre}.attn.v_proj.bias"])
    q = q.reshape(b, l, nh, d).transpose(0, 2, 1, 3)
    k = k.reshape(b, l, nh, d).transpose(0, 2, 1, 3)
    v = v.reshape(b, l, nh, d).transpose(0, 2, 1, 3)
    q = _apply_rope_halves(q, cos, sin)
    k = _apply_rope_halves(k, cos, sin)
    o = attention(q, k, v, mask=mask).transpose(0, 2, 1, 3).reshape(b, l, hid)
    x = x + linear(o, p[f"{pre}.attn.proj.weight"], p[f"{pre}.attn.proj.bias"])
    h = _vis_norm(p, f"{pre}.norm2", x, cfg)
    if cfg.arch == "qwen3vl":
        m = gelu_tanh(linear(h, p[f"{pre}.mlp.linear_fc1.weight"],
                             p[f"{pre}.mlp.linear_fc1.bias"]))
        m = linear(m, p[f"{pre}.mlp.linear_fc2.weight"], p[f"{pre}.mlp.linear_fc2.bias"])
    else:
        gate = silu(linear(h, p[f"{pre}.mlp.gate_proj.weight"],
                           p[f"{pre}.mlp.gate_proj.bias"]))
        up = linear(h, p[f"{pre}.mlp.up_proj.weight"], p[f"{pre}.mlp.up_proj.bias"])
        m = linear(gate * up, p[f"{pre}.mlp.down_proj.weight"],
                   p[f"{pre}.mlp.down_proj.bias"])
    return x + m


def _pos_embeds_q3(p, gh: int, gw: int, cfg: QwenVLVisionConfig) -> jnp.ndarray:
    """Bilinearly resample the learned (sqrt(N))^2 position grid to the
    image grid, in merge-block token order (reference
    build_patch_pos_embeds_common, llm.hpp:1452)."""
    side = int(round(cfg.num_position_embeddings ** 0.5))
    ms = cfg.spatial_merge_size
    table = p["visual.pos_embed.weight"]  # [N, hidden]
    rows_idx, cols_idx, weights = [], [], []
    hs = np.arange(gh)
    h_pos = np.zeros(gh) if gh == 1 else (side - 1) * hs / (gh - 1)
    ws = np.arange(gw)
    w_pos = np.zeros(gw) if gw == 1 else (side - 1) * ws / (gw - 1)
    hf = np.floor(h_pos).astype(np.int64)
    hc = np.minimum(hf + 1, side - 1)
    dh = h_pos - hf
    wf = np.floor(w_pos).astype(np.int64)
    wc = np.minimum(wf + 1, side - 1)
    dw = w_pos - wf
    # token order: merge-block raster
    order_r, order_c = [], []
    for bh in range(gh // ms):
        for bw in range(gw // ms):
            for iy in range(ms):
                for ix in range(ms):
                    order_r.append(bh * ms + iy)
                    order_c.append(bw * ms + ix)
    r = np.asarray(order_r)
    c = np.asarray(order_c)
    idx00 = hf[r] * side + wf[c]
    idx01 = hf[r] * side + wc[c]
    idx10 = hc[r] * side + wf[c]
    idx11 = hc[r] * side + wc[c]
    w00 = (1 - dh[r]) * (1 - dw[c])
    w01 = (1 - dh[r]) * dw[c]
    w10 = dh[r] * (1 - dw[c])
    w11 = dh[r] * dw[c]
    out = (table[jnp.asarray(idx00)] * jnp.asarray(w00, dtype=jnp.float32)[:, None]
           + table[jnp.asarray(idx01)] * jnp.asarray(w01, dtype=jnp.float32)[:, None]
           + table[jnp.asarray(idx10)] * jnp.asarray(w10, dtype=jnp.float32)[:, None]
           + table[jnp.asarray(idx11)] * jnp.asarray(w11, dtype=jnp.float32)[:, None])
    return out.astype(table.dtype)


def qwen_vision_encode(p, image: np.ndarray,
                       cfg: QwenVLVisionConfig = QWEN25_VL_VISION_CONFIG,
                       dtype=jnp.float32) -> jnp.ndarray:
    """image: [H, W, 3] preprocessed floats (H, W multiples of
    patch_size*merge_size) → [1, n_tokens, out_hidden] merged vision tokens
    (reference encode_image_common, llm.hpp:1516)."""
    hh, ww, _ = image.shape
    ps, ms = cfg.patch_size, cfg.spatial_merge_size
    gh, gw = hh // ps, ww // ps
    patches = _extract_patches(np.asarray(image, dtype=np.float32), cfg)

    # patch embed: linear over the (C, pt, ph, pw) feature vector
    if cfg.split_patch_embed:
        w0 = p["visual.patch_embed.proj.0.weight"].reshape(cfg.hidden_size, -1)
        w1 = p["visual.patch_embed.proj.1.weight"].reshape(cfg.hidden_size, -1)
        wp = jnp.concatenate([w0, w1], axis=-1)
    else:
        wp = p["visual.patch_embed.proj.weight"].reshape(cfg.hidden_size, -1)
    x = linear(jnp.asarray(patches, dtype=dtype), wp,
               p.get("visual.patch_embed.proj.bias"))[None]  # [1, L, hid]

    if cfg.arch == "qwen3vl":
        x = x + _pos_embeds_q3(p, gh, gw, cfg)[None].astype(x.dtype)
        order = np.arange((gh // ms) * (gw // ms), dtype=np.int64)
        mask = None
        fullatt = set(range(cfg.num_layers))
    else:
        order, seqlens = _window_order(gh, gw, cfg)
        # gather merge blocks into window order
        x = x.reshape(1, -1, ms * ms, cfg.hidden_size)[:, order]
        x = x.reshape(1, -1, cfg.hidden_size)
        # block-diagonal window mask over the reordered sequence
        n = gh * gw
        maskv = np.full((n, n), -1e9, dtype=np.float32)
        start = 0
        for s in seqlens:
            maskv[start:start + s, start:start + s] = 0.0
            start += s
        mask = jnp.asarray(maskv)[None, None]
        fullatt = set(cfg.fullatt_block_indexes)

    # rope positions follow the (possibly window-reordered) token order
    lw = gw // ms
    br = order // lw
    bc = order % lw
    # rows/cols per token: block base + intra-block offset
    intra = np.arange(ms * ms)
    rows = (br[:, None] * ms + intra[None] // ms).reshape(-1)
    cols = (bc[:, None] * ms + intra[None] % ms).reshape(-1)
    cos, sin = _rope_cos_sin(rows.astype(np.float64), cols.astype(np.float64),
                             cfg.hidden_size // cfg.num_heads)

    for i in range(cfg.num_layers):
        m = None if i in fullatt else mask
        x = _vis_block(p, f"visual.blocks.{i}", x, cos, sin, m, cfg)

    # spatial merge head: 4 patches → 1 token
    merged_dim = cfg.hidden_size * ms * ms
    if cfg.arch == "qwen3vl":
        h = layer_norm(x, p["visual.merger.norm.weight"],
                       p["visual.merger.norm.bias"], eps=1e-6)
        h = h.reshape(1, -1, merged_dim)
        h = linear(h, p["visual.merger.linear_fc1.weight"],
                   p["visual.merger.linear_fc1.bias"])
        h = jax.nn.gelu(h, approximate=False)
        out = linear(h, p["visual.merger.linear_fc2.weight"],
                     p["visual.merger.linear_fc2.bias"])
    else:
        h = rms_norm(x, p["visual.merger.ln_q.weight"], eps=1e-6)
        h = h.reshape(1, -1, merged_dim)
        h = gelu_tanh(linear(h, p["visual.merger.mlp.0.weight"],
                             p["visual.merger.mlp.0.bias"]))
        out = linear(h, p["visual.merger.mlp.2.weight"],
                     p["visual.merger.mlp.2.bias"])
        # scatter back to raster order
        inverse = np.empty_like(order)
        inverse[order] = np.arange(len(order))
        out = out[:, jnp.asarray(inverse)]
    return out


def clip_smart_resize(h: int, w: int, factor: int = 28,
                      min_pixels: int = 0, max_pixels: int = 0):
    """Qwen-VL smart resize to factor multiples within pixel bounds."""
    import math

    nh = max(factor, round(h / factor) * factor)
    nw = max(factor, round(w / factor) * factor)
    if max_pixels and nh * nw > max_pixels:
        beta = math.sqrt(h * w / max_pixels)
        nh = max(factor, math.floor(h / beta / factor) * factor)
        nw = max(factor, math.floor(w / beta / factor) * factor)
    elif min_pixels and nh * nw < min_pixels:
        beta = math.sqrt(min_pixels / (h * w))
        nh = math.ceil(h * beta / factor) * factor
        nw = math.ceil(w * beta / factor) * factor
    return nh, nw


def init_vision_params(cfg: QwenVLVisionConfig, seed: int = 0,
                       dtype=jnp.float32) -> dict:
    g = np.random.default_rng(seed)
    p: dict = {}

    def wt(*shape, scale=0.02):
        return jnp.asarray(g.standard_normal(shape, dtype=np.float32) * scale,
                           dtype=dtype)

    def lin(pre, o, i, bias=True):
        p[f"{pre}.weight"] = wt(o, i)
        if bias:
            p[f"{pre}.bias"] = jnp.zeros((o,), dtype=dtype)

    def norm(pre, d, bias):
        p[f"{pre}.weight"] = jnp.ones((d,), dtype=dtype)
        if bias:
            p[f"{pre}.bias"] = jnp.zeros((d,), dtype=dtype)

    hid = cfg.hidden_size
    q3 = cfg.arch == "qwen3vl"
    if cfg.split_patch_embed:
        p["visual.patch_embed.proj.0.weight"] = wt(hid, 3, cfg.patch_size, cfg.patch_size)
        p["visual.patch_embed.proj.1.weight"] = wt(hid, 3, cfg.patch_size, cfg.patch_size)
        if q3:
            p["visual.patch_embed.proj.bias"] = jnp.zeros((hid,), dtype=dtype)
    else:
        p["visual.patch_embed.proj.weight"] = wt(
            hid, 3, cfg.temporal_patch_size, cfg.patch_size, cfg.patch_size)
        if q3:
            p["visual.patch_embed.proj.bias"] = jnp.zeros((hid,), dtype=dtype)
    if cfg.num_position_embeddings:
        p["visual.pos_embed.weight"] = wt(cfg.num_position_embeddings, hid)
    for i in range(cfg.num_layers):
        pre = f"visual.blocks.{i}"
        norm(f"{pre}.norm1", hid, bias=q3)
        norm(f"{pre}.norm2", hid, bias=q3)
        lin(f"{pre}.attn.qkv", 3 * hid, hid)
        lin(f"{pre}.attn.proj", hid, hid)
        if q3:
            lin(f"{pre}.mlp.linear_fc1", cfg.intermediate_size, hid)
            lin(f"{pre}.mlp.linear_fc2", hid, cfg.intermediate_size)
        else:
            lin(f"{pre}.mlp.gate_proj", cfg.intermediate_size, hid)
            lin(f"{pre}.mlp.up_proj", cfg.intermediate_size, hid)
            lin(f"{pre}.mlp.down_proj", hid, cfg.intermediate_size)
    md = hid * cfg.spatial_merge_size**2
    if q3:
        norm("visual.merger.norm", hid, bias=True)
        lin("visual.merger.linear_fc1", md, md)
        lin("visual.merger.linear_fc2", cfg.out_hidden_size, md)
    else:
        norm("visual.merger.ln_q", hid, bias=False)
        lin("visual.merger.mlp.0", md, md)
        lin("visual.merger.mlp.2", cfg.out_hidden_size, md)
    return p

"""Spatial VAE tiling with feathered overlap blending.

Reference analog: process_tiles_2d / sd_tiling_calc_tiles
(src/core/ggml_extend.hpp:824, :691) used by VAE::encode/decode
(src/model/vae/vae.hpp:32): the image/latent plane splits into overlapping
tiles, each runs through the (jitted once — all tiles share a shape) VAE, and
outputs blend with linear feather ramps in the overlap bands.  Works for
images [B, H, W, C] and videos [B, T, H, W, C] (spatial axes are the last two
before channels).
"""
from __future__ import annotations

from typing import Callable, List, Tuple

import numpy as np


def _tile_starts(size: int, tile: int, stride: int) -> List[int]:
    """Tile origins covering [0, size): stride apart, last tile clamped flush
    with the edge."""
    if size <= tile:
        return [0]
    starts = list(range(0, size - tile, stride))
    starts.append(size - tile)
    return starts


def _feather(tile: int, overlap: int) -> np.ndarray:
    """1-D blend weights: linear ramp over the overlap band, never zero."""
    w = np.ones(tile, dtype=np.float32)
    if overlap > 0:
        ramp = np.linspace(1.0 / (overlap + 1), 1.0, overlap, dtype=np.float32)
        w[:overlap] = ramp
        w[-overlap:] = ramp[::-1]
    return w


def tiled_apply(
    fn: Callable,
    x,
    tile: int,
    overlap: int,
    out_scale: int,
    out_channels: int,
):
    """Apply fn tile-wise over the spatial plane of x.

    fn: jittable tile → tile' where spatial dims scale by out_scale (integer
    up-scale for decode; for encode pass the DOWN-scale as out_scale=1 with
    tile sized in pixels and fn returning tile//8 — see tiled_encode below).
    """
    import jax.numpy as jnp

    x = np.asarray(x)
    h_ax, w_ax = x.ndim - 3, x.ndim - 2
    H, W = x.shape[h_ax], x.shape[w_ax]
    stride = max(tile - overlap, 1)
    ys = _tile_starts(H, tile, stride)
    xs = _tile_starts(W, tile, stride)
    if len(ys) == 1 and len(xs) == 1:
        return np.asarray(fn(jnp.asarray(x)))

    th = min(tile, H)
    tw = min(tile, W)
    canvas = None  # allocated from the first tile's output shape (video
    # VAEs may change non-spatial dims like the frame count)
    weight = np.zeros((H * out_scale, W * out_scale, 1), dtype=np.float32)

    fy = _feather(th * out_scale, overlap * out_scale)
    fx = _feather(tw * out_scale, overlap * out_scale)
    mask = (fy[:, None] * fx[None, :])[..., None]  # [th*s, tw*s, 1]

    def _slice(arr, y0, x0, hh, ww):
        idx = [slice(None)] * arr.ndim
        idx[h_ax] = slice(y0, y0 + hh)
        idx[w_ax] = slice(x0, x0 + ww)
        return tuple(idx)

    for y0 in ys:
        for x0 in xs:
            tile_in = x[_slice(x, y0, x0, th, tw)]
            tile_out = np.asarray(fn(jnp.asarray(tile_in)), dtype=np.float32)
            if canvas is None:
                out_shape = list(tile_out.shape)
                out_shape[h_ax] = H * out_scale
                out_shape[w_ax] = W * out_scale
                canvas = np.zeros(out_shape, dtype=np.float32)
            oy, ox = y0 * out_scale, x0 * out_scale
            sl = _slice(canvas, oy, ox, th * out_scale, tw * out_scale)
            canvas[sl] += tile_out * mask
            weight[oy : oy + th * out_scale, ox : ox + tw * out_scale] += mask
    return canvas / np.maximum(weight, 1e-8)


def tiled_decode(decode_fn, z, tile: int = 64, overlap: int = 8,
                 scale_factor: int = 8, out_channels: int = 3):
    """Latent → pixels, tile/overlap in LATENT units (reference default
    32-96 latent tiles)."""
    return tiled_apply(decode_fn, z, tile, overlap, scale_factor, out_channels)


def tiled_encode(encode_fn, x, tile: int = 512, overlap: int = 64,
                 scale_factor: int = 8, out_channels: int = 4):
    """Pixels → latent, tile/overlap in PIXEL units (must be multiples of the
    scale factor)."""

    import jax.numpy as jnp

    x = np.asarray(x)
    h_ax, w_ax = x.ndim - 3, x.ndim - 2
    H, W = x.shape[h_ax], x.shape[w_ax]
    s = scale_factor
    stride = max(tile - overlap, 1)
    ys = _tile_starts(H, tile, stride)
    xs = _tile_starts(W, tile, stride)
    if len(ys) == 1 and len(xs) == 1:
        return np.asarray(encode_fn(jnp.asarray(x)))

    th, tw = min(tile, H), min(tile, W)
    out_shape = list(x.shape)
    out_shape[h_ax] = H // s
    out_shape[w_ax] = W // s
    out_shape[-1] = out_channels
    canvas = np.zeros(out_shape, dtype=np.float32)
    weight = np.zeros((H // s, W // s, 1), dtype=np.float32)
    fy = _feather(th // s, overlap // s)
    fx = _feather(tw // s, overlap // s)
    mask = (fy[:, None] * fx[None, :])[..., None]

    def _slice(arr, y0, x0, hh, ww):
        idx = [slice(None)] * arr.ndim
        idx[h_ax] = slice(y0, y0 + hh)
        idx[w_ax] = slice(x0, x0 + ww)
        return tuple(idx)

    for y0 in ys:
        for x0 in xs:
            t_in = x[_slice(x, y0, x0, th, tw)]
            t_out = np.asarray(encode_fn(jnp.asarray(t_in)), dtype=np.float32)
            oy, ox = y0 // s, x0 // s
            sl = _slice(canvas, oy, ox, th // s, tw // s)
            canvas[sl] += t_out * mask
            weight[oy : oy + th // s, ox : ox + tw // s] += mask
    return canvas / np.maximum(weight, 1e-8)


def tiled_decode_temporal(decode_fn, z, frames: int = 16, overlap: int = 4,
                          temporal_scale: int = 4):
    """Temporal-tiled video decode (reference LTX decode_tiled,
    ltx_vae.hpp:1100-1160 + sd_tiling_params_t.temporal_tiling): the latent
    clip splits into windows of `frames` latent frames advancing by
    `frames - overlap`; each window decodes independently and the output
    frames belonging to the `overlap` context prefix are dropped.

    The reference carries conv features across chunks (feat_map); here the
    `overlap` latent frames ARE the causal context window, so results
    converge to the full-clip decode as overlap grows (exact for receptive
    fields ≤ overlap).  For causal VAEs latent frame 0 of a window decodes
    to 1 output frame and later frames to `temporal_scale` each — use
    overlap ≥ 1 so interior windows never re-enter the frame-0 special case.
    """
    z = np.asarray(z)
    T = z.shape[1]
    frames = max(1, frames)
    overlap = max(0, min(overlap, frames - 1))
    if T <= frames:
        return np.asarray(decode_fn(z))
    stride = frames - overlap
    outs = []
    s = 0
    while True:
        e = min(T, s + frames)
        y = np.asarray(decode_fn(z[:, s:e]))
        if s > 0 and overlap > 0:
            drop = 1 + temporal_scale * (overlap - 1)
            y = y[:, drop:]
        outs.append(y)
        if e == T:
            break
        s += stride
    return np.concatenate(outs, axis=1)

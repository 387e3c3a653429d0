"""LTX latent spatial/temporal upsampler: a small 3-D conv resnet that
upscales the *latent* video (x2 spatial pixel-shuffle, or x1.5 rational
resample, or x2 temporal) between the base sampling pass and a hires refine
pass.  Operates on UN-normalized latents (the caller un-normalizes with the
video VAE statistics first, re-normalizes after — reference
upscale_ltx_spatial_video_latent, src/stable-diffusion.cpp:6145).

Reference analog: LTXVUpsampler::LatentUpsampler / LatentUpsamplerRunner
(src/model/upscaler/ltx_latent_upscaler.hpp:333,431).  Checkpoint names:
``initial_conv.*``, ``initial_norm.*``, ``res_blocks.N.{conv1,norm1,conv2,
norm2}.*``, ``upsampler.{0.*,conv.*}``, ``post_upsample_res_blocks.N.*``,
``final_conv.*``.

Layout: latent [B, T, H, W, C=128] channels-last.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sdtpu.ops import conv2d, group_norm
from sdtpu.ops.basic import matmul_precision, silu


@dataclasses.dataclass(frozen=True)
class LatentUpsamplerConfig:
    in_channels: int = 128
    mid_channels: int = 1024
    num_blocks_per_stage: int = 4
    spatial_upsample: bool = True
    temporal_upsample: bool = False
    rational_resampler: bool = False
    spatial_up_num: int = 2
    spatial_down_den: int = 1
    temporal_up_factor: int = 1

    @property
    def spatial_scale(self) -> float:
        return self.spatial_up_num / self.spatial_down_den


def detect_upsampler_config(names, shapes) -> LatentUpsamplerConfig:
    """Reference LatentUpsamplerConfig::detect_from_weights
    (ltx_latent_upscaler.hpp:36)."""
    names = set(names)
    kw: Dict = {}
    norm = shapes.get("initial_norm.weight")
    if norm:
        kw["mid_channels"] = norm[0]
    fc = shapes.get("final_conv.bias")
    if fc:
        kw["in_channels"] = fc[0]
    n = 0
    for name in names:
        if name.startswith("res_blocks."):
            n = max(n, int(name.split(".")[1]) + 1)
    if n:
        kw["num_blocks_per_stage"] = n
    mid = kw.get("mid_channels", 1024)
    rational = shapes.get("upsampler.conv.weight")
    up0 = shapes.get("upsampler.0.bias")
    kw["rational_resampler"] = rational is not None
    out0 = up0[0] if up0 else 0
    kw["spatial_upsample"] = rational is not None or out0 == 4 * mid
    kw["temporal_upsample"] = out0 == 2 * mid
    if kw["temporal_upsample"]:
        kw["temporal_up_factor"] = 2
    if rational is not None:
        ratio = rational[0] // mid
        num = int(round(math.sqrt(ratio)))
        if num * num == ratio and num > 0:
            kw["spatial_up_num"] = num
        kw["spatial_down_den"] = 2 if kw.get("spatial_up_num", 2) == 3 else 1
    return dataclasses.replace(LatentUpsamplerConfig(), **kw)


def _conv3d(p, pre, x):
    w = p[f"{pre}.weight"]  # [O, I, 3, 3, 3]
    kernel = jnp.transpose(w, (2, 3, 4, 1, 0))
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=(1, 1, 1),
        padding=((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x.dtype, precision=matmul_precision(x.dtype))
    b = p.get(f"{pre}.bias")
    return y + b.astype(y.dtype) if b is not None else y


def _vgroup_norm(p, pre, x, groups=32):
    """VideoGroupNorm (ltx_latent_upscaler.hpp:130): group-norm over
    (T, H, W) jointly per channel group."""
    b, t, h, w, c = x.shape
    y = group_norm(x.reshape(b, t * h, w, c), p[f"{pre}.weight"],
                   p[f"{pre}.bias"], num_groups=groups, eps=1e-5)
    return y.reshape(b, t, h, w, c)


def _resblock(p, pre, x):
    h = _conv3d(p, f"{pre}.conv1", x)
    h = _vgroup_norm(p, f"{pre}.norm1", h)
    h = silu(h)
    h = _conv3d(p, f"{pre}.conv2", h)
    h = _vgroup_norm(p, f"{pre}.norm2", h)
    return silu(x + h)


def _pixel_shuffle_hw(x, r):
    """[B*T merged in caller] [B, T, H, W, C*r*r] -> [B, T, H*r, W*r, C];
    channel order (c, rh, rw) (PixelShuffleND via DiT::unpatchify)."""
    b, t, h, w, crr = x.shape
    c = crr // (r * r)
    y = x.reshape(b, t, h, w, c, r, r)
    y = y.transpose(0, 1, 2, 5, 3, 6, 4)
    return y.reshape(b, t, h * r, w * r, c)


def _blur_downsample(x, stride):
    """Depthwise 5x5 binomial blur + stride (BlurDownsample,
    ltx_latent_upscaler.hpp:249)."""
    if stride == 1:
        return x
    binom = np.array([1, 4, 6, 4, 1], dtype=np.float32)
    k2 = np.outer(binom, binom) / 256.0
    b, t, h, w, c = x.shape
    kernel = jnp.asarray(np.tile(k2[:, :, None, None], (1, 1, 1, c)), x.dtype)
    y = jax.lax.conv_general_dilated(
        x.reshape(b * t, h, w, c), kernel, window_strides=(stride, stride),
        padding=((2, 2), (2, 2)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        preferred_element_type=x.dtype, precision=matmul_precision(x.dtype))
    return y.reshape(b, t, *y.shape[1:])


def latent_upsample(p, x: jnp.ndarray,
                    cfg: Optional[LatentUpsamplerConfig] = None) -> jnp.ndarray:
    """x: [B, T, H, W, C] un-normalized latent -> upsampled latent
    (LatentUpsampler::forward, ltx_latent_upscaler.hpp:380)."""
    if cfg is None:
        cfg = detect_upsampler_config(
            set(p.keys()), {k: tuple(v.shape) for k, v in p.items()})
    x = _conv3d(p, "initial_conv", x)
    x = _vgroup_norm(p, "initial_norm", x)
    x = silu(x)
    for i in range(cfg.num_blocks_per_stage):
        x = _resblock(p, f"res_blocks.{i}", x)

    if cfg.rational_resampler:
        b, t, h, w, c = x.shape
        y = conv2d(x.reshape(b * t, h, w, c), p["upsampler.conv.weight"],
                   p.get("upsampler.conv.bias"), padding=1)
        y = y.reshape(b, t, h, w, -1)
        y = _pixel_shuffle_hw(y, cfg.spatial_up_num)
        x = _blur_downsample(y, cfg.spatial_down_den)
    elif cfg.temporal_upsample:
        x = _conv3d(p, "upsampler.0", x)  # [.., C*2]
        b, t, h, w, c2 = x.shape
        c = c2 // cfg.temporal_up_factor
        y = x.reshape(b, t, h, w, c, cfg.temporal_up_factor)
        y = y.transpose(0, 1, 5, 2, 3, 4).reshape(
            b, t * cfg.temporal_up_factor, h, w, c)
        x = y[:, 1:]  # drop duplicated first frame
    else:
        b, t, h, w, c = x.shape
        y = conv2d(x.reshape(b * t, h, w, c), p["upsampler.0.weight"],
                   p.get("upsampler.0.bias"), padding=1)
        y = y.reshape(b, t, h, w, -1)
        x = _pixel_shuffle_hw(y, 2)

    for i in range(cfg.num_blocks_per_stage):
        x = _resblock(p, f"post_upsample_res_blocks.{i}", x)
    return _conv3d(p, "final_conv", x)


def init_upsampler_params(cfg: LatentUpsamplerConfig, seed: int = 0,
                          dtype=jnp.float32) -> dict:
    g = np.random.default_rng(seed)

    def w(*shape, scale=0.03):
        return jnp.asarray(g.standard_normal(shape, dtype=np.float32) * scale,
                           dtype=dtype)

    def c3(p, pre, o, i):
        p[f"{pre}.weight"] = w(o, i, 3, 3, 3, scale=0.02)
        p[f"{pre}.bias"] = jnp.zeros((o,), dtype=dtype)

    def gn(p, pre, c):
        p[f"{pre}.weight"] = jnp.ones((c,), dtype=dtype)
        p[f"{pre}.bias"] = jnp.zeros((c,), dtype=dtype)

    def res(p, pre, c):
        c3(p, f"{pre}.conv1", c, c)
        gn(p, f"{pre}.norm1", c)
        c3(p, f"{pre}.conv2", c, c)
        gn(p, f"{pre}.norm2", c)

    p: dict = {}
    mid = cfg.mid_channels
    c3(p, "initial_conv", mid, cfg.in_channels)
    gn(p, "initial_norm", mid)
    for i in range(cfg.num_blocks_per_stage):
        res(p, f"res_blocks.{i}", mid)
    if cfg.rational_resampler:
        n = cfg.spatial_up_num
        p["upsampler.conv.weight"] = w(n * n * mid, mid, 3, 3, scale=0.02)
        p["upsampler.conv.bias"] = jnp.zeros((n * n * mid,), dtype=dtype)
    elif cfg.temporal_upsample:
        c3(p, "upsampler.0", 2 * mid, mid)
    else:
        p["upsampler.0.weight"] = w(4 * mid, mid, 3, 3, scale=0.02)
        p["upsampler.0.bias"] = jnp.zeros((4 * mid,), dtype=dtype)
    for i in range(cfg.num_blocks_per_stage):
        res(p, f"post_upsample_res_blocks.{i}", mid)
    c3(p, "final_conv", cfg.in_channels, mid)
    return p

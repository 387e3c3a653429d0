"""AutoencoderKL (SD 2-D VAE) encode/decode as pure JAX functions.

Reference analog: AutoEncoderKL (src/model/vae/auto_encoder_kl.hpp:662) with
spatial tiling handled at the pipeline level (vae.hpp:32).  Params are keyed
by original CompVis first_stage_model names (``encoder.down.N.block.M.…``),
NHWC activations.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from sdtpu.ops import attention, conv2d, group_norm
from sdtpu.ops.basic import silu


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    z_channels: int = 4
    base_channels: int = 128
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    scale_factor: float = 0.18215  # SD1/2; SDXL uses 0.13025
    shift_factor: float = 0.0  # SDXL/Flux-style latents may shift


SD_VAE_CONFIG = VAEConfig()
SDXL_VAE_CONFIG = VAEConfig(scale_factor=0.13025)
SD3_VAE_CONFIG = VAEConfig(z_channels=16, scale_factor=1.5305, shift_factor=0.0609)
FLUX_VAE_CONFIG = VAEConfig(z_channels=16, scale_factor=0.3611, shift_factor=0.1159)


def _resnet(p, pre: str, x: jnp.ndarray) -> jnp.ndarray:
    out_ch = p[f"{pre}.conv1.weight"].shape[0]
    h = group_norm(x, p[f"{pre}.norm1.weight"], p[f"{pre}.norm1.bias"], eps=1e-6)
    h = silu(h)
    h = conv2d(h, p[f"{pre}.conv1.weight"], p[f"{pre}.conv1.bias"])
    h = group_norm(h, p[f"{pre}.norm2.weight"], p[f"{pre}.norm2.bias"], eps=1e-6)
    h = silu(h)
    h = conv2d(h, p[f"{pre}.conv2.weight"], p[f"{pre}.conv2.bias"])
    if x.shape[-1] != out_ch:
        x = conv2d(x, p[f"{pre}.nin_shortcut.weight"], p[f"{pre}.nin_shortcut.bias"], padding=0)
    return x + h


def _attn(p, pre: str, x: jnp.ndarray) -> jnp.ndarray:
    """Single-head spatial self-attention with 1x1-conv projections."""
    b, hh, ww, c = x.shape
    h = group_norm(x, p[f"{pre}.norm.weight"], p[f"{pre}.norm.bias"], eps=1e-6)
    q = conv2d(h, p[f"{pre}.q.weight"], p[f"{pre}.q.bias"], padding=0).reshape(b, 1, hh * ww, c)
    k = conv2d(h, p[f"{pre}.k.weight"], p[f"{pre}.k.bias"], padding=0).reshape(b, 1, hh * ww, c)
    v = conv2d(h, p[f"{pre}.v.weight"], p[f"{pre}.v.bias"], padding=0).reshape(b, 1, hh * ww, c)
    o = attention(q, k, v).reshape(b, hh, ww, c)
    o = conv2d(o, p[f"{pre}.proj_out.weight"], p[f"{pre}.proj_out.bias"], padding=0)
    return x + o


def vae_encode_moments(p, x: jnp.ndarray, cfg: VAEConfig = SD_VAE_CONFIG) -> jnp.ndarray:
    """x: [B,H,W,3] in [-1,1] → moments [B,H/8,W/8,2z] (mean | logvar)."""
    h = conv2d(x, p["encoder.conv_in.weight"], p["encoder.conv_in.bias"])
    n_levels = len(cfg.channel_mult)
    for i in range(n_levels):
        for j in range(cfg.num_res_blocks):
            h = _resnet(p, f"encoder.down.{i}.block.{j}", h)
        if i != n_levels - 1:
            # CompVis downsample: asymmetric (0,1) pad then stride-2 valid conv
            h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
            h = conv2d(
                h,
                p[f"encoder.down.{i}.downsample.conv.weight"],
                p[f"encoder.down.{i}.downsample.conv.bias"],
                stride=2,
                padding=0,
            )
    h = _resnet(p, "encoder.mid.block_1", h)
    h = _attn(p, "encoder.mid.attn_1", h)
    h = _resnet(p, "encoder.mid.block_2", h)
    h = group_norm(h, p["encoder.norm_out.weight"], p["encoder.norm_out.bias"], eps=1e-6)
    h = silu(h)
    h = conv2d(h, p["encoder.conv_out.weight"], p["encoder.conv_out.bias"])
    return conv2d(h, p["quant_conv.weight"], p["quant_conv.bias"], padding=0)


def vae_encode(
    p,
    x: jnp.ndarray,
    noise: Optional[jnp.ndarray] = None,
    cfg: VAEConfig = SD_VAE_CONFIG,
) -> jnp.ndarray:
    """Encode to scaled latent. noise=None → deterministic (mean)."""
    moments = vae_encode_moments(p, x, cfg)
    mean, logvar = jnp.split(moments, 2, axis=-1)
    if noise is not None:
        std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
        mean = mean + std * noise.astype(mean.dtype)
    return (mean - cfg.shift_factor) * cfg.scale_factor


def vae_decode(p, z: jnp.ndarray, cfg: VAEConfig = SD_VAE_CONFIG) -> jnp.ndarray:
    """z: scaled latent [B,h,w,zc] → image [B,8h,8w,3] in [-1,1]."""
    z = z / cfg.scale_factor + cfg.shift_factor
    h = conv2d(z, p["post_quant_conv.weight"], p["post_quant_conv.bias"], padding=0)
    h = conv2d(h, p["decoder.conv_in.weight"], p["decoder.conv_in.bias"])
    h = _resnet(p, "decoder.mid.block_1", h)
    h = _attn(p, "decoder.mid.attn_1", h)
    h = _resnet(p, "decoder.mid.block_2", h)
    n_levels = len(cfg.channel_mult)
    for i in reversed(range(n_levels)):
        for j in range(cfg.num_res_blocks + 1):
            h = _resnet(p, f"decoder.up.{i}.block.{j}", h)
        if i != 0:
            h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
            h = conv2d(
                h,
                p[f"decoder.up.{i}.upsample.conv.weight"],
                p[f"decoder.up.{i}.upsample.conv.bias"],
            )
    h = group_norm(h, p["decoder.norm_out.weight"], p["decoder.norm_out.bias"], eps=1e-6)
    h = silu(h)
    return conv2d(h, p["decoder.conv_out.weight"], p["decoder.conv_out.bias"])


def init_vae_params(cfg: VAEConfig = SD_VAE_CONFIG, seed: int = 0, dtype=jnp.float32) -> dict:
    import numpy as np

    g = np.random.default_rng(seed)
    p = {}

    def conv(name, out_c, in_c, k=3):
        p[f"{name}.weight"] = jnp.asarray(
            g.standard_normal((out_c, in_c, k, k), dtype=np.float32) * 0.02, dtype=dtype
        )
        p[f"{name}.bias"] = jnp.zeros((out_c,), dtype=dtype)

    def norm(name, ch):
        p[f"{name}.weight"] = jnp.ones((ch,), dtype=dtype)
        p[f"{name}.bias"] = jnp.zeros((ch,), dtype=dtype)

    def res(pre, in_c, out_c):
        norm(f"{pre}.norm1", in_c)
        conv(f"{pre}.conv1", out_c, in_c)
        norm(f"{pre}.norm2", out_c)
        conv(f"{pre}.conv2", out_c, out_c)
        if in_c != out_c:
            conv(f"{pre}.nin_shortcut", out_c, in_c, k=1)

    def attn(pre, ch):
        norm(f"{pre}.norm", ch)
        for nm in ("q", "k", "v", "proj_out"):
            conv(f"{pre}.{nm}", ch, ch, k=1)

    bc = cfg.base_channels
    # encoder
    conv("encoder.conv_in", bc, cfg.in_channels)
    ch = bc
    for i, mult in enumerate(cfg.channel_mult):
        out_c = bc * mult
        for j in range(cfg.num_res_blocks):
            res(f"encoder.down.{i}.block.{j}", ch, out_c)
            ch = out_c
        if i != len(cfg.channel_mult) - 1:
            conv(f"encoder.down.{i}.downsample.conv", ch, ch)
    res("encoder.mid.block_1", ch, ch)
    attn("encoder.mid.attn_1", ch)
    res("encoder.mid.block_2", ch, ch)
    norm("encoder.norm_out", ch)
    conv("encoder.conv_out", 2 * cfg.z_channels, ch)
    conv("quant_conv", 2 * cfg.z_channels, 2 * cfg.z_channels, k=1)
    # decoder
    conv("post_quant_conv", cfg.z_channels, cfg.z_channels, k=1)
    top = bc * cfg.channel_mult[-1]
    conv("decoder.conv_in", top, cfg.z_channels)
    res("decoder.mid.block_1", top, top)
    attn("decoder.mid.attn_1", top)
    res("decoder.mid.block_2", top, top)
    ch = top
    for i in reversed(range(len(cfg.channel_mult))):
        out_c = bc * cfg.channel_mult[i]
        for j in range(cfg.num_res_blocks + 1):
            res(f"decoder.up.{i}.block.{j}", ch, out_c)
            ch = out_c
        if i != 0:
            conv(f"decoder.up.{i}.upsample.conv", ch, ch)
    norm("decoder.norm_out", ch)
    conv("decoder.conv_out", cfg.in_channels, ch)
    return p

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
import numpy as np

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
# FLUX.2 family (also ERNIE/Lens/Ideogram4/SeFi): 32-ch KL VAE whose latents
# are 2x2 pixel-shuffled into 128 channels and normalized per channel
# (reference auto_encoder_kl.hpp:546,591,773)
FLUX2_VAE_CONFIG = VAEConfig(z_channels=32, scale_factor=1.0, shift_factor=0.0)


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
    if "quant_conv.weight" in p:  # 16-ch DiT VAEs (flux/SD3) ship without it
        h = conv2d(h, p["quant_conv.weight"], p["quant_conv.bias"], padding=0)
    return h


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
    if "post_quant_conv.weight" in p:
        z = conv2d(z, p["post_quant_conv.weight"], p["post_quant_conv.bias"], padding=0)
    h = conv2d(z, p["decoder.conv_in.weight"], p["decoder.conv_in.bias"])
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


# ---------------------------------------------------------------- FLUX.2 VAE
# Per-channel statistics of the packed 128-ch latent (reference
# auto_encoder_kl.hpp:778-806, get_latents_mean_std).
FLUX2_LATENT_MEAN = np.array([
    -0.0676, -0.0715, -0.0753, -0.0745, 0.0223, 0.0180, 0.0142, 0.0184,
    -0.0001, -0.0063, -0.0002, -0.0031, -0.0272, -0.0281, -0.0276, -0.0290,
    -0.0769, -0.0672, -0.0902, -0.0892, 0.0168, 0.0152, 0.0079, 0.0086,
    0.0083, 0.0015, 0.0003, -0.0043, -0.0439, -0.0419, -0.0438, -0.0431,
    -0.0102, -0.0132, -0.0066, -0.0048, -0.0311, -0.0306, -0.0279, -0.0180,
    0.0030, 0.0015, 0.0126, 0.0145, 0.0347, 0.0338, 0.0337, 0.0283,
    0.0020, 0.0047, 0.0047, 0.0050, 0.0123, 0.0081, 0.0081, 0.0146,
    0.0681, 0.0679, 0.0767, 0.0732, -0.0462, -0.0474, -0.0392, -0.0511,
    -0.0528, -0.0477, -0.0470, -0.0517, -0.0317, -0.0316, -0.0345, -0.0283,
    0.0510, 0.0445, 0.0578, 0.0458, -0.0412, -0.0458, -0.0487, -0.0467,
    -0.0088, -0.0106, -0.0088, -0.0046, -0.0376, -0.0432, -0.0436, -0.0499,
    0.0118, 0.0166, 0.0203, 0.0279, 0.0113, 0.0129, 0.0016, 0.0072,
    -0.0118, -0.0018, -0.0141, -0.0054, -0.0091, -0.0138, -0.0145, -0.0187,
    0.0323, 0.0305, 0.0259, 0.0300, 0.0540, 0.0614, 0.0495, 0.0590,
    -0.0511, -0.0603, -0.0478, -0.0524, -0.0227, -0.0274, -0.0154, -0.0255,
    -0.0572, -0.0565, -0.0518, -0.0496, 0.0116, 0.0054, 0.0163, 0.0104,
], dtype=np.float32)
FLUX2_LATENT_STD = np.array([
    1.8029, 1.7786, 1.7868, 1.7837, 1.7717, 1.7590, 1.7610, 1.7479,
    1.7336, 1.7373, 1.7340, 1.7343, 1.8626, 1.8527, 1.8629, 1.8589,
    1.7593, 1.7526, 1.7556, 1.7583, 1.7363, 1.7400, 1.7355, 1.7394,
    1.7342, 1.7246, 1.7392, 1.7304, 1.7551, 1.7513, 1.7559, 1.7488,
    1.8449, 1.8454, 1.8550, 1.8535, 1.8240, 1.7813, 1.7854, 1.7945,
    1.8047, 1.7876, 1.7695, 1.7676, 1.7782, 1.7667, 1.7925, 1.7848,
    1.7579, 1.7407, 1.7483, 1.7368, 1.7961, 1.7998, 1.7920, 1.7925,
    1.7780, 1.7747, 1.7727, 1.7749, 1.7526, 1.7447, 1.7657, 1.7495,
    1.7775, 1.7720, 1.7813, 1.7813, 1.8162, 1.8013, 1.8023, 1.8033,
    1.7527, 1.7331, 1.7563, 1.7482, 1.7610, 1.7507, 1.7681, 1.7613,
    1.7665, 1.7545, 1.7828, 1.7726, 1.7896, 1.7999, 1.7864, 1.7760,
    1.7613, 1.7625, 1.7560, 1.7577, 1.7783, 1.7671, 1.7810, 1.7799,
    1.7201, 1.7068, 1.7265, 1.7091, 1.7793, 1.7578, 1.7502, 1.7455,
    1.7587, 1.7500, 1.7525, 1.7362, 1.7616, 1.7572, 1.7444, 1.7430,
    1.7509, 1.7610, 1.7634, 1.7612, 1.7254, 1.7135, 1.7321, 1.7226,
    1.7664, 1.7624, 1.7718, 1.7664, 1.7457, 1.7441, 1.7569, 1.7530,
], dtype=np.float32)


def flux2_pack(z: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, 32] -> [B, H/2, W/2, 128]; channel = (c, row_off, col_off)
    (reference encode pack, auto_encoder_kl.hpp:648)."""
    b, hh, ww, c = z.shape
    y = z.reshape(b, hh // 2, 2, ww // 2, 2, c)
    y = y.transpose(0, 1, 3, 5, 2, 4)  # [B, h, w, C, p1, p2]
    return y.reshape(b, hh // 2, ww // 2, c * 4)


def flux2_unpack(z: jnp.ndarray) -> jnp.ndarray:
    """[B, h, w, 128] -> [B, 2h, 2w, 32]."""
    b, hh, ww, cpp = z.shape
    c = cpp // 4
    y = z.reshape(b, hh, ww, c, 2, 2)
    y = y.transpose(0, 1, 4, 2, 5, 3)
    return y.reshape(b, hh * 2, ww * 2, c)


def flux2_vae_decode(p, z: jnp.ndarray, cfg: VAEConfig = FLUX2_VAE_CONFIG) -> jnp.ndarray:
    """z: [B, h, w, 128] normalized packed latent -> image
    (diffusion_to_vae_latents + unpack + AutoencoderKL decode)."""
    z = z * jnp.asarray(FLUX2_LATENT_STD, z.dtype) + jnp.asarray(FLUX2_LATENT_MEAN, z.dtype)
    z32 = flux2_unpack(z)
    return vae_decode(p, z32 * cfg.scale_factor, cfg)


def flux2_vae_encode(p, x: jnp.ndarray, noise=None,
                     cfg: VAEConfig = FLUX2_VAE_CONFIG) -> jnp.ndarray:
    """image -> normalized packed 128-ch latent (encode mean channel, pack,
    normalize; reference encode, auto_encoder_kl.hpp:625-664)."""
    moments = vae_encode_moments(p, x, cfg)
    mean = jnp.split(moments, 2, axis=-1)[0]
    z = flux2_pack(mean)
    return (z - jnp.asarray(FLUX2_LATENT_MEAN, z.dtype)) / jnp.asarray(
        FLUX2_LATENT_STD, z.dtype)

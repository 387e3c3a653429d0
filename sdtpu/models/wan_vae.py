"""Wan 2.1 3-D causal video VAE (8× spatial, 4× temporal compression, 16ch).

Reference analog: WanVAERunner (src/model/vae/wan_vae.hpp:1243; upstream
Wan-Video/Wan2.1 wan/modules/vae.py).  Checkpoint naming:
``{encoder,decoder}.conv1``, ``…downsamples.N`` / ``…upsamples.N``
(residual.{0,2,3,6}, shortcut, resample.1, time_conv), ``…middle.{0,1,2}``,
``…head.{0,2}``, ``conv1``/``conv2`` (quant convs).

TPU-first design: the reference decodes chunked (one latent frame at a time
with per-conv feat caches, CACHE_T=2).  Here the whole clip runs as ONE jitted
forward — every causal temporal conv becomes a zero-front-padded 3-D conv over
the full sequence, which is mathematically identical to the rolling feat-cache
recursion but keeps the MXU busy with large batched convs.  The frame-0
special case of the chunked scheme (first frame never passes through
time_conv) is preserved exactly: temporal up/down-sample layers pass frame 0
through and convolve frames 1…T.

Video tensors are NTHWC: [B, T, H, W, C].
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sdtpu.ops import rms_norm
from sdtpu.ops.basic import matmul_precision, silu


@dataclasses.dataclass(frozen=True)
class WanVAEConfig:
    dim: int = 96
    z_dim: int = 16
    input_channels: int = 3
    dim_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    temporal_downsample: Tuple[bool, ...] = (False, True, True)  # per level
    temporal_upsample: Tuple[bool, ...] = (True, True, False)


WAN21_VAE_CONFIG = WanVAEConfig()

# per-channel latent statistics (reference wan_vae.hpp:1289-1296)
WAN21_LATENTS_MEAN = np.array(
    [-0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517, 1.5508,
     0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497, 0.2503, -0.2921],
    dtype=np.float32,
)
WAN21_LATENTS_STD = np.array(
    [2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
     3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160],
    dtype=np.float32,
)


def vae_to_diffusion_latents(z: jnp.ndarray) -> jnp.ndarray:
    """(z - mean) / std, channel-last (reference wan_vae.hpp:1327)."""
    return (z - WAN21_LATENTS_MEAN) / WAN21_LATENTS_STD


def diffusion_to_vae_latents(z: jnp.ndarray) -> jnp.ndarray:
    # dtype-preserving: f32 stats constants must not promote a bf16 decode
    # back to f32 (the un-scaled latent feeds the whole decoder stack)
    return (z * WAN21_LATENTS_STD.astype(z.dtype)
            + WAN21_LATENTS_MEAN.astype(z.dtype))


# ------------------------------------------------------------------ primitives


def causal_conv3d(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    stride: Tuple[int, int, int] = (1, 1, 1),
    spatial_pad: Optional[int] = None,
    temporal_pad: Optional[int] = None,
) -> jnp.ndarray:
    """x: [B,T,H,W,C]; weight torch layout [O, I, kt, kh, kw].  Temporal
    padding is causal: (kt-1) zero frames prepended (reference CausalConv3d,
    wan_vae.hpp:16)."""
    kt, kh, kw = weight.shape[2], weight.shape[3], weight.shape[4]
    sp = kh // 2 if spatial_pad is None else spatial_pad
    tp = kt - 1 if temporal_pad is None else temporal_pad
    kernel = jnp.transpose(weight, (2, 3, 4, 1, 0))  # → DHWIO
    y = jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=stride,
        padding=((tp, 0), (sp, sp), (sp, sp)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x.dtype,
        precision=matmul_precision(x.dtype),
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def _conv2d_frames(x, weight, bias, stride=1, padding=1):
    """2-D conv applied per frame: x [B,T,H,W,C], weight OIHW."""
    from sdtpu.ops import conv2d

    b, t, h, w, c = x.shape
    y = conv2d(x.reshape(b * t, h, w, c), weight, bias, stride=stride, padding=padding)
    return y.reshape(b, t, *y.shape[1:])


def _rms(p, name, x):
    """Channel RMS-norm; checkpoint gamma shape [C,1,1] (reference RMS_norm,
    wan_vae.hpp:83)."""
    return rms_norm(x, p[f"{name}.gamma"].reshape(-1), eps=1e-12)


def _resblock(p, pre, x):
    h = _rms(p, f"{pre}.residual.0", x)
    h = causal_conv3d(silu(h), p[f"{pre}.residual.2.weight"], p[f"{pre}.residual.2.bias"])
    h = _rms(p, f"{pre}.residual.3", h)
    h = causal_conv3d(silu(h), p[f"{pre}.residual.6.weight"], p[f"{pre}.residual.6.bias"])
    if f"{pre}.shortcut.weight" in p:
        x = causal_conv3d(x, p[f"{pre}.shortcut.weight"], p[f"{pre}.shortcut.bias"])
    return x + h


def _attn_block(p, pre, x):
    """Per-frame spatial self-attention (reference AttentionBlock,
    wan_vae.hpp:570)."""
    b, t, hh, ww, c = x.shape
    h = _rms(p, f"{pre}.norm", x)
    qkv = _conv2d_frames(h, p[f"{pre}.to_qkv.weight"], p[f"{pre}.to_qkv.bias"], padding=0)
    q, k, v = jnp.split(qkv.reshape(b * t, hh * ww, 3 * c), 3, axis=-1)
    att = jax.nn.softmax(
        jnp.einsum("bic,bjc->bij", q.astype(jnp.float32), k.astype(jnp.float32))
        / np.sqrt(c),
        axis=-1,
    )
    o = jnp.einsum("bij,bjc->bic", att, v.astype(jnp.float32)).astype(x.dtype)
    o = o.reshape(b, t, hh, ww, c)
    o = _conv2d_frames(o, p[f"{pre}.proj.weight"], p[f"{pre}.proj.bias"], padding=0)
    return x + o


def _temporal_upsample(p, pre, x):
    """Frame 0 passes through; frames 1…T go through time_conv (c → 2c) and
    interleave to double the frame count: T → 1 + 2(T-1).  Exactly the
    chunked 'Rep' recursion of the reference (wan_vae.hpp:181-210) unrolled
    over the full clip."""
    head, tail = x[:, :1], x[:, 1:]
    b, tm, hh, ww, c = tail.shape
    y = causal_conv3d(tail, p[f"{pre}.time_conv.weight"], p[f"{pre}.time_conv.bias"],
                      spatial_pad=0)
    # [B,T,H,W,2C] → interleave the two halves along time
    y = y.reshape(b, tm, hh, ww, 2, c).transpose(0, 1, 4, 2, 3, 5).reshape(
        b, 2 * tm, hh, ww, c
    )
    return jnp.concatenate([head, y], axis=1)


def _temporal_downsample(p, pre, x):
    """Frame 0 passes through; stride-2 kt=3 conv over the rest:
    1+2m → 1+m frames (reference downsample3d, wan_vae.hpp:237-254)."""
    head = x[:, :1]
    y = causal_conv3d(
        x, p[f"{pre}.time_conv.weight"], p[f"{pre}.time_conv.bias"],
        stride=(2, 1, 1), spatial_pad=0, temporal_pad=0,
    )
    return jnp.concatenate([head, y], axis=1)


def _spatial_upsample(p, pre, x):
    b, t, hh, ww, c = x.shape
    y = x.reshape(b * t, hh, ww, c)
    y = jnp.repeat(jnp.repeat(y, 2, axis=1), 2, axis=2)  # nearest 2×
    from sdtpu.ops import conv2d

    y = conv2d(y, p[f"{pre}.resample.1.weight"], p[f"{pre}.resample.1.bias"])
    return y.reshape(b, t, *y.shape[1:])


def _spatial_downsample(p, pre, x):
    """ZeroPad2d((0,1,0,1)) + stride-2 conv (reference downsample2d)."""
    b, t, hh, ww, c = x.shape
    y = jnp.pad(x.reshape(b * t, hh, ww, c), ((0, 0), (0, 1), (0, 1), (0, 0)))
    from sdtpu.ops import conv2d

    y = conv2d(y, p[f"{pre}.resample.1.weight"], p[f"{pre}.resample.1.bias"],
               stride=2, padding=0)
    return y.reshape(b, t, *y.shape[1:])


# ------------------------------------------------------------------- en/decode


def wan_vae_decode(p, z: jnp.ndarray, cfg: WanVAEConfig = WAN21_VAE_CONFIG) -> jnp.ndarray:
    """z: [B, Tl, h, w, z_dim] RAW VAE latent (apply diffusion_to_vae_latents
    first) → video [B, 1+4(Tl-1), 8h, 8w, 3] in [-1, 1]."""
    z = causal_conv3d(z, p["conv2.weight"], p["conv2.bias"])  # 1×1×1 quant conv
    x = causal_conv3d(z, p["decoder.conv1.weight"], p["decoder.conv1.bias"])

    x = _resblock(p, "decoder.middle.0", x)
    x = _attn_block(p, "decoder.middle.1", x)
    x = _resblock(p, "decoder.middle.2", x)

    n_levels = len(cfg.dim_mult)
    idx = 0
    for i in range(n_levels):
        for _ in range(cfg.num_res_blocks + 1):
            x = _resblock(p, f"decoder.upsamples.{idx}", x)
            idx += 1
        if i != n_levels - 1:
            pre = f"decoder.upsamples.{idx}"
            if cfg.temporal_upsample[i]:
                x = _temporal_upsample(p, pre, x)
            x = _spatial_upsample(p, pre, x)
            idx += 1

    x = _rms(p, "decoder.head.0", x)
    x = causal_conv3d(silu(x), p["decoder.head.2.weight"], p["decoder.head.2.bias"])
    return x


def wan_vae_encode(p, x: jnp.ndarray, cfg: WanVAEConfig = WAN21_VAE_CONFIG) -> jnp.ndarray:
    """x: [B, T, H, W, 3] video in [-1,1], T = 1+4k → RAW latent mean
    [B, 1+k, H/8, W/8, z_dim] (posterior mean; apply vae_to_diffusion_latents
    for the diffusion space)."""
    h = causal_conv3d(x, p["encoder.conv1.weight"], p["encoder.conv1.bias"])

    n_levels = len(cfg.dim_mult)
    idx = 0
    for i in range(n_levels):
        for _ in range(cfg.num_res_blocks):
            h = _resblock(p, f"encoder.downsamples.{idx}", h)
            idx += 1
        if i != n_levels - 1:
            pre = f"encoder.downsamples.{idx}"
            h = _spatial_downsample(p, pre, h)
            if cfg.temporal_downsample[i]:
                h = _temporal_downsample(p, pre, h)
            idx += 1

    h = _resblock(p, "encoder.middle.0", h)
    h = _attn_block(p, "encoder.middle.1", h)
    h = _resblock(p, "encoder.middle.2", h)

    h = _rms(p, "encoder.head.0", h)
    h = causal_conv3d(silu(h), p["encoder.head.2.weight"], p["encoder.head.2.bias"])
    h = causal_conv3d(h, p["conv1.weight"], p["conv1.bias"])  # 1×1×1 quant conv
    mean, _logvar = jnp.split(h, 2, axis=-1)
    return mean


# ----------------------------------------------------------------------- init


def init_wan_vae_params(
    cfg: WanVAEConfig = WAN21_VAE_CONFIG, seed: int = 0, dtype=jnp.float32, decode_only=False
):
    g = np.random.default_rng(seed)
    p = {}

    def conv3(name, o, i, kt=3, kh=3, kw=3):
        p[f"{name}.weight"] = jnp.asarray(
            g.standard_normal((o, i, kt, kh, kw), dtype=np.float32) * 0.05, dtype=dtype
        )
        p[f"{name}.bias"] = jnp.zeros((o,), dtype=dtype)

    def conv2(name, o, i, k=3):
        p[f"{name}.weight"] = jnp.asarray(
            g.standard_normal((o, i, k, k), dtype=np.float32) * 0.05, dtype=dtype
        )
        p[f"{name}.bias"] = jnp.zeros((o,), dtype=dtype)

    def gamma(name, c):
        p[f"{name}.gamma"] = jnp.ones((c, 1, 1), dtype=dtype)

    def res(pre, ci, co):
        gamma(f"{pre}.residual.0", ci)
        conv3(f"{pre}.residual.2", co, ci)
        gamma(f"{pre}.residual.3", co)
        conv3(f"{pre}.residual.6", co, co)
        if ci != co:
            conv3(f"{pre}.shortcut", co, ci, 1, 1, 1)

    def attn(pre, c):
        gamma(f"{pre}.norm", c)
        conv2(f"{pre}.to_qkv", 3 * c, c, 1)
        conv2(f"{pre}.proj", c, c, 1)

    d = cfg.dim
    dims_e = [d] + [d * m for m in cfg.dim_mult]
    n_levels = len(cfg.dim_mult)

    if not decode_only:
        conv3("encoder.conv1", dims_e[0], cfg.input_channels)
        idx = 0
        for i in range(n_levels):
            ci, co = dims_e[i], dims_e[i + 1]
            for _ in range(cfg.num_res_blocks):
                res(f"encoder.downsamples.{idx}", ci, co)
                ci = co
                idx += 1
            if i != n_levels - 1:
                conv2(f"encoder.downsamples.{idx}.resample.1", co, co)
                if cfg.temporal_downsample[i]:
                    conv3(f"encoder.downsamples.{idx}.time_conv", co, co, 3, 1, 1)
                idx += 1
        top = dims_e[-1]
        res("encoder.middle.0", top, top)
        attn("encoder.middle.1", top)
        res("encoder.middle.2", top, top)
        gamma("encoder.head.0", top)
        conv3("encoder.head.2", cfg.z_dim * 2, top)
        conv3("conv1", cfg.z_dim * 2, cfg.z_dim * 2, 1, 1, 1)

    dims_d = [d * cfg.dim_mult[-1]] + [d * m for m in reversed(cfg.dim_mult)]
    conv3("conv2", cfg.z_dim, cfg.z_dim, 1, 1, 1)
    conv3("decoder.conv1", dims_d[0], cfg.z_dim)
    res("decoder.middle.0", dims_d[0], dims_d[0])
    attn("decoder.middle.1", dims_d[0])
    res("decoder.middle.2", dims_d[0], dims_d[0])
    idx = 0
    for i in range(n_levels):
        ci, co = dims_d[i], dims_d[i + 1]
        if i in (1, 2, 3):
            ci = ci // 2  # post-upsample halved channels (reference :881)
        for _ in range(cfg.num_res_blocks + 1):
            res(f"decoder.upsamples.{idx}", ci, co)
            ci = co
            idx += 1
        if i != n_levels - 1:
            conv2(f"decoder.upsamples.{idx}.resample.1", co // 2, co)
            if cfg.temporal_upsample[i]:
                conv3(f"decoder.upsamples.{idx}.time_conv", co * 2, co, 3, 1, 1)
            idx += 1
    gamma("decoder.head.0", dims_d[-1])
    conv3("decoder.head.2", cfg.input_channels, dims_d[-1])
    return p

"""TAEHV — tiny VIDEO autoencoder (fast decode/preview for Wan / Hunyuan /
LTX latents).

Reference analog: TAEHV / TinyVideoAutoEncoder (src/model/vae/tae.hpp:505,
691; upstream madebyollin/taehv).  Frames ride the leading axis; every
MemBlock conditions on the PREVIOUS frame's features (channel-concat of
[h_t, h_{t-1}]), TPool/TGrow move time into channels around 1x1 convs, and
the decoder drops the first (t_upscale - 1) warm-up frames.

Param naming mirrors the reference numeric scheme:
``encoder.N.*`` / ``decoder.N.*`` with MemBlock ``conv.{0,2,4}`` (+``skip``),
WideMemBlock ``conv.{0,2,4,6}``, TPool/TGrow ``conv``.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sdtpu.ops import conv2d


@dataclasses.dataclass(frozen=True)
class TAEHVConfig:
    z_channels: int = 16
    patch_size: int = 1
    time_downscale: Tuple[bool, ...] = (True, True, False)
    time_upscale: Tuple[bool, ...] = (False, True, True)
    num_blocks: int = 3
    is_wide: bool = False  # WideMemBlock decoder (1024/512/256 channels)

    @property
    def dec_channels(self):
        return (1024, 512, 256, 64) if self.is_wide else (256, 128, 64, 64)

    @property
    def t_upscale(self) -> int:
        t = 1
        for u in self.time_upscale:
            t *= 2 if u else 1
        return t

    @property
    def t_downscale(self) -> int:
        t = 1
        for d in self.time_downscale:
            t *= 2 if d else 1
        return t


TAEHV_WAN_CONFIG = TAEHVConfig()
TAEHV_TI2V_CONFIG = TAEHVConfig(z_channels=48, patch_size=2)
TAEHV_HUNYUAN_CONFIG = TAEHVConfig(z_channels=32, patch_size=2)
TAEHV_LTXAV_CONFIG = TAEHVConfig(
    z_channels=128, patch_size=4, time_downscale=(True, True, True),
    time_upscale=(True, True, True))


def detect_taehv_config(names, shapes, version_hint: str = "") -> TAEHVConfig:
    is_wide = any(n.endswith("3.conv.6.weight") for n in names)
    zc = None
    w = shapes.get("decoder.1.weight")
    if w is not None:
        zc = w[1]
    base = {16: TAEHV_WAN_CONFIG, 48: TAEHV_TI2V_CONFIG,
            32: TAEHV_HUNYUAN_CONFIG, 128: TAEHV_LTXAV_CONFIG}.get(
                zc, TAEHV_WAN_CONFIG)
    return dataclasses.replace(base, is_wide=is_wide)


def _mem_block(p, pre: str, h: jnp.ndarray, past: jnp.ndarray,
               wide: bool) -> jnp.ndarray:
    """h/past: [T, H, W, C] — conv stack over [h | past] with a residual on h
    (reference MemBlock tae.hpp:224 / WideMemBlock :262)."""
    x = jnp.concatenate([h, past], axis=-1)
    if wide:
        g = max(1, p[f"{pre}.conv.2.weight"].shape[0] // 64)
        x = jax.nn.relu(conv2d(x, p[f"{pre}.conv.0.weight"], p[f"{pre}.conv.0.bias"], padding=0))
        x = jax.nn.relu(conv2d(x, p[f"{pre}.conv.2.weight"], p[f"{pre}.conv.2.bias"], groups=g))
        x = jax.nn.relu(conv2d(x, p[f"{pre}.conv.4.weight"], p[f"{pre}.conv.4.bias"], padding=0))
        x = conv2d(x, p[f"{pre}.conv.6.weight"], p[f"{pre}.conv.6.bias"], groups=g)
    else:
        x = jax.nn.relu(conv2d(x, p[f"{pre}.conv.0.weight"], p[f"{pre}.conv.0.bias"]))
        x = jax.nn.relu(conv2d(x, p[f"{pre}.conv.2.weight"], p[f"{pre}.conv.2.bias"]))
        x = conv2d(x, p[f"{pre}.conv.4.weight"], p[f"{pre}.conv.4.bias"])
    skip = h
    if f"{pre}.skip.weight" in p:
        skip = conv2d(h, p[f"{pre}.skip.weight"], None, padding=0)
    return jax.nn.relu(x + skip)


def _past(h: jnp.ndarray) -> jnp.ndarray:
    """Previous-frame features: shift by one frame, zeros for frame 0."""
    return jnp.concatenate([jnp.zeros_like(h[:1]), h[:-1]], axis=0)


def _patchify(x: jnp.ndarray, ps: int) -> jnp.ndarray:
    """[T, H*q, W*r, C] → [T, H, W, C*r*q] (reference tae.hpp patchify:
    channel order (q, r, c) slow→fast mirrored to channels-last)."""
    if ps == 1:
        return x
    t, hh, ww, c = x.shape
    h, w = hh // ps, ww // ps
    x = x.reshape(t, h, ps, w, ps, c)
    # ggml channel layout slow→fast (c, q, r) → channels-last (c, q, r)
    return x.transpose(0, 1, 3, 5, 2, 4).reshape(t, h, w, c * ps * ps)


def _unpatchify(x: jnp.ndarray, ps: int) -> jnp.ndarray:
    if ps == 1:
        return x
    t, h, w, crq = x.shape
    c = crq // (ps * ps)
    x = x.reshape(t, h, w, c, ps, ps)
    return x.transpose(0, 1, 4, 2, 5, 3).reshape(t, h * ps, w * ps, c)


def taehv_decode(p, z: jnp.ndarray, cfg: TAEHVConfig = TAEHV_WAN_CONFIG) -> jnp.ndarray:
    """z: [B, T, h, w, zc] video latent → [B, T_out, H, W, 3] in [-1, 1]-ish
    (reference TinyVideoDecoder::forward, tae.hpp:470-513)."""
    b, t, lh, lw, zc = z.shape
    outs = []
    for bi in range(b):
        h = z[bi]
        h = 3.0 * jnp.tanh(h / 3.0)  # Clamp()
        h = jax.nn.relu(conv2d(h, p["decoder.1.weight"], p["decoder.1.bias"]))
        idx = 3
        for i, up in enumerate(cfg.time_upscale):
            for _ in range(cfg.num_blocks):
                h = _mem_block(p, f"decoder.{idx}", h, _past(h), cfg.is_wide)
                idx += 1
            idx += 1  # nn.Upsample placeholder
            h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
            # TGrow: 1x1 conv C→C*stride, frames split back out
            stride = 2 if up else 1
            h = conv2d(h, p[f"decoder.{idx}.conv.weight"], None, padding=0)
            idx += 1
            if stride != 1:
                tt, hh2, ww2, cs = h.shape
                h = h.reshape(tt, hh2, ww2, stride, cs // stride)
                h = h.transpose(0, 3, 1, 2, 4).reshape(tt * stride, hh2, ww2,
                                                       cs // stride)
            h = conv2d(h, p[f"decoder.{idx}.weight"], None)
            idx += 1
        idx += 1  # ReLU
        h = jax.nn.relu(h)
        h = conv2d(h, p[f"decoder.{idx}.weight"], p[f"decoder.{idx}.bias"])
        h = _unpatchify(h, cfg.patch_size)
        outs.append(h[cfg.t_upscale - 1:])  # drop warm-up frames
    return jnp.stack(outs, axis=0)


def taehv_encode(p, x: jnp.ndarray, cfg: TAEHVConfig = TAEHV_WAN_CONFIG) -> jnp.ndarray:
    """x: [B, T, H, W, 3] → [B, T/t_down, h, w, zc] (reference
    TinyVideoEncoder::forward, tae.hpp:392-421)."""
    b = x.shape[0]
    outs = []
    for bi in range(b):
        h = x[bi]
        t = h.shape[0]
        pad = (-t) % cfg.t_downscale
        if pad:
            h = jnp.concatenate([h] + [h[-1:]] * pad, axis=0)
        h = _patchify(h, cfg.patch_size)
        h = jax.nn.relu(conv2d(h, p["encoder.0.weight"], p["encoder.0.bias"]))
        idx = 2
        for i, down in enumerate(cfg.time_downscale):
            stride = 2 if down else 1
            # TPool: stack `stride` consecutive frames into channels, 1x1 conv
            if stride != 1:
                tt, hh2, ww2, c = h.shape
                h = h.reshape(tt // stride, stride, hh2, ww2, c)
                h = h.transpose(0, 2, 3, 1, 4).reshape(tt // stride, hh2, ww2,
                                                       stride * c)
            h = conv2d(h, p[f"encoder.{idx}.conv.weight"], None, padding=0)
            idx += 1
            h = conv2d(h, p[f"encoder.{idx}.weight"], None, stride=2)
            idx += 1
            for _ in range(cfg.num_blocks):
                h = _mem_block(p, f"encoder.{idx}", h, _past(h), False)
                idx += 1
        h = conv2d(h, p[f"encoder.{idx}.weight"], p[f"encoder.{idx}.bias"])
        outs.append(h)
    return jnp.stack(outs, axis=0)


def init_taehv_params(cfg: TAEHVConfig = TAEHV_WAN_CONFIG, seed: int = 0,
                      hidden: int = 64, dtype=jnp.float32,
                      decode_only: bool = False) -> dict:
    g = np.random.default_rng(seed)
    p: dict = {}

    def conv(pre, o, i, k=3, bias=True):
        p[f"{pre}.weight"] = jnp.asarray(
            g.standard_normal((o, i, k, k), dtype=np.float32) * 0.05, dtype=dtype)
        if bias:
            p[f"{pre}.bias"] = jnp.zeros((o,), dtype=dtype)

    def mem(pre, c, wide):
        if wide:
            gch = max(1, c // 64)
            conv(f"{pre}.conv.0", c, 2 * c, k=1)
            conv(f"{pre}.conv.2", c, c // gch)
            conv(f"{pre}.conv.4", c, c, k=1)
            conv(f"{pre}.conv.6", c, c // gch)
        else:
            conv(f"{pre}.conv.0", c, 2 * c)
            conv(f"{pre}.conv.2", c, c)
            conv(f"{pre}.conv.4", c, c)

    ps = cfg.patch_size
    ch = cfg.dec_channels
    conv("decoder.1", ch[0], cfg.z_channels)
    idx = 3
    for i, up in enumerate(cfg.time_upscale):
        for _ in range(cfg.num_blocks):
            mem(f"decoder.{idx}", ch[i], cfg.is_wide)
            idx += 1
        idx += 1
        stride = 2 if up else 1
        conv(f"decoder.{idx}.conv", ch[i] * stride, ch[i], k=1, bias=False)
        idx += 1
        conv(f"decoder.{idx}", ch[i + 1], ch[i], bias=False)
        idx += 1
    idx += 1
    conv(f"decoder.{idx}", 3 * ps * ps, ch[-1])
    if decode_only:
        return p
    conv("encoder.0", hidden, 3 * ps * ps)
    idx = 2
    for i, down in enumerate(cfg.time_downscale):
        stride = 2 if down else 1
        conv(f"encoder.{idx}.conv", hidden, hidden * stride, k=1, bias=False)
        idx += 1
        conv(f"encoder.{idx}", hidden, hidden, bias=False)
        idx += 1
        for _ in range(cfg.num_blocks):
            mem(f"encoder.{idx}", hidden, False)
            idx += 1
    conv(f"encoder.{idx}", cfg.z_channels, hidden)
    return p

"""ESRGAN / Real-ESRGAN (RRDBNet) ×4 upscaler.

Reference analog: ESRGAN (src/model/esrgan.hpp:227) — used standalone and by
the hires-fix path.  Modern param naming (conv_first, body.N.rdb{1,2,3}.conv{1-5},
conv_body, conv_up1/2, conv_hr, conv_last); legacy "model.N.sub…" checkpoints
are renamed by convert_esrgan_name.
"""
from __future__ import annotations

import dataclasses
import re
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sdtpu.ops import conv2d


@dataclasses.dataclass(frozen=True)
class ESRGANConfig:
    in_channels: int = 3
    out_channels: int = 3
    num_feat: int = 64
    num_block: int = 23
    num_grow: int = 32
    scale: int = 4


ESRGAN_X4_CONFIG = ESRGANConfig()


def _lrelu(x):
    return jnp.where(x >= 0, x, 0.2 * x)


def _rdb(p, pre: str, x: jnp.ndarray) -> jnp.ndarray:
    """Residual dense block: 5 convs with dense connections, 0.2-scaled skip."""
    x1 = _lrelu(conv2d(x, p[f"{pre}.conv1.weight"], p[f"{pre}.conv1.bias"]))
    x2 = _lrelu(conv2d(jnp.concatenate([x, x1], -1), p[f"{pre}.conv2.weight"], p[f"{pre}.conv2.bias"]))
    x3 = _lrelu(conv2d(jnp.concatenate([x, x1, x2], -1), p[f"{pre}.conv3.weight"], p[f"{pre}.conv3.bias"]))
    x4 = _lrelu(conv2d(jnp.concatenate([x, x1, x2, x3], -1), p[f"{pre}.conv4.weight"], p[f"{pre}.conv4.bias"]))
    x5 = conv2d(jnp.concatenate([x, x1, x2, x3, x4], -1), p[f"{pre}.conv5.weight"], p[f"{pre}.conv5.bias"])
    return x5 * 0.2 + x


def _rrdb(p, pre: str, x: jnp.ndarray) -> jnp.ndarray:
    out = _rdb(p, f"{pre}.rdb1", x)
    out = _rdb(p, f"{pre}.rdb2", out)
    out = _rdb(p, f"{pre}.rdb3", out)
    return out * 0.2 + x


def esrgan_forward(p, x: jnp.ndarray, cfg: ESRGANConfig = ESRGAN_X4_CONFIG) -> jnp.ndarray:
    """x: [B,H,W,3] in [0,1] → [B,4H,4W,3]."""
    feat = conv2d(x, p["conv_first.weight"], p["conv_first.bias"])
    body = feat
    for i in range(cfg.num_block):
        body = _rrdb(p, f"body.{i}", body)
    body = conv2d(body, p["conv_body.weight"], p["conv_body.bias"])
    feat = feat + body
    feat = jnp.repeat(jnp.repeat(feat, 2, 1), 2, 2)
    feat = _lrelu(conv2d(feat, p["conv_up1.weight"], p["conv_up1.bias"]))
    feat = jnp.repeat(jnp.repeat(feat, 2, 1), 2, 2)
    feat = _lrelu(conv2d(feat, p["conv_up2.weight"], p["conv_up2.bias"]))
    feat = _lrelu(conv2d(feat, p["conv_hr.weight"], p["conv_hr.bias"]))
    return conv2d(feat, p["conv_last.weight"], p["conv_last.bias"])


def convert_esrgan_name(name: str) -> Optional[str]:
    """Legacy old-arch ESRGAN names ('model.0', 'model.1.sub.N.RDBk.convM.0')
    → modern RRDBNet names."""
    table = {
        "model.0": "conv_first",
        "model.1.sub.23": "conv_body",
        "model.3": "conv_up1",
        "model.6": "conv_up2",
        "model.8": "conv_hr",
        "model.10": "conv_last",
    }
    for old, new in table.items():
        m = re.match(rf"{re.escape(old)}\.(weight|bias)$", name)
        if m:
            return f"{new}.{m.group(1)}"
    m = re.match(r"model\.1\.sub\.(\d+)\.RDB(\d)\.conv(\d)\.0\.(weight|bias)$", name)
    if m:
        return f"body.{m.group(1)}.rdb{m.group(2)}.conv{m.group(3)}.{m.group(4)}"
    if re.match(r"(conv_first|conv_body|conv_up1|conv_up2|conv_hr|conv_last|body\.)", name):
        return name
    return None


def init_esrgan_params(cfg: ESRGANConfig = ESRGAN_X4_CONFIG, seed: int = 0, dtype=jnp.float32):
    g = np.random.default_rng(seed)
    p = {}

    def conv(name, o, i):
        p[f"{name}.weight"] = jnp.asarray(
            g.standard_normal((o, i, 3, 3), dtype=np.float32) * 0.02, dtype=dtype
        )
        p[f"{name}.bias"] = jnp.zeros((o,), dtype=dtype)

    nf, gc = cfg.num_feat, cfg.num_grow
    conv("conv_first", nf, cfg.in_channels)
    for i in range(cfg.num_block):
        for r in (1, 2, 3):
            pre = f"body.{i}.rdb{r}"
            for c in range(1, 6):
                in_c = nf + (c - 1) * gc
                out_c = gc if c < 5 else nf
                conv(f"{pre}.conv{c}", out_c, in_c)
    conv("conv_body", nf, nf)
    conv("conv_up1", nf, nf)
    conv("conv_up2", nf, nf)
    conv("conv_hr", nf, nf)
    conv("conv_last", cfg.out_channels, nf)
    return p


def upscale_image(params, image: np.ndarray, cfg: ESRGANConfig = ESRGAN_X4_CONFIG,
                  tile: int = 256, overlap: int = 16) -> np.ndarray:
    """uint8 [H,W,3] → uint8 [4H,4W,3], tiled to bound memory
    (reference process_tiles_2d analog)."""
    x = image.astype(np.float32) / 255.0
    h, w, _ = x.shape
    s = cfg.scale
    fwd = jax.jit(lambda p, t: esrgan_forward(p, t, cfg))
    if h <= tile and w <= tile:
        out = np.asarray(fwd(params, jnp.asarray(x[None])))[0]
    else:
        out = np.zeros((h * s, w * s, 3), dtype=np.float32)
        wsum = np.zeros((h * s, w * s, 1), dtype=np.float32)
        step = tile - overlap
        for y0 in range(0, max(h - overlap, 1), step):
            for x0 in range(0, max(w - overlap, 1), step):
                y1, x1 = min(y0 + tile, h), min(x0 + tile, w)
                y0a, x0a = max(0, y1 - tile), max(0, x1 - tile)
                patch = x[y0a:y1, x0a:x1]
                ph, pw = patch.shape[:2]
                pad_h, pad_w = tile - ph, tile - pw
                if pad_h or pad_w:
                    patch = np.pad(patch, ((0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
                up = np.asarray(fwd(params, jnp.asarray(patch[None])))[0]
                up = up[: ph * s, : pw * s]
                out[y0a * s : y1 * s, x0a * s : x1 * s] += up
                wsum[y0a * s : y1 * s, x0a * s : x1 * s] += 1.0
        out /= np.maximum(wsum, 1.0)
    return np.clip(out * 255.0, 0, 255).round().astype(np.uint8)

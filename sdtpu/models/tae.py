"""TAESD — tiny autoencoder for fast decode/preview.

Reference analog: TinyImageAutoEncoder (src/model/vae/tae.hpp:629; upstream
madebyollin/taesd).  Param names follow the reference scheme
``{encoder,decoder}.layers.N.(conv.{0,2,4}|skip).{weight,bias}`` where missing
decoder indices are parameter-free relu (i==1) / nearest-2x upsample stages.
Raw taesd.pth checkpoints map by dropping the leading Clamp (index-1 shift on
the decoder); SDXL-variant (taesdxl) differs only in latent scaling.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from sdtpu.ops import conv2d


@dataclasses.dataclass(frozen=True)
class TAEConfig:
    z_channels: int = 4
    channels: int = 64
    out_channels: int = 3
    num_blocks: int = 3
    # latent scaling: TAESD consumes unscaled SD latents, so the pipeline
    # divides by the SD VAE scale factor before decode.
    vae_scale_factor: float = 0.18215


TAESD_CONFIG = TAEConfig()
TAESD_XL_CONFIG = TAEConfig(vae_scale_factor=0.13025)
TAESD_SD3_CONFIG = TAEConfig(z_channels=16, vae_scale_factor=1.5305)
TAESD_FLUX_CONFIG = TAEConfig(z_channels=16, vae_scale_factor=0.3611)


def _relu(x):
    return jax.nn.relu(x)


def _tae_block(p, pre: str, x: jnp.ndarray) -> jnp.ndarray:
    h = conv2d(x, p[f"{pre}.conv.0.weight"], p[f"{pre}.conv.0.bias"])
    h = _relu(h)
    h = conv2d(h, p[f"{pre}.conv.2.weight"], p[f"{pre}.conv.2.bias"])
    h = _relu(h)
    h = conv2d(h, p[f"{pre}.conv.4.weight"], p[f"{pre}.conv.4.bias"])
    if f"{pre}.skip.weight" in p:
        x = conv2d(x, p[f"{pre}.skip.weight"], None, padding=0)
    return _relu(h + x)


def tae_decode(p, z: jnp.ndarray, cfg: TAEConfig = TAESD_CONFIG) -> jnp.ndarray:
    """z: *scaled* diffusion latent [B,h,w,zc] → image [B,8h,8w,3] in [0,1]→
    mapped to [-1,1] for pipeline uniformity."""
    h = z / cfg.vae_scale_factor
    h = 3.0 * jnp.tanh(h / 3.0)  # Clamp stage
    nb = cfg.num_blocks
    i = 0
    h = conv2d(h, p[f"decoder.layers.{i}.weight"], p[f"decoder.layers.{i}.bias"])
    h = _relu(h)  # index 1
    i = 2
    for _ in range(nb):
        h = _tae_block(p, f"decoder.layers.{i}", h)
        i += 1
    for stage in range(3):
        # upsample (parameter-free index) then bias-free conv
        h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
        i += 1
        h = conv2d(h, p[f"decoder.layers.{i}.weight"], None)
        i += 1
        n = 1 if stage == 2 else nb
        for _ in range(n):
            h = _tae_block(p, f"decoder.layers.{i}", h)
            i += 1
    h = conv2d(h, p[f"decoder.layers.{i}.weight"], p[f"decoder.layers.{i}.bias"])
    # taesd outputs [0,1]; convert to the pipeline's [-1,1]
    return h * 2.0 - 1.0


def tae_encode(p, x: jnp.ndarray, cfg: TAEConfig = TAESD_CONFIG) -> jnp.ndarray:
    """x: [B,H,W,3] in [-1,1] → scaled latent [B,H/8,W/8,zc]."""
    h = (x + 1.0) / 2.0  # taesd encoder consumes [0,1]
    nb = cfg.num_blocks
    i = 0
    h = conv2d(h, p[f"encoder.layers.{i}.weight"], p[f"encoder.layers.{i}.bias"])
    i += 1
    h = _tae_block(p, f"encoder.layers.{i}", h)
    i += 1
    for _ in range(3):
        h = conv2d(h, p[f"encoder.layers.{i}.weight"], None, stride=2)
        i += 1
        for _ in range(nb):
            h = _tae_block(p, f"encoder.layers.{i}", h)
            i += 1
    h = conv2d(h, p[f"encoder.layers.{i}.weight"], p[f"encoder.layers.{i}.bias"])
    return h * cfg.vae_scale_factor


def convert_taesd_name(name: str) -> Optional[str]:
    """Raw taesd.pth names (with leading Clamp in the decoder Sequential) →
    internal ``{encoder,decoder}.layers.N`` names."""
    import re

    m = re.match(r"(encoder|decoder)\.(\d+)\.(.*)", name)
    if not m:
        if name.startswith("encoder.layers.") or name.startswith("decoder.layers."):
            return name
        m2 = None
        return None
    which, idx, rest = m.group(1), int(m.group(2)), m.group(3)
    if which == "decoder":
        idx -= 1  # drop the Clamp stage
    return f"{which}.layers.{idx}.{rest}"


def tae_config_for(version_name: str, z_channels: int) -> TAEConfig:
    """TAE variant for a pipeline version (taesd / taesdxl / taesd3 /
    taef1 differ only in latent scaling; reference picks by version,
    tae.hpp:629)."""
    v = version_name.lower()
    if z_channels == 4:
        return TAESD_XL_CONFIG if "sdxl" in v else TAESD_CONFIG
    if z_channels == 16:
        return TAESD_SD3_CONFIG if "sd3" in v else TAESD_FLUX_CONFIG
    return TAEConfig(z_channels=z_channels)


def init_tae_params(cfg: TAEConfig = TAESD_CONFIG, seed: int = 0, dtype=jnp.float32) -> dict:
    import numpy as np

    g = np.random.default_rng(seed)
    p: Dict[str, jnp.ndarray] = {}

    def conv(name, out_c, in_c, k=3, bias=True):
        p[f"{name}.weight"] = jnp.asarray(
            g.standard_normal((out_c, in_c, k, k), dtype=np.float32) * 0.05, dtype=dtype
        )
        if bias:
            p[f"{name}.bias"] = jnp.zeros((out_c,), dtype=dtype)

    def block(pre, in_c, out_c):
        conv(f"{pre}.conv.0", out_c, in_c)
        conv(f"{pre}.conv.2", out_c, out_c)
        conv(f"{pre}.conv.4", out_c, out_c)
        if in_c != out_c:
            conv(f"{pre}.skip", out_c, in_c, k=1, bias=False)

    ch, nb = cfg.channels, cfg.num_blocks
    # encoder
    i = 0
    conv(f"encoder.layers.{i}", ch, 3)
    i += 1
    block(f"encoder.layers.{i}", ch, ch)
    i += 1
    for _ in range(3):
        conv(f"encoder.layers.{i}", ch, ch, bias=False)
        i += 1
        for _ in range(nb):
            block(f"encoder.layers.{i}", ch, ch)
            i += 1
    conv(f"encoder.layers.{i}", cfg.z_channels, ch)
    # decoder
    i = 0
    conv(f"decoder.layers.{i}", ch, cfg.z_channels)
    i = 2
    for _ in range(nb):
        block(f"decoder.layers.{i}", ch, ch)
        i += 1
    for stage in range(3):
        i += 1
        conv(f"decoder.layers.{i}", ch, ch, bias=False)
        i += 1
        n = 1 if stage == 2 else nb
        for _ in range(n):
            block(f"decoder.layers.{i}", ch, ch)
            i += 1
    conv(f"decoder.layers.{i}", cfg.out_channels, ch)
    return p

"""Latent preview: fast latent→RGB projection, TAE, or full VAE decode.

Reference analog: src/runtime/latent-preview.h (PREVIEW_PROJ fixed projection
matrices per latent family, PREVIEW_TAE, PREVIEW_VAE; callback w/ interval).
The projection tables are the published per-family latent→RGB matrices.
"""
from __future__ import annotations

import gzip
import json
from importlib import resources
from typing import Callable, Optional

import numpy as np

_TABLES = None


def _tables():
    global _TABLES
    if _TABLES is None:
        ref = resources.files("sdtpu.diffusion").joinpath("data/latent_rgb_proj.json.gz")
        with ref.open("rb") as f:
            _TABLES = json.loads(gzip.decompress(f.read()))
    return _TABLES


_FAMILY_KEYS = {
    "sd": "sd_latent_rgb",
    "sdxl": "sdxl_latent_rgb",
    "sd3": "sd3_latent_rgb",
    "flux": "flux_latent_rgb",
    "flux2": "flux2_latent_rgb",
    "wan21": "wan_21_latent_rgb",
    "wan22": "wan_22_latent_rgb",
    "ltxav": "ltxav_latent_rgb",
}


def latent_family_for_version(version) -> str:
    v = getattr(version, "value", str(version))
    if "sdxl" in v:
        return "sdxl"
    if v.startswith("sd3"):
        return "sd3"
    if "flux2" in v:
        return "flux2"
    if "flux" in v or v in ("chroma", "ovis", "longcat"):
        return "flux"
    if "wan2_2" in v:
        return "wan22"
    if "wan" in v:
        return "wan21"
    if "ltx" in v:
        return "ltxav"
    return "sd"


def preview_latent_proj(latent: np.ndarray, family: str = "sd") -> np.ndarray:
    """latent [B,h,w,C] (scaled diffusion latent) → uint8 RGB [B,h,w,3] via the
    fixed projection matrix for the family."""
    key = _FAMILY_KEYS.get(family, "sd_latent_rgb")
    t = _tables()
    proj = np.asarray(t[key + "_proj"], dtype=np.float32)  # [C, 3]
    bias = np.asarray(t[key + "_bias"], dtype=np.float32)  # [3]
    c = latent.shape[-1]
    if proj.shape[0] != c:
        proj = proj[: c] if proj.shape[0] > c else np.pad(proj, ((0, c - proj.shape[0]), (0, 0)))
    rgb = latent.astype(np.float32) @ proj + bias
    return np.clip((rgb + 1.0) * 127.5, 0, 255).astype(np.uint8)


class PreviewState:
    """Threads a preview callback through the (host-orchestrated) outer loop.

    mode: "proj" (fixed matrix), "tae" (tiny AE decode), "vae" (full decode).
    interval: call every N steps (reference sd_preview_policy).
    """

    def __init__(
        self,
        callback: Callable[[int, np.ndarray], None],
        mode: str = "proj",
        interval: int = 1,
        family: str = "sd",
        tae_decode=None,
        vae_decode=None,
    ):
        self.callback = callback
        self.mode = mode
        self.interval = max(1, interval)
        self.family = family
        self.tae_decode = tae_decode
        self.vae_decode = vae_decode

    def maybe_emit(self, step: int, latent: np.ndarray) -> None:
        if step % self.interval != 0:
            return
        if self.mode == "proj":
            img = preview_latent_proj(latent, self.family)
        elif self.mode == "tae" and self.tae_decode is not None:
            img = np.clip(
                (np.asarray(self.tae_decode(latent)) + 1.0) * 127.5, 0, 255
            ).astype(np.uint8)
        elif self.mode == "vae" and self.vae_decode is not None:
            img = np.clip(
                (np.asarray(self.vae_decode(latent)) + 1.0) * 127.5, 0, 255
            ).astype(np.uint8)
        else:
            img = preview_latent_proj(latent, self.family)
        self.callback(step, img)

"""Guidance combiners: CFG, image-CFG, Adaptive Projected Guidance, Skip-Layer
Guidance — pure functions on device arrays, usable inside the sampling scan.

Behavioral parity with src/runtime/guidance.{h,cpp} (CFG :148-180, APG
:208-298, SLG :300-341).  APG's momentum buffer is threaded explicitly as
state (functional form) so it lives in the scan carry.
"""
from __future__ import annotations

import dataclasses
import re
from typing import List, Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class APGParams:
    eta: float = 1.0
    momentum: float = 0.0
    norm_threshold: float = 0.0
    norm_threshold_smoothing: float = 0.0

    @property
    def enabled(self) -> bool:
        return self.eta != 1.0 or self.momentum != 0.0 or self.norm_threshold > 0.0


def cfg_combine(
    pred_cond: jnp.ndarray,
    pred_uncond: Optional[jnp.ndarray],
    pred_img_uncond: Optional[jnp.ndarray],
    guidance_scale,
    image_guidance_scale=1.0,
) -> jnp.ndarray:
    """Classifier-free guidance incl. pix2pix-style separate image guidance."""
    if pred_uncond is not None:
        if pred_img_uncond is not None:
            return (
                pred_img_uncond
                + image_guidance_scale * (pred_uncond - pred_img_uncond)
                + guidance_scale * (pred_cond - pred_uncond)
            )
        return pred_uncond + guidance_scale * (pred_cond - pred_uncond)
    if pred_img_uncond is not None:
        return pred_img_uncond + guidance_scale * (pred_cond - pred_img_uncond)
    return pred_cond


def _guidance_delta(pred_cond, pred_uncond, pred_img_uncond, guidance_scale, image_guidance_scale):
    if pred_img_uncond is not None:
        if pred_uncond is not None and guidance_scale == 1.0:
            return pred_uncond - pred_img_uncond
        if pred_uncond is not None:
            return pred_cond + (
                pred_uncond * (image_guidance_scale - guidance_scale)
                + pred_img_uncond * (1.0 - image_guidance_scale)
            ) / (guidance_scale - 1.0)
        return pred_cond - pred_img_uncond
    return pred_cond - pred_uncond


def apg_combine(
    pred_cond: jnp.ndarray,
    pred_uncond: Optional[jnp.ndarray],
    pred_img_uncond: Optional[jnp.ndarray],
    guidance_scale: float,
    params: APGParams,
    momentum_buffer: Optional[jnp.ndarray] = None,
    image_guidance_scale: float = 1.0,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Adaptive Projected Guidance. Returns (pred, new_momentum_buffer)."""
    if pred_uncond is None and pred_img_uncond is None:
        return pred_cond, momentum_buffer

    deltas = _guidance_delta(
        pred_cond, pred_uncond, pred_img_uncond, guidance_scale, image_guidance_scale
    )
    new_buf = momentum_buffer
    if params.momentum != 0.0:
        buf = momentum_buffer if momentum_buffer is not None else jnp.zeros_like(deltas)
        deltas = deltas + params.momentum * buf
        new_buf = deltas

    if params.norm_threshold > 0.0:
        standard_res = 2 * 1024 // 8
        diff_norm = (
            jnp.sqrt(jnp.sum(deltas * deltas)) * standard_res / jnp.sqrt(jnp.float32(deltas.size))
        )
        x = params.norm_threshold / jnp.maximum(diff_norm, 1e-20)
        if params.norm_threshold_smoothing <= 0.0:
            factor = jnp.minimum(1.0, x)
        else:
            sm = params.norm_threshold_smoothing
            factor = x / (1.0 + x ** (1.0 / sm)) ** sm
        factor = jnp.where(diff_norm > 0.0, factor, 1.0)
        deltas = deltas * factor

    if params.eta != 1.0:
        cond_norm_sq = jnp.sum(pred_cond * pred_cond)
        proj = jnp.sum(pred_cond * deltas) / jnp.maximum(cond_norm_sq, 1e-20)
        deltas = deltas + jnp.where(
            cond_norm_sq != 0.0, (params.eta - 1.0) * proj, 0.0
        ) * pred_cond

    # trace-safe combine: guidance_scale may be a traced scalar inside the
    # sampling scan.  scale==1 naturally reduces to pred_cond since
    # (scale-1)·deltas vanishes.
    pred = pred_cond
    if pred_uncond is not None:
        pred = pred_cond + (guidance_scale - 1.0) * deltas
        if pred_img_uncond is not None:
            pred = pred + (image_guidance_scale - 1.0) * deltas
    elif pred_img_uncond is not None:
        pred = pred_img_uncond + guidance_scale * deltas
    return pred, new_buf


def slg_active_steps(total_steps: int, start: float, stop: float) -> Tuple[int, int]:
    """SLG is applied for step in (start*steps, stop*steps) exclusive
    (reference is_enabled_for_step; steps here are 1-indexed)."""
    return int(start * total_steps), int(stop * total_steps)


def slg_combine(pred, pred_cond, pred_skip_layer, scale: float):
    return pred + (pred_cond - pred_skip_layer) * scale


def parse_guidance_schedule(spec: str) -> List[float]:
    """'7.5x10+5x10' → [7.5]*10 + [5.0]*10 (reference
    parse_guidance_schedule_from_spec)."""
    out: List[float] = []
    if not spec:
        return out
    for segment in spec.split("+"):
        m = re.fullmatch(r"([-+]?[\d.]+(?:e[-+]?\d+)?)x(\d+)", segment)
        if not m:
            raise ValueError(f"invalid guidance schedule segment {segment!r}")
        out.extend([float(m.group(1))] * int(m.group(2)))
    return out

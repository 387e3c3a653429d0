"""Auto-fit planner — derive a memory plan from model sizes + HBM budget.

TPU-native analog of the reference's --auto-fit (src/core/backend_fit.h:12,
derive_backend_specs / compute_plan backend_fit.cpp:145): the reference picks
per-device placement, time-sharing and VAE-tiling retries; on TPU the levers
are different but the decision problem is the same.  In budget order:

1. everything resident in HBM (bf16/f16)                 — fastest
2. diffusion weights int8 in HBM (W8A8 MXU path)         — ~0.5× weight bytes
3. diffusion weights packed 4-bit in HBM (Q4Tensor)      — ~0.28× weight bytes
4. host-RAM block streaming (BlockStreamer window)       — resident ≈ embeds
   + prefetch×block + activations (the --stream-layers analog)
5. disk streaming (DiskBlockSource)                      — host RSS bounded too

VAE tiling is enabled whenever the estimated decode activation exceeds its
share of the budget (the reference's decode-retry is the runtime fallback;
planning it up front avoids the failed attempt).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np

from sdtpu.utils import log_info


@dataclasses.dataclass
class FitPlan:
    """What to do to fit the generation in ``budget_bytes``."""

    weight_mode: str  # "dense" | "int8" | "q4" | "stream" | "disk"
    vae_tiling: bool
    est_bytes: int
    budget_bytes: int

    @property
    def fits(self) -> bool:
        return self.est_bytes <= self.budget_bytes


def _params_bytes(params: Optional[dict]) -> int:
    if not params:
        return 0
    total = 0
    for v in params.values():
        if hasattr(v, "nbytes"):
            total += int(v.nbytes)
        elif hasattr(v, "q"):  # QuantTensor
            total += int(v.q.nbytes) + int(v.scale.nbytes)
        elif hasattr(v, "packed"):  # Q4Tensor
            total += int(v.packed.nbytes) + int(v.scale.nbytes)
    return total


def derive_plan(
    diffusion_bytes: int,
    other_bytes: int,
    activation_bytes: int,
    decode_bytes: int,
    budget_bytes: int,
    allow_quantize: bool = True,
    block_bytes: Optional[int] = None,
    prefetch: int = 2,
) -> FitPlan:
    """Pick the cheapest weight mode whose estimate fits the budget
    (reference compute_plan's resident → split → time-share ladder,
    backend_fit.cpp:145; our ladder trades memory for dequant/stream cost
    instead of device count)."""
    resident = other_bytes + activation_bytes
    ladder = [("dense", diffusion_bytes)]
    if allow_quantize:
        # int8: 1 byte/weight + f32 row scales (≈ negligible)
        ladder.append(("int8", diffusion_bytes // 2))
        # q4: 0.5 byte/weight + bf16 group scales (≈ 1/16)
        ladder.append(("q4", diffusion_bytes * 9 // 32))
    if block_bytes:
        ladder.append(("stream", prefetch * block_bytes))
        ladder.append(("disk", prefetch * block_bytes))
    vae_tiling = decode_bytes > max(budget_bytes - resident, 0) // 2
    for mode, wbytes in ladder:
        est = resident + wbytes + (decode_bytes if not vae_tiling else decode_bytes // 8)
        if est <= budget_bytes:
            return FitPlan(mode, vae_tiling, est, budget_bytes)
    mode, wbytes = ladder[-1]
    return FitPlan(mode, True, resident + wbytes, budget_bytes)


def autofit_pipeline(pipe, budget_bytes: int, width: int = 1024,
                     height: int = 1024, allow_quantize: bool = True,
                     min_size: int = 1 << 16) -> FitPlan:
    """Apply a derived plan to a pipeline: quantize weights and/or enable
    VAE tiling in place (reference derive_backend_specs applied at init,
    stable-diffusion.cpp:873)."""
    dbytes = _params_bytes(pipe.diffusion_params)
    vbytes = _params_bytes(pipe.vae_params)
    # rough activation model: tokens × hidden × a small constant, in bf16
    lh, lw = height // pipe.scale_factor, width // pipe.scale_factor
    act = lh * lw * 4096 * 2 * 8
    dec = height * width * 3 * 4 * 32  # decoder feature pyramids
    plan = derive_plan(dbytes, vbytes, act, dec, budget_bytes,
                       allow_quantize=allow_quantize)
    log_info(
        f"auto-fit: diffusion {dbytes / 1e9:.2f} GB, budget "
        f"{budget_bytes / 1e9:.2f} GB → weights={plan.weight_mode}, "
        f"vae_tiling={plan.vae_tiling}"
    )
    if plan.weight_mode in ("int8", "q4"):
        from sdtpu.ops.quant import quantize_params

        bits = 8 if plan.weight_mode == "int8" else 4
        pipe.diffusion_params = quantize_params(
            {k: np.asarray(v) if hasattr(v, "shape") else v
             for k, v in pipe.diffusion_params.items()},
            bits=bits,
            min_size=min_size,
        )
    if plan.vae_tiling:
        pipe.set_vae_tiling(True)
    return plan

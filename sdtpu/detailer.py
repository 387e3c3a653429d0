"""ADetailer: detect → mask → crop → inpaint → paste.

Reference analog: ADetailerGGML (src/detailer.h:56, detailer.cpp): run a
YOLOv8 detector over the generated image, build a dilated mask per detection,
crop the region with context padding, re-generate it with the main pipeline
in img2img/inpaint mode at full model resolution, and blend the result back.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np


@dataclasses.dataclass
class ADetailerParams:
    """(reference adetailer params, detailer.h:29)"""

    confidence: float = 0.3
    mask_dilation: int = 4
    mask_padding: int = 32  # context pixels around the detection crop
    crop_size: int = 512  # inpaint working resolution
    strength: float = 0.4
    max_detections: int = 4
    prompt: Optional[str] = None  # None → reuse the generation prompt


def _dilate(mask: np.ndarray, r: int) -> np.ndarray:
    if r <= 0:
        return mask
    out = mask.copy()
    for shift in range(1, r + 1):
        out[shift:] = np.maximum(out[shift:], mask[:-shift])
        out[:-shift] = np.maximum(out[:-shift], mask[shift:])
        out[:, shift:] = np.maximum(out[:, shift:], mask[:, :-shift])
        out[:, :-shift] = np.maximum(out[:, :-shift], mask[:, shift:])
    return out


def adetail_image(
    pipeline,
    detector_params,
    detector_cfg,
    image: np.ndarray,
    gp,
    params: Optional[ADetailerParams] = None,
) -> Tuple[np.ndarray, List[tuple]]:
    """image: [H, W, 3] uint8 → (refined image, detections).

    Mirrors the reference loop (detailer.cpp): for each detection, inpaint a
    padded crop at crop_size resolution with the main pipeline, then paste the
    masked region back with feathered blending."""
    import dataclasses as _dc

    import jax
    import jax.numpy as jnp

    from sdtpu.models.yolov8 import detect_objects
    from sdtpu.utils.image import resize_image

    params = params or ADetailerParams()
    h, w = image.shape[:2]
    dets = detect_objects(
        detector_params, image, detector_cfg, conf_threshold=params.confidence
    )
    dets = sorted(dets, key=lambda d: -(d[2] - d[0]) * (d[3] - d[1]))
    dets = dets[: params.max_detections]

    out = np.asarray(image).copy()
    cs = params.crop_size
    for x1, y1, x2, y2, score, cls in dets:
        # padded crop window, clamped (reference crop logic)
        cx1 = max(int(x1) - params.mask_padding, 0)
        cy1 = max(int(y1) - params.mask_padding, 0)
        cx2 = min(int(x2) + params.mask_padding, w)
        cy2 = min(int(y2) + params.mask_padding, h)
        if cx2 - cx1 < 8 or cy2 - cy1 < 8:
            continue
        crop = out[cy1:cy2, cx1:cx2]
        ch, cw = crop.shape[:2]

        # detection mask inside the crop, dilated
        mask = np.zeros((ch, cw), dtype=np.float32)
        mask[int(y1) - cy1 : int(y2) - cy1, int(x1) - cx1 : int(x2) - cx1] = 1.0
        mask = _dilate(mask, params.mask_dilation)

        crop_rs = resize_image(crop, cs, cs)
        mask_rs = np.asarray(
            jax.image.resize(jnp.asarray(mask), (cs, cs), method="nearest")
        )

        gp2 = _dc.replace(
            gp,
            width=cs,
            height=cs,
            strength=params.strength,
            prompt=params.prompt if params.prompt is not None else gp.prompt,
            batch_count=1,
        )
        res = pipeline.generate(gp2, init_image=crop_rs, mask_image=mask_rs)
        refined = resize_image(res.images[0], cw, ch)

        # feathered paste using the dilated mask
        m3 = mask[..., None]
        blended = refined.astype(np.float32) * m3 + crop.astype(np.float32) * (1 - m3)
        out[cy1:cy2, cx1:cx2] = np.clip(blended, 0, 255).astype(np.uint8)
    return out, dets

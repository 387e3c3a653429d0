"""ADetailer: detect → sort/filter → mask → crop → inpaint → paste.

Reference analog: ADetailerGGML (src/detailer.h:56, detailer.cpp): run a
YOLOv8 detector over the generated image, filter/sort the detections, build
dilated-or-eroded / offset / blurred masks (optionally merged or inverted),
crop each region with context padding, re-generate it with the main pipeline
in img2img/inpaint mode at the inpaint resolution, and blend the result back.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

# detection sort modes (reference ADetailerSort, detailer.h:22-27)
SORT_NONE = "none"
SORT_LEFT_TO_RIGHT = "left_to_right"
SORT_CENTER_TO_EDGE = "center_to_edge"
SORT_AREA = "area"


@dataclasses.dataclass
class ADetailerParams:
    """(reference ADetailerParams, detailer.h:29-55)"""

    prompt: Optional[str] = None  # None → reuse the generation prompt
    negative_prompt: Optional[str] = None
    confidence: float = 0.3
    nms_threshold: float = 0.45
    max_detections: int = 100
    mask_k_largest: int = 0  # keep only the K largest detections (0 = all)
    mask_min_ratio: float = 0.0  # bbox-area/image-area bounds
    mask_max_ratio: float = 1.0
    dilate_erode: int = 4  # >0 dilate, <0 erode, 0 noop
    x_offset: int = 0
    y_offset: int = 0
    merge_masks: bool = False  # union all masks → single inpaint pass
    invert_mask: bool = False
    mask_blur: int = 4  # feather radius for the paste blend
    inpaint_padding: int = 32  # context pixels around the detection crop
    inpaint_width: int = 512  # inpaint working resolution
    inpaint_height: int = 512
    denoising_strength: float = 0.4
    steps: int = 0  # 0 = reuse gp.sample_steps
    cfg_scale: float = -1.0  # <0 = reuse gp.cfg_scale
    sample_method: Optional[str] = None
    scheduler: Optional[str] = None
    sort_by: str = SORT_NONE
    class_names: Optional[Dict[int, str]] = None  # class_id → prompt object


def _morph(mask: np.ndarray, r: int) -> np.ndarray:
    """Dilate (r>0) or erode (r<0) with a square structuring element
    (reference morphology_mask, detailer.cpp:431)."""
    if r == 0:
        return mask
    erode = r < 0
    r = abs(r)
    src = 1.0 - mask if erode else mask
    out = src.copy()
    for shift in range(1, r + 1):
        out[shift:] = np.maximum(out[shift:], src[:-shift])
        out[:-shift] = np.maximum(out[:-shift], src[shift:])
        out[:, shift:] = np.maximum(out[:, shift:], src[:, :-shift])
        out[:, :-shift] = np.maximum(out[:, :-shift], src[:, shift:])
    return 1.0 - out if erode else out


def _offset(mask: np.ndarray, dx: int, dy: int) -> np.ndarray:
    """Shift the mask by (dx, dy), zero-filling (reference offset_mask)."""
    if dx == 0 and dy == 0:
        return mask
    out = np.zeros_like(mask)
    h, w = mask.shape
    sy0, sy1 = max(0, -dy), min(h, h - dy)
    sx0, sx1 = max(0, -dx), min(w, w - dx)
    out[sy0 + dy : sy1 + dy, sx0 + dx : sx1 + dx] = mask[sy0:sy1, sx0:sx1]
    return out


def _blur(mask: np.ndarray, r: int) -> np.ndarray:
    """Box-blur feathering (reference mask_blur gaussian approximation)."""
    if r <= 0:
        return mask
    out = mask
    for _ in range(3):  # 3 box passes ≈ gaussian
        k = 2 * r + 1
        pad = np.pad(out, r, mode="edge")
        c = np.cumsum(np.cumsum(np.pad(pad, ((1, 0), (1, 0))), axis=0), axis=1)
        h, w = out.shape
        out = (
            c[k:, k:][:h, :w] - c[:-k, k:][:h, :w]
            - c[k:, :-k][:h, :w] + c[:-k, :-k][:h, :w]
        ) / (k * k)
    return out.astype(np.float32)


def _sort_detections(dets: List[tuple], mode: str, w: int, h: int) -> List[tuple]:
    """(reference sort dispatch, detailer.cpp:298-315)"""
    if mode == SORT_LEFT_TO_RIGHT:
        return sorted(dets, key=lambda d: (d[0] + d[2]) / 2.0)
    if mode == SORT_CENTER_TO_EDGE:
        cx, cy = w / 2.0, h / 2.0
        return sorted(
            dets,
            key=lambda d: ((d[0] + d[2]) / 2 - cx) ** 2 + ((d[1] + d[3]) / 2 - cy) ** 2,
        )
    if mode == SORT_AREA:
        return sorted(dets, key=lambda d: -(d[2] - d[0]) * (d[3] - d[1]))
    return list(dets)


def filter_detections(dets: List[tuple], params: ADetailerParams, w: int, h: int):
    """ratio bounds → k-largest → sort → max cap (reference
    decode_detections post-filtering, detailer.cpp:283-315)."""
    area = float(w * h)
    dets = [
        d for d in dets
        if params.mask_min_ratio
        <= ((d[2] - d[0]) * (d[3] - d[1])) / area
        <= params.mask_max_ratio
    ]
    if params.mask_k_largest > 0 and len(dets) > params.mask_k_largest:
        dets = sorted(dets, key=lambda d: -(d[2] - d[0]) * (d[3] - d[1]))
        dets = dets[: params.mask_k_largest]
    dets = _sort_detections(dets, params.sort_by, w, h)
    return dets[: params.max_detections]


def build_masks(
    dets: List[tuple], params: ADetailerParams, w: int, h: int
) -> List[np.ndarray]:
    """Per-detection full-image masks with offset/morphology applied, then
    optional merge + invert (reference build_masks, detailer.cpp:420-452)."""
    masks = []
    for x1, y1, x2, y2, *_ in dets:
        m = np.zeros((h, w), dtype=np.float32)
        m[max(int(y1), 0) : min(int(y2), h), max(int(x1), 0) : min(int(x2), w)] = 1.0
        m = _offset(m, params.x_offset, params.y_offset)
        m = _morph(m, params.dilate_erode)
        if m.any():
            masks.append(m)
    if params.merge_masks and masks:
        merged = masks[0]
        for m in masks[1:]:
            merged = np.maximum(merged, m)
        masks = [merged]
    if params.invert_mask:
        masks = [1.0 - m for m in masks]
    return masks


def _mask_bbox(mask: np.ndarray) -> Optional[Tuple[int, int, int, int]]:
    ys, xs = np.nonzero(mask > 0)
    if len(ys) == 0:
        return None
    return int(xs.min()), int(ys.min()), int(xs.max()) + 1, int(ys.max()) + 1


def adetail_image(
    pipeline,
    detector_params,
    detector_cfg,
    image: np.ndarray,
    gp,
    params: Optional[ADetailerParams] = None,
) -> Tuple[np.ndarray, List[tuple]]:
    """image: [H, W, 3] uint8 → (refined image, detections).

    Mirrors the reference loop (detailer.cpp ADetailerGGML::process): detect →
    filter/sort → per-mask: crop the mask bbox with inpaint_padding context,
    img2img the crop at (inpaint_width, inpaint_height) with the mask, paste
    back with mask_blur feathering."""
    import dataclasses as _dc

    import jax
    import jax.numpy as jnp

    from sdtpu.models.yolov8 import detect_objects
    from sdtpu.utils.image import resize_image

    params = params or ADetailerParams()
    h, w = image.shape[:2]
    dets = detect_objects(
        detector_params, image, detector_cfg,
        conf_threshold=params.confidence, iou_threshold=params.nms_threshold,
    )
    dets = filter_detections(dets, params, w, h)
    masks = build_masks(dets, params, w, h)

    out = np.asarray(image).copy()
    cw_t, ch_t = params.inpaint_width, params.inpaint_height
    for mi, mask_full in enumerate(masks):
        bbox = _mask_bbox(mask_full)
        if bbox is None:
            continue
        x1, y1, x2, y2 = bbox
        cx1 = max(x1 - params.inpaint_padding, 0)
        cy1 = max(y1 - params.inpaint_padding, 0)
        cx2 = min(x2 + params.inpaint_padding, w)
        cy2 = min(y2 + params.inpaint_padding, h)
        if cx2 - cx1 < 8 or cy2 - cy1 < 8:
            continue
        crop = out[cy1:cy2, cx1:cx2]
        mask = mask_full[cy1:cy2, cx1:cx2]
        ch, cw = crop.shape[:2]

        # per-class prompt object (reference class_names substitution,
        # detailer.cpp:730-733): "[object]" in the prompt is replaced by the
        # detected class name
        det_cls = int(dets[min(mi, len(dets) - 1)][5]) if dets else -1
        prompt = params.prompt if params.prompt is not None else gp.prompt
        if "[object]" in (prompt or ""):
            names = params.class_names or {}
            prompt = prompt.replace("[object]", names.get(det_cls, f"class_{det_cls}"))

        crop_rs = resize_image(crop, cw_t, ch_t)
        mask_rs = np.asarray(
            jax.image.resize(jnp.asarray(mask), (ch_t, cw_t), method="nearest")
        )

        gp2 = _dc.replace(
            gp,
            width=cw_t,
            height=ch_t,
            strength=params.denoising_strength,
            prompt=prompt,
            negative_prompt=(
                params.negative_prompt
                if params.negative_prompt is not None
                else gp.negative_prompt
            ),
            sample_steps=params.steps or gp.sample_steps,
            cfg_scale=params.cfg_scale if params.cfg_scale >= 0 else gp.cfg_scale,
            sample_method=params.sample_method or gp.sample_method,
            schedule=params.scheduler or gp.schedule,
            batch_count=1,
        )
        res = pipeline.generate(gp2, init_image=crop_rs, mask_image=mask_rs)
        refined = resize_image(res.images[0], cw, ch)

        # feathered paste using the blurred mask
        m3 = _blur(mask, params.mask_blur)[..., None]
        blended = refined.astype(np.float32) * m3 + crop.astype(np.float32) * (1 - m3)
        out[cy1:cy2, cx1:cx2] = np.clip(blended, 0, 255).astype(np.uint8)
    return out, dets

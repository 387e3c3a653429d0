"""LingBot-Video sparse-MoE video DiT tests."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from sdtpu.models.lingbot_video import (
    LingBotVideoConfig,
    _moe_ffn,
    detect_lingbot_config,
    init_lingbot_params,
    lingbot_forward,
    lingbot_rope,
)

TINY = LingBotVideoConfig(
    hidden_size=32, num_heads=2, depth=3, intermediate_size=64,
    text_dim=24, freq_dim=16, axes_dim=(4, 6, 6), in_channels=4,
    out_channels=4, num_experts=4, num_experts_per_tok=2,
    moe_intermediate_size=8, n_group=2, topk_group=1, sparse_layers=(1,))


@pytest.fixture(scope="module")
def tiny_params():
    return init_lingbot_params(TINY, seed=0)


def test_forward_shapes(tiny_params):
    g = np.random.default_rng(1)
    x = jnp.asarray(g.standard_normal((1, 2, 4, 4, 4), dtype=np.float32))
    ctx = jnp.asarray(g.standard_normal((1, 7, 24), dtype=np.float32) * 0.1)
    out = lingbot_forward(tiny_params, x, jnp.asarray([500.0]), ctx, cfg=TINY)
    assert out.shape == (1, 2, 4, 4, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_per_frame_timesteps(tiny_params):
    """i2v masking drives per-frame timesteps: zeroing one frame's t must
    change the output (reference process_timesteps + denoise_mask,
    stable-diffusion.cpp:2569)."""
    g = np.random.default_rng(2)
    x = jnp.asarray(g.standard_normal((1, 2, 4, 4, 4), dtype=np.float32))
    ctx = jnp.asarray(g.standard_normal((1, 5, 24), dtype=np.float32) * 0.1)
    o1 = lingbot_forward(tiny_params, x, jnp.asarray([[500.0, 500.0]]), ctx, cfg=TINY)
    o2 = lingbot_forward(tiny_params, x, jnp.asarray([[0.0, 500.0]]), ctx, cfg=TINY)
    assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 1e-5
    # scalar == uniform per-frame
    o3 = lingbot_forward(tiny_params, x, jnp.asarray([500.0]), ctx, cfg=TINY)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o3), atol=1e-5)


def test_rope_layout():
    """Video tokens first with frame-axis offset n_txt+1; text token j at
    (j+1, 0, 0) (reference gen_lingbot_video_ids, rope.hpp:822)."""
    rot = np.asarray(lingbot_rope(2, 2, 2, 3, TINY))
    assert rot.shape[0] == 8 + 3
    # first video token (t=0+4, h=0, w=0) vs first txt token (t=1, 0, 0):
    # the h/w sections are identity for both
    d_t = TINY.axes_dim[0] // 2
    np.testing.assert_allclose(rot[0, d_t:], rot[8, d_t:], atol=1e-6)


def test_moe_group_limited_routing(tiny_params):
    """Group limiting: with 2 groups and topk_group=1, all selected experts
    come from one group; weights renormalize over the top-k and scale by
    the routed factor."""
    cfg = TINY
    g = np.random.default_rng(3)
    x = jnp.asarray(g.standard_normal((1, 6, 32), dtype=np.float32))
    out = _moe_ffn(tiny_params, "blocks.1.ffn", x, cfg)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    # shared expert contributes: zeroing it changes the output
    p2 = dict(tiny_params)
    p2["blocks.1.ffn.shared_experts.down_proj.weight"] = jnp.zeros_like(
        p2["blocks.1.ffn.shared_experts.down_proj.weight"])
    out2 = _moe_ffn(p2, "blocks.1.ffn", x, cfg)
    assert np.abs(np.asarray(out) - np.asarray(out2)).max() > 1e-6


def test_detect_config(tiny_params):
    shapes = {k: tuple(v.shape) for k, v in tiny_params.items()}
    cfg = detect_lingbot_config(set(tiny_params.keys()), shapes)
    assert cfg.depth == 3 and cfg.hidden_size == 32
    assert cfg.sparse_layers == (1,)
    assert cfg.num_experts == 4 and cfg.moe_intermediate_size == 8
    assert cfg.text_dim == 24 and cfg.num_heads == 2


def test_pipeline_t2v():
    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.factory import create_pipeline

    pipe = create_pipeline(SDVersion.LINGBOT_VIDEO, small=True, seed=0)
    res = pipe.generate_video(GenerationParams(
        prompt="a corgi", width=32, height=32, sample_steps=2,
        sample_method="euler", cfg_scale=1.0), frames=5)
    assert res.frames.shape == (1, 5, 32, 32, 3)


def test_detect_version(tiny_params):
    from sdtpu.config import SDVersion
    from sdtpu.io.detect import detect_version

    shapes = {k: tuple(v.shape) for k, v in tiny_params.items()}
    assert detect_version(tiny_params.keys(), shapes) == SDVersion.LINGBOT_VIDEO

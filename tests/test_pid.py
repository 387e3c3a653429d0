"""PiD (PixelDiT) pixel-space super-resolution tests."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from sdtpu.models.pid import (
    PidConfig,
    detect_pid_config,
    init_pid_params,
    pid_forward,
    pid_rope_2d,
)

TINY = PidConfig(
    hidden_size=48, num_groups=4, patch_mlp_hidden_dim=64,
    pixel_hidden_size=8, pixel_attn_hidden_size=32, pixel_num_groups=2,
    patch_depth=3, pixel_depth=2, patch_size=4, txt_embed_dim=24,
    txt_max_length=16, lq_latent_channels=8, lq_hidden_dim=8,
    lq_num_res_blocks=2, rope_ref_grid_h=8, rope_ref_grid_w=8)


@pytest.fixture(scope="module")
def tiny_params():
    return init_pid_params(TINY, seed=0)


def test_forward_shapes_with_padding(tiny_params):
    g = np.random.default_rng(1)
    x = jnp.asarray(g.standard_normal((1, 10, 14, 3), dtype=np.float32))
    ctx = jnp.asarray(g.standard_normal((1, 9, 24), dtype=np.float32) * 0.1)
    lq = jnp.asarray(g.standard_normal((1, 2, 2, 8), dtype=np.float32))
    out = pid_forward(tiny_params, x, jnp.asarray([500.0]), ctx, lq, cfg=TINY)
    assert out.shape == (1, 10, 14, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_lq_latent_matters(tiny_params):
    """The sigma-gated LQ injection must affect the output.  (Random-init
    weights are 0.02-scale and the y/s paths pass through RMSNorms, so the
    propagated difference is small but must be nonzero and well above float
    noise.)"""
    g = np.random.default_rng(2)
    x = jnp.asarray(g.standard_normal((1, 8, 8, 3), dtype=np.float32))
    ctx = jnp.asarray(g.standard_normal((1, 5, 24), dtype=np.float32) * 0.1)
    lq1 = jnp.asarray(g.standard_normal((1, 2, 2, 8), dtype=np.float32))
    lq2 = lq1 + 5.0  # additive: not absorbed by any normalization
    o1 = pid_forward(tiny_params, x, jnp.asarray([500.0]), ctx, lq1, cfg=TINY)
    o2 = pid_forward(tiny_params, x, jnp.asarray([500.0]), ctx, lq2, cfg=TINY)
    assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 1e-7


def test_pid15_variant():
    cfg = dataclasses.replace(
        TINY, pit_lq_inject=True, lq_replicate_padding=True,
        lq_latent_channels=32, lq_latent_unpatchify_factor=2)
    p = init_pid_params(cfg, seed=0)
    assert "lq_proj.pit_head.weight" in p
    assert "pit_lq_gate.log_alpha" in p
    g = np.random.default_rng(3)
    x = jnp.asarray(g.standard_normal((1, 8, 8, 3), dtype=np.float32))
    ctx = jnp.asarray(g.standard_normal((1, 5, 24), dtype=np.float32) * 0.1)
    lq = jnp.asarray(g.standard_normal((1, 2, 2, 32), dtype=np.float32))
    out = pid_forward(p, x, jnp.asarray([500.0]), ctx, lq, cfg=cfg)
    assert out.shape == (1, 8, 8, 3)


def test_rope_2d_interleaved_layout():
    """x-axis entries land on even frequency slots, y on odd (reference
    Rope::embed_2d_interleaved, rope.hpp:297-350)."""
    rot = np.asarray(pid_rope_2d(3, 5, 8, ref_h=0, ref_w=0))
    assert rot.shape == (15, 4, 2, 2)
    # position (y=0, x=0) → identity rotations everywhere
    np.testing.assert_allclose(rot[0], np.broadcast_to(np.eye(2), (4, 2, 2)),
                               atol=1e-6)
    # same x, different y: even (x) slots identical, odd (y) slots differ
    p_a, p_b = 1, 1 + 5  # (0,1) and (1,1)
    np.testing.assert_allclose(rot[p_a, 0::2], rot[p_b, 0::2], atol=1e-6)
    assert np.abs(rot[p_a, 1::2] - rot[p_b, 1::2]).max() > 1e-3


def test_detect_config(tiny_params):
    shapes = {k: tuple(v.shape) for k, v in tiny_params.items()}
    cfg = detect_pid_config(set(tiny_params.keys()), shapes)
    assert cfg.patch_depth == 3 and cfg.pixel_depth == 2
    assert cfg.hidden_size == 48 and cfg.txt_embed_dim == 24
    assert cfg.lq_hidden_dim == 8 and not cfg.pit_lq_inject
    assert cfg.patch_mlp_hidden_dim == 64


def test_pipeline_e2e_requires_ref():
    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.factory import create_pipeline

    pipe = create_pipeline(SDVersion.PID, small=True, seed=0)
    ref = np.random.default_rng(0).random((8, 8, 3), dtype=np.float32)
    res = pipe.generate(GenerationParams(
        prompt="a corgi", width=16, height=16, sample_steps=2,
        sample_method="euler", cfg_scale=1.0), ref_images=[ref])
    assert res.images.shape == (1, 16, 16, 3)
    with pytest.raises(ValueError):
        pipe.generate(GenerationParams(
            prompt="x", width=16, height=16, sample_steps=1,
            sample_method="euler", cfg_scale=1.0))

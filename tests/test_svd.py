"""Stable Video Diffusion (spatial-video UNet) tests."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdtpu.models.unet import (
    SVD_UNET_CONFIG,
    init_unet_params,
    unet_forward,
    video_resblock,
)

TINY = dataclasses.replace(
    SVD_UNET_CONFIG, model_channels=32, num_res_blocks=1, channel_mult=(1, 2),
    transformer_depth=(1, 1), context_dim=48, adm_in_channels=24,
    num_head_channels=16, attention_resolutions=(1, 2))


@pytest.fixture(scope="module")
def tiny_params():
    return init_unet_params(TINY, seed=0)


def test_svd_params_exist(tiny_params):
    assert "input_blocks.1.0.time_stack.in_layers.2.weight" in tiny_params
    assert "input_blocks.1.0.time_mixer.mix_factor" in tiny_params
    assert "input_blocks.1.1.time_stack.0.norm_in.weight" in tiny_params
    assert "input_blocks.1.1.time_pos_embed.0.weight" in tiny_params
    # temporal conv kernel is (3,1,1) (reference conv_nd dims=3)
    assert tiny_params["input_blocks.1.0.time_stack.in_layers.2.weight"].shape \
        == (32, 32, 3, 1, 1)


def test_forward_and_temporal_coupling(tiny_params):
    g = np.random.default_rng(1)
    T = 3
    x = jnp.asarray(g.standard_normal((T, 8, 8, 8), dtype=np.float32))
    t = jnp.full((T,), 500.0)
    ctx = jnp.asarray(g.standard_normal((T, 1, 48), dtype=np.float32))
    y = jnp.asarray(g.standard_normal((T, 24), dtype=np.float32))
    fwd = jax.jit(lambda xx: unet_forward(tiny_params, xx, t, ctx, y=y,
                                          cfg=TINY, num_frames=T))
    out = fwd(x)
    assert out.shape == (T, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()
    # temporal attention + conv couple frames: frame 2's input reaches
    # frame 0's output
    out2 = fwd(x.at[2].add(1.0))
    assert np.abs(np.asarray(out2[0]) - np.asarray(out[0])).max() > 1e-4


def test_alpha_mix_bounds(tiny_params):
    """With mix_factor=0 the blend is exactly 50/50 spatial/temporal."""
    from sdtpu.models.unet import _alpha_mix

    s = jnp.ones((1, 2, 2))
    tt = jnp.zeros((1, 2, 2))
    out = _alpha_mix({"m.mix_factor": jnp.zeros((1,))}, "m", s, tt)
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-6)


def test_edmv_denoiser():
    from sdtpu.diffusion.denoiser import EDMVDenoiser

    d = EDMVDenoiser()
    assert d.sigma_min() == 0.002 and d.sigma_max() == 120.0
    # sigma_to_t inverse of t_to_sigma: sigma = exp(4t/1000), t = 250*ln(s)
    s = d.t_to_sigma(np.float32(500.0))
    np.testing.assert_allclose(d.sigma_to_t(s) * 1000.0, 500.0, rtol=1e-4)
    c_skip, c_out, c_in = d.get_scalings(np.float32(1.0))
    np.testing.assert_allclose(c_skip, 0.5, atol=1e-6)  # v-pred scalings


def test_pipeline_i2v():
    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.factory import create_pipeline

    pipe = create_pipeline(SDVersion.SVD, small=True, seed=0)
    init = np.random.default_rng(0).random((32, 32, 3), dtype=np.float32)
    res = pipe.generate_video(GenerationParams(
        prompt="", width=32, height=32, sample_steps=2,
        sample_method="euler", cfg_scale=1.0, schedule="karras", seed=1),
        frames=3, init_image=init)
    assert res.frames.shape == (1, 3, 32, 32, 3)


def test_detect_svd(tiny_params):
    from sdtpu.config import SDVersion
    from sdtpu.io.detect import detect_version

    shapes = {k: tuple(v.shape) for k, v in tiny_params.items()}
    assert detect_version(tiny_params.keys(), shapes) == SDVersion.SVD

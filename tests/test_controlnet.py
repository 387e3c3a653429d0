"""ControlNet (reference src/model/diffusion/control.hpp:311): zero-conv
identity property, control injection into the UNet, name conversion, and the
pipeline control path."""
import numpy as np
import pytest

import jax.numpy as jnp

from sdtpu.models.controlnet import controlnet_forward, init_controlnet_params
from sdtpu.models.unet import UNetConfig, init_unet_params, unet_forward

SMALL = UNetConfig(
    in_channels=4,
    out_channels=4,
    model_channels=32,
    num_res_blocks=1,
    channel_mult=(1, 2),
    attention_resolutions=(1, 2),
    transformer_depth=(1, 1),
    context_dim=48,
    num_heads=2,
)


def _inputs(b=1, hw=16):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, hw, hw, 4), dtype=np.float32))
    hint = jnp.asarray(rng.uniform(0, 1, (b, hw * 8, hw * 8, 3)).astype(np.float32))
    t = jnp.full((b,), 500.0, dtype=jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((b, 77, 48), dtype=np.float32))
    return x, hint, t, ctx


def test_controlnet_shapes_and_downsampling():
    p = init_controlnet_params(SMALL, seed=0)
    x, hint, t, ctx = _inputs()
    controls, middle = controlnet_forward(p, x, hint, t, ctx, cfg=SMALL)
    # one control per input block: conv_in + 1 res + 1 attnres... layout-driven
    from sdtpu.models.unet import _block_layout

    inputs, _ = _block_layout(SMALL)
    assert len(controls) == len(inputs)
    assert controls[0].shape == (1, 16, 16, 32)
    assert middle.shape[-1] == SMALL.channel_mult[-1] * SMALL.model_channels


def test_zero_convs_give_identity():
    """Freshly-initialized (zero-conv) controlnet must not change the UNet
    output — the defining ControlNet property."""
    up = init_unet_params(SMALL, seed=1)
    cp = init_controlnet_params(SMALL, seed=2)
    x, hint, t, ctx = _inputs()
    base = unet_forward(up, x, t, ctx, cfg=SMALL)
    controls = controlnet_forward(cp, x, hint, t, ctx, cfg=SMALL)
    out = unet_forward(up, x, t, ctx, cfg=SMALL, controls=controls, control_strength=1.0)
    np.testing.assert_allclose(np.asarray(base), np.asarray(out), atol=1e-6)


def test_nonzero_controls_change_output():
    up = init_unet_params(SMALL, seed=1)
    cp = init_controlnet_params(SMALL, seed=2)
    # un-zero the taps
    for k in list(cp):
        if k.startswith(("zero_convs.", "middle_block_out.")) and k.endswith("weight"):
            cp[k] = jnp.ones_like(cp[k]) * 0.05
    x, hint, t, ctx = _inputs()
    base = unet_forward(up, x, t, ctx, cfg=SMALL)
    controls = controlnet_forward(cp, x, hint, t, ctx, cfg=SMALL)
    out = unet_forward(up, x, t, ctx, cfg=SMALL, controls=controls, control_strength=1.0)
    assert not np.allclose(np.asarray(base), np.asarray(out), atol=1e-4)
    # strength scales the deviation
    half = unet_forward(up, x, t, ctx, cfg=SMALL, controls=controls, control_strength=0.5)
    d_full = np.abs(np.asarray(out) - np.asarray(base)).mean()
    d_half = np.abs(np.asarray(half) - np.asarray(base)).mean()
    assert d_half < d_full


def test_name_conversion_diffusers_controlnet():
    from sdtpu.io.name_conversion import convert_diffusers_controlnet_name as cv

    assert cv("controlnet_cond_embedding.conv_in.weight") == "input_hint_block.0.weight"
    assert cv("controlnet_cond_embedding.blocks.0.bias") == "input_hint_block.2.bias"
    assert cv("controlnet_cond_embedding.blocks.5.weight") == "input_hint_block.12.weight"
    assert cv("controlnet_cond_embedding.conv_out.weight") == "input_hint_block.14.weight"
    assert cv("controlnet_down_blocks.3.weight") == "zero_convs.3.0.weight"
    assert cv("controlnet_mid_block.bias") == "middle_block_out.0.bias"
    # encoder copy falls through to the unet mapping
    assert cv("time_embedding.linear_1.weight") == "time_embed.0.weight"
    assert (
        cv("down_blocks.0.resnets.0.conv1.weight")
        == "input_blocks.1.0.in_layers.2.weight"
    )


def test_pipeline_control_path():
    """End-to-end small pipeline with an active controlnet: runs, and output
    differs from the uncontrolled generation."""
    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.factory import create_pipeline, unet_config_for

    pipe = create_pipeline(SDVersion.SD1, small=True, seed=0)
    ucfg = unet_config_for(SDVersion.SD1, small=True)
    cp = init_controlnet_params(ucfg, seed=3)
    for k in list(cp):
        if k.startswith(("zero_convs.", "middle_block_out.")) and k.endswith("weight"):
            cp[k] = jnp.ones_like(cp[k]) * 0.05

    gp = GenerationParams(
        prompt="a photo", width=64, height=64, sample_steps=2, cfg_scale=3.0,
        sample_method="euler", seed=7,
    )
    base = pipe.generate(gp)
    hint = (np.random.default_rng(0).uniform(0, 1, (64, 64, 3)) * 255).astype(np.uint8)

    pipe.set_controlnet(cp)
    ctrl = pipe.generate(gp, control_image=hint, control_strength=0.9)
    assert ctrl.images.shape == base.images.shape
    assert not np.allclose(base.latents, ctrl.latents, atol=1e-4)

    # detaching restores the baseline
    pipe.set_controlnet(None)
    again = pipe.generate(gp, control_image=hint)
    np.testing.assert_allclose(base.latents, again.latents, atol=1e-5)

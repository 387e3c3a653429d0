"""CLIP vision tower + IP-Adapter decoupled cross-attention (reference
src/model/adapter/ip_adapter.hpp, clip.hpp:426, unet.hpp:779-857)."""
import numpy as np
import pytest

import jax.numpy as jnp

from sdtpu.models.clip import (
    CLIPVisionConfig,
    clip_preprocess,
    clip_vision_forward,
    init_clip_vision_params,
)
from sdtpu.models.ip_adapter import (
    attn2_paths,
    image_proj_tokens,
    init_ip_adapter_params,
    load_ip_adapter,
)
from sdtpu.models.unet import SD1_UNET_CONFIG, UNetConfig, init_unet_params, unet_forward

SMALL_VIS = CLIPVisionConfig(
    image_size=28, patch_size=14, hidden_size=32, intermediate_size=64,
    num_layers=2, num_heads=4, projection_dim=24,
)
SMALL_UNET = UNetConfig(
    in_channels=4, out_channels=4, model_channels=32, num_res_blocks=1,
    channel_mult=(1, 2), attention_resolutions=(1, 2), transformer_depth=(1, 1),
    context_dim=48, num_heads=2,
)


def test_clip_vision_forward():
    p = init_clip_vision_params(SMALL_VIS, seed=0)
    img = (np.random.default_rng(0).uniform(0, 255, (64, 48, 3))).astype(np.uint8)
    pixels = clip_preprocess(img, SMALL_VIS.image_size)
    assert pixels.shape == (1, 28, 28, 3)
    emb, hidden = clip_vision_forward(p, pixels, SMALL_VIS, return_hidden=True)
    assert emb.shape == (1, 24)
    assert hidden.shape == (1, 1 + 4, 32)  # cls + 2x2 patches
    assert np.isfinite(np.asarray(emb)).all()


def test_attn2_paths_sd15_count():
    # SD1.5 has 16 cross-attn sites (6 down + 1 mid + 9 up)
    assert len(attn2_paths(SD1_UNET_CONFIG)) == 16


def test_ip_checkpoint_mapping():
    paths = attn2_paths(SMALL_UNET)
    tensors = {"image_proj.proj.weight": np.zeros((4, 4), np.float32)}
    for i in range(len(paths)):
        tensors[f"ip_adapter.{2 * i + 1}.to_k_ip.weight"] = np.zeros((8, 8), np.float32)
        tensors[f"ip_adapter.{2 * i + 1}.to_v_ip.weight"] = np.zeros((8, 8), np.float32)
    proj, extra = load_ip_adapter(tensors, SMALL_UNET)
    assert "proj.weight" in proj
    assert f"{paths[0]}.to_k_ip.weight" in extra
    assert f"{paths[-1]}.to_v_ip.weight" in extra
    assert len(extra) == 2 * len(paths)


def test_ip_decoupled_attention_changes_output():
    up = init_unet_params(SMALL_UNET, seed=0)
    proj, extra = init_ip_adapter_params(up, SMALL_UNET, clip_embed_dim=24, seed=1)
    up_ip = {**up, **extra}
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 4), dtype=np.float32))
    t = jnp.asarray([500.0])
    ctx = jnp.asarray(rng.standard_normal((1, 77, 48), dtype=np.float32))
    tokens = image_proj_tokens(
        proj, jnp.asarray(rng.standard_normal((1, 24), dtype=np.float32)), 48
    )
    assert tokens.shape == (1, 4, 48)

    base = unet_forward(up, x, t, ctx, cfg=SMALL_UNET)
    # ip weights present but no image → unchanged
    same = unet_forward(up_ip, x, t, ctx, cfg=SMALL_UNET)
    np.testing.assert_allclose(np.asarray(base), np.asarray(same), atol=1e-6)
    # image tokens steer the output; scale 0 restores baseline
    steered = unet_forward(up_ip, x, t, ctx, cfg=SMALL_UNET, ip_context=tokens, ip_scale=1.0)
    assert not np.allclose(np.asarray(base), np.asarray(steered), atol=1e-4)
    zeroed = unet_forward(up_ip, x, t, ctx, cfg=SMALL_UNET, ip_context=tokens, ip_scale=0.0)
    np.testing.assert_allclose(np.asarray(base), np.asarray(zeroed), atol=1e-5)


def test_ip_pipeline_end_to_end():
    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.factory import create_pipeline

    pipe = create_pipeline(SDVersion.SD1, small=True, seed=0)
    from sdtpu.factory import unet_config_for

    ucfg = unet_config_for(SDVersion.SD1, small=True)
    proj, extra = init_ip_adapter_params(
        pipe.diffusion_params, ucfg, clip_embed_dim=SMALL_VIS.projection_dim, seed=2
    )
    vis_params = init_clip_vision_params(SMALL_VIS, seed=3)
    pipe.set_ip_adapter(proj, extra, vis_params, SMALL_VIS)

    gp = GenerationParams(
        prompt="a dog", width=64, height=64, sample_steps=2, cfg_scale=3.0,
        sample_method="euler", seed=4,
    )
    ref_img = (np.random.default_rng(5).uniform(0, 255, (64, 64, 3))).astype(np.uint8)
    base = pipe.generate(gp)
    with_ip = pipe.generate(gp, ip_image=ref_img, ip_scale=0.8)
    assert with_ip.images.shape == base.images.shape
    assert not np.allclose(base.latents, with_ip.latents, atol=1e-4)

    # IP-Adapter must survive an active ControlNet (round-4 review finding:
    # the control branch rebound the kwargs dict, silently dropping
    # ip_context — both feed the same UNet forward, reference
    # unet.hpp:779-857 + stable-diffusion.cpp:2605)
    import jax.numpy as jnp

    from sdtpu.models.controlnet import init_controlnet_params

    cp = init_controlnet_params(ucfg, seed=6)
    for k in list(cp):
        if k.startswith(("zero_convs.", "middle_block_out.")) and k.endswith("weight"):
            cp[k] = jnp.ones_like(cp[k]) * 0.05
    pipe.set_controlnet(cp)
    hint = (np.random.default_rng(7).uniform(0, 255, (64, 64, 3))).astype(np.uint8)
    ctrl_only = pipe.generate(gp, control_image=hint)
    ctrl_ip = pipe.generate(gp, control_image=hint, ip_image=ref_img,
                            ip_scale=0.8)
    assert not np.allclose(ctrl_only.latents, ctrl_ip.latents, atol=1e-4)

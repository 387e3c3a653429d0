"""Distilled tiny UNets (SD1/SD2 tiny, SDXS) and FLUX concat variants
(Fill / Canny-Depth "Controls" / Flex.2) — reference model.h:14-60 version
enum + unet.hpp:72-78 tiny layout + stable-diffusion.cpp:4931-4986 concat
rules."""
import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from sdtpu.config import GenerationParams, SDVersion
from sdtpu.factory import create_pipeline


def test_tiny_unet_layout_fingerprints():
    """Tiny UNets keep the parent numbering with holes (reference
    unet.hpp:398-401,466-471): inputs 1/4/7, upsamples at output_blocks.2.1
    and 5.2, no middle block; SDXS-512 drops the ds=1 attention (no
    output_blocks.7.1)."""
    from sdtpu.models.unet import (
        SD1_TINY_UNET_CONFIG,
        SDXS_09_UNET_CONFIG,
        SDXS_512_UNET_CONFIG,
        unet_param_shapes,
    )

    for cfg, want_ob71 in ((SD1_TINY_UNET_CONFIG, True),
                           (SDXS_512_UNET_CONFIG, False),
                           (SDXS_09_UNET_CONFIG, True)):
        ks = set(unet_param_shapes(cfg))
        assert not any(k.startswith("middle_block") for k in ks)
        ins = sorted({int(k.split(".")[1]) for k in ks
                      if k.startswith("input_blocks")})
        assert ins == [0, 1, 3, 4, 6, 7], ins
        assert ("output_blocks.2.1.conv.weight" in ks
                and "output_blocks.5.2.conv.weight" in ks)
        assert any(k.startswith("output_blocks.7.1") for k in ks) == want_ob71


def test_tiny_unet_forward_and_sdxs09_head():
    from sdtpu.models.unet import (
        SD1_TINY_UNET_CONFIG,
        SDXS_09_UNET_CONFIG,
        _heads_for,
        init_unet_params,
        unet_forward,
    )

    assert _heads_for(SDXS_09_UNET_CONFIG, 320) == 1  # 5×64 → 1×320
    assert _heads_for(SDXS_09_UNET_CONFIG, 640) == 10  # only the 5-head case

    cfg = dataclasses.replace(SD1_TINY_UNET_CONFIG, model_channels=32,
                              context_dim=64, num_heads=2)
    p = init_unet_params(cfg, seed=0)
    rng = np.random.default_rng(0)
    out = unet_forward(
        p,
        jnp.asarray(rng.standard_normal((1, 32, 32, 4)), jnp.float32),
        jnp.asarray([500.0], jnp.float32),
        jnp.asarray(rng.standard_normal((1, 8, 64)), jnp.float32),
        cfg=cfg,
    )
    assert out.shape == (1, 32, 32, 4)


@pytest.fixture(scope="module")
def _imgs():
    rng = np.random.default_rng(0)
    img = (rng.uniform(0, 255, (64, 64, 3))).astype(np.uint8)
    mask = ((np.arange(64)[:, None] * np.ones(64)[None]) > 32
            ).astype(np.uint8) * 255
    ctrl = (rng.uniform(0, 255, (64, 64, 3))).astype(np.uint8)
    return img, mask, ctrl


_KW = dict(width=64, height=64, sample_steps=2, sample_method="euler",
           seed=3, cfg_scale=1.0, guidance=3.5)


def test_flux_fill_pipeline(_imgs):
    """Fill concat = [masked latent, sf²-pixel-shuffled mask] (reference
    stable-diffusion.cpp:4951-4959); mask placement changes the output."""
    img, mask, _ = _imgs
    pipe = create_pipeline(SDVersion.FLUX_FILL, small=True, seed=0)
    r1 = pipe.generate(GenerationParams(prompt="a cat", **_KW),
                       init_image=img, mask_image=mask).latents
    r2 = pipe.generate(GenerationParams(prompt="a cat", **_KW),
                       init_image=img, mask_image=255 - mask).latents
    assert r1.shape == (1, 8, 8, 4)
    assert np.abs(r1 - r2).max() > 1e-6


def test_flux_controls_pipeline(_imgs):
    """Canny/Depth dev: VAE-encoded control image rides the concat channels
    (reference stable-diffusion.cpp:4979-4986); absent control → zeros."""
    _, _, ctrl = _imgs
    pipe = create_pipeline(SDVersion.FLUX_CONTROLS, small=True, seed=0)
    r1 = pipe.generate(GenerationParams(prompt="a cat", **_KW),
                       control_image=ctrl).latents
    r2 = pipe.generate(GenerationParams(prompt="a cat", **_KW)).latents
    assert r1.shape == (1, 8, 8, 4)
    assert np.abs(r1 - r2).max() > 1e-6


def test_flex2_pipeline(_imgs):
    """Flex.2 concat = [latent-masked init, mask, control] (reference
    stable-diffusion.cpp:4946-4970)."""
    img, mask, ctrl = _imgs
    pipe = create_pipeline(SDVersion.FLEX_2, small=True, seed=0)
    r = pipe.generate(GenerationParams(prompt="a cat", **_KW),
                      init_image=img, mask_image=mask, control_image=ctrl)
    assert r.latents.shape == (1, 8, 8, 4)
    # no inputs at all still runs (zeros concat)
    r0 = pipe.generate(GenerationParams(prompt="a cat", **_KW))
    assert np.abs(r.latents - r0.latents).max() > 1e-6

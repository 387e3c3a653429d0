"""ESRGAN, canny, hires-fix tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdtpu.config import GenerationParams, SDVersion
from sdtpu.diffusion.preprocessing import canny
from sdtpu.factory import create_pipeline
from sdtpu.models.esrgan import (
    ESRGANConfig,
    convert_esrgan_name,
    esrgan_forward,
    init_esrgan_params,
    upscale_image,
)

SMALL_ESRGAN = ESRGANConfig(num_feat=16, num_block=2, num_grow=8)


def test_esrgan_forward_shape():
    p = init_esrgan_params(SMALL_ESRGAN)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))
    out = jax.jit(lambda p, x: esrgan_forward(p, x, SMALL_ESRGAN))(p, x)
    assert out.shape == (1, 64, 64, 3)


def test_esrgan_tiled_upscale():
    p = init_esrgan_params(SMALL_ESRGAN)
    img = (np.random.default_rng(1).uniform(0, 255, (40, 56, 3))).astype(np.uint8)
    out = upscale_image(p, img, SMALL_ESRGAN, tile=32, overlap=8)
    assert out.shape == (160, 224, 3)
    assert out.dtype == np.uint8


def test_esrgan_name_conversion():
    assert convert_esrgan_name("model.0.weight") == "conv_first.weight"
    assert convert_esrgan_name("model.1.sub.5.RDB2.conv3.0.weight") == "body.5.rdb2.conv3.weight"
    assert convert_esrgan_name("model.10.bias") == "conv_last.bias"
    assert convert_esrgan_name("conv_hr.weight") == "conv_hr.weight"


def test_canny():
    img = np.zeros((32, 32, 3), dtype=np.uint8)
    img[:, 16:] = 255  # vertical edge
    edges = canny(img)
    assert edges.shape == (32, 32, 3)
    col = edges[16, :, 0]
    assert col.max() == 255  # edge detected
    assert edges[16, 2, 0] == 0  # flat region has no edge


def test_hires_fix_latent():
    pipe = create_pipeline(SDVersion.SD1, small=True)
    gp = GenerationParams(
        prompt="a cat", width=64, height=64, sample_steps=3, cfg_scale=5.0, seed=1,
        sample_method="euler", schedule="discrete",
    )
    res = pipe.txt2img_hires(gp, hires_scale=2.0, hires_steps=3, hires_strength=0.6)
    assert res.images.shape == (1, 128, 128, 3)
    assert np.isfinite(res.latents).all()

"""Separate image-CFG (reference guidance.cpp:164-168): pix2pix concat mode
and ref-latent mode (third forward without reference latents)."""
import numpy as np
import pytest

from sdtpu.config import GenerationParams, SDVersion
from sdtpu.factory import create_pipeline


def _gp(**kw):
    base = dict(prompt="edit the cat", width=32, height=32, sample_steps=2,
                sample_method="euler", cfg_scale=4.0, seed=3)
    base.update(kw)
    return GenerationParams(**base)


def test_pix2pix_concat_img_cfg():
    pipe = create_pipeline(SDVersion.SD1_PIX2PIX, small=True, seed=0)
    edit = np.random.default_rng(0).random((32, 32, 3), dtype=np.float32)
    base = pipe.generate(_gp(), init_image=edit)
    out = pipe.generate(_gp(img_cfg_scale=1.5), init_image=edit)
    assert out.images.shape == base.images.shape
    assert np.abs(out.latents - base.latents).max() > 1e-6
    # img_cfg == cfg → collapses to plain CFG (no third forward)
    same = pipe.generate(_gp(img_cfg_scale=4.0), init_image=edit)
    np.testing.assert_allclose(same.latents, base.latents, atol=1e-5)


def test_pix2pix_edit_image_changes_output():
    pipe = create_pipeline(SDVersion.SD1_PIX2PIX, small=True, seed=0)
    g = np.random.default_rng(1)
    a = pipe.generate(_gp(), init_image=g.random((32, 32, 3), dtype=np.float32))
    b = pipe.generate(_gp(), init_image=g.random((32, 32, 3), dtype=np.float32))
    assert np.abs(a.latents - b.latents).max() > 1e-6


def test_ref_latent_img_cfg():
    pipe = create_pipeline(SDVersion.FLUX, small=True, seed=0)
    ref = np.random.default_rng(2).random((32, 32, 3), dtype=np.float32)
    base = pipe.generate(_gp(), ref_images=[ref])
    out = pipe.generate(_gp(img_cfg_scale=1.5), ref_images=[ref])
    assert np.abs(out.latents - base.latents).max() > 1e-6


def test_img_cfg_ignored_without_image_conditioning():
    pipe = create_pipeline(SDVersion.SD1, small=True, seed=0)
    base = pipe.generate(_gp())
    out = pipe.generate(_gp(img_cfg_scale=1.5))
    np.testing.assert_allclose(out.latents, base.latents, atol=1e-6)

"""img2img / inpaint pipeline tests on tiny models."""
import numpy as np
import pytest

from sdtpu.config import GenerationParams, SDVersion
from sdtpu.factory import create_pipeline


@pytest.fixture(scope="module")
def pipe():
    return create_pipeline(SDVersion.SD1, small=True)


def _gp(**kw):
    base = dict(
        prompt="a red apple",
        width=64,
        height=64,
        sample_steps=8,
        cfg_scale=7.0,
        seed=7,
        sample_method="euler_a",
        schedule="discrete",
        strength=0.5,
    )
    base.update(kw)
    return GenerationParams(**base)


@pytest.fixture(scope="module")
def init_image():
    rng = np.random.default_rng(0)
    return (rng.uniform(0, 255, size=(64, 64, 3))).astype(np.uint8)


def test_img2img_shapes(pipe, init_image):
    res = pipe.img2img(_gp(), init_image)
    assert res.images.shape == (1, 64, 64, 3)
    assert np.isfinite(res.latents).all()


def test_img2img_strength_truncates_schedule(pipe, init_image):
    # strength 0.5 with 8 steps → 4 denoise steps; result differs from full txt2img
    low = pipe.img2img(_gp(strength=0.25), init_image)
    high = pipe.img2img(_gp(strength=0.95), init_image)
    assert not np.array_equal(low.latents, high.latents)
    # lower strength stays closer to the init latent
    init_lat = pipe.encode_image(init_image)
    d_low = np.abs(low.latents - init_lat).mean()
    d_high = np.abs(high.latents - init_lat).mean()
    assert d_low < d_high


def test_img2img_masked(pipe, init_image):
    mask = np.zeros((64, 64), dtype=np.float32)
    mask[:32] = 1.0  # regenerate top half only
    res = pipe.img2img(_gp(), init_image, mask_image=mask)
    assert np.isfinite(res.latents).all()
    init_lat = pipe.encode_image(init_image)
    # unmasked (bottom) latent region stays exactly the init latent
    np.testing.assert_allclose(res.latents[0, 4:], init_lat[0, 4:], atol=1e-5)


def test_inpaint_model_concat():
    pipe = create_pipeline(SDVersion.SD1_INPAINT, small=True)
    rng = np.random.default_rng(1)
    img = (rng.uniform(0, 255, size=(64, 64, 3))).astype(np.uint8)
    mask = np.ones((64, 64), dtype=np.float32)
    res = pipe.img2img(_gp(strength=1.0), img, mask_image=mask)
    assert res.images.shape == (1, 64, 64, 3)
    assert np.isfinite(res.latents).all()

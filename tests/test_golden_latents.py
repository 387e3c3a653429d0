"""Golden-latent regression fixtures.

The reference verifies by golden images (SURVEY.md §4) against pinned CLI
commands; its binary cannot be built here, so these goldens pin OUR
small-pipeline latents at a known-good commit instead: any unintended
numeric drift (a sampler refactor, an op change, a param-init change) fails
loudly.  Regenerate deliberately with:

    SDTPU_REGEN_GOLDEN=1 python -m pytest tests/test_golden_latents.py

Intentional numeric changes must regenerate and explain in the commit.
"""
import os

import numpy as np
import pytest

from sdtpu.config import GenerationParams, SDVersion
from sdtpu.factory import create_pipeline

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

CASES = {
    "sd1_euler_a": (SDVersion.SD1, dict(sample_method="euler_a", eta=1.0)),
    "sd1_dpmpp2m": (SDVersion.SD1, dict(sample_method="dpm++2m")),
    "sdxl_euler": (SDVersion.SDXL, dict(sample_method="euler")),
    "sd3_euler": (SDVersion.SD3, dict(sample_method="euler")),
    "flux_euler": (SDVersion.FLUX, dict(sample_method="euler")),
    "qwen_euler": (SDVersion.QWEN_IMAGE, dict(sample_method="euler")),
    "sd2_heun": (SDVersion.SD2, dict(sample_method="heun")),
    "sd1_dpmpp2sa": (SDVersion.SD1,
                     dict(sample_method="dpm++2s_a", eta=1.0)),
    "sd1_ipndm": (SDVersion.SD1, dict(sample_method="ipndm")),
    "chroma_euler": (SDVersion.CHROMA, dict(sample_method="euler")),
    "z_image_euler": (SDVersion.Z_IMAGE, dict(sample_method="euler")),
    "ernie_euler": (SDVersion.ERNIE_IMAGE, dict(sample_method="euler")),
    "krea2_euler": (SDVersion.KREA2, dict(sample_method="euler")),
    "ideogram4_euler": (SDVersion.IDEOGRAM4, dict(sample_method="euler")),
    "boogu_euler": (SDVersion.BOOGU_IMAGE, dict(sample_method="euler")),
    "lens_euler": (SDVersion.LENS, dict(sample_method="euler")),
}


def _generate(version, overrides):
    pipe = create_pipeline(version, small=True, seed=0)
    gp = GenerationParams(
        prompt="a golden retriever", negative_prompt="blurry",
        width=64, height=64, sample_steps=3, cfg_scale=4.0, seed=11,
        **overrides,
    )
    return pipe.generate(gp).latents.astype(np.float32)


VIDEO_CASES = {
    "wan2_euler": (SDVersion.WAN2, 5),
    "hunyuan_euler": (SDVersion.HUNYUAN_VIDEO, 5),
}


@pytest.mark.parametrize("name", sorted(VIDEO_CASES))
def test_golden_video_latents(name):
    version, frames = VIDEO_CASES[name]
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    pipe = create_pipeline(version, small=True, seed=0)
    gp = GenerationParams(
        prompt="a golden retriever", width=64, height=64, sample_steps=2,
        cfg_scale=4.0, seed=11, sample_method="euler",
    )
    latents = np.asarray(
        pipe.generate_video(gp, frames=frames).latents, dtype=np.float32)
    if os.environ.get("SDTPU_REGEN_GOLDEN"):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez_compressed(path, latents=latents)
        pytest.skip(f"regenerated {path}")
    if not os.path.exists(path):
        pytest.skip(f"golden fixture {path} not generated yet")
    want = np.load(path)["latents"]
    np.testing.assert_allclose(latents, want, rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("name", sorted(CASES))
def test_golden_latents(name):
    version, overrides = CASES[name]
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    latents = _generate(version, overrides)
    if os.environ.get("SDTPU_REGEN_GOLDEN"):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez_compressed(path, latents=latents)
        pytest.skip(f"regenerated {path}")
    if not os.path.exists(path):
        pytest.skip(f"golden fixture {path} not generated yet")
    want = np.load(path)["latents"]
    np.testing.assert_allclose(latents, want, rtol=5e-4, atol=5e-4)

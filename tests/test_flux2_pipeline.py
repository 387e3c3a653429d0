"""FLUX.2 / FLUX.2-klein pipeline tests."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from sdtpu.models.flux import (
    FLUX2_DEV_CONFIG,
    FluxConfig,
    detect_flux2_config,
    flux_forward,
    init_flux_params,
)

TINY2 = dataclasses.replace(
    FLUX2_DEV_CONFIG, in_channels=16, hidden_size=64, num_heads=2, depth=2,
    depth_single=3, axes_dim=(8, 8, 8, 8), context_in_dim=48)


@pytest.fixture(scope="module")
def tiny_params():
    return init_flux_params(TINY2, seed=0)


def test_patch1_forward(tiny_params):
    """FLUX.2 runs patch_size 1 over pre-packed 128ch latents — spatial size
    is preserved without the FLUX.1 2x2 internal patchify."""
    g = np.random.default_rng(1)
    x = jnp.asarray(g.standard_normal((1, 5, 3, 16), dtype=np.float32))
    ctx = jnp.asarray(g.standard_normal((1, 7, 48), dtype=np.float32) * 0.1)
    out = flux_forward(tiny_params, x, jnp.asarray([0.5]), ctx, None,
                       guidance=jnp.asarray([4.0]), cfg=TINY2)
    assert out.shape == (1, 5, 3, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_detect_config(tiny_params):
    shapes = {k: tuple(v.shape) for k, v in tiny_params.items()}
    cfg = detect_flux2_config(set(tiny_params.keys()), shapes)
    assert cfg.hidden_size == 64 and cfg.in_channels == 16
    assert cfg.depth == 2 and cfg.depth_single == 3
    assert cfg.num_heads == 2
    assert cfg.context_in_dim == 48
    assert cfg.guidance_embed
    assert cfg.patch_size == 1 and cfg.share_modulation


def test_conditioner_zero_pad():
    from sdtpu.models import llm as llm_mod
    from sdtpu.conditioning.conditioner import Flux2Conditioner

    cfg = dataclasses.replace(
        llm_mod.MISTRAL_SMALL_32_CONFIG, num_layers=3, hidden_size=16,
        intermediate_size=32, num_heads=2, num_kv_heads=1, head_dim=8,
        vocab_size=64)
    p = llm_mod.init_llm_params(cfg, seed=0)
    cond = Flux2Conditioner(None, p, cfg, out_layers=(1, 2, 3), min_len=20)
    res = cond.get_learned_condition("x")
    # 12 dummy tokens zero-padded to 20; 3 layers × 16 features
    assert res.c_crossattn.shape == (1, 20, 48)
    assert np.abs(np.asarray(res.c_crossattn[:, 12:])).max() == 0.0
    assert np.abs(np.asarray(res.c_crossattn[:, :12])).max() > 0.0


def test_flux2_schedule_resolution():
    """gp.schedule left at the 'discrete' default resolves to the flux2
    empirical-mu scheduler for FLUX.2 pipelines."""
    from sdtpu.config import SDVersion
    from sdtpu.factory import create_pipeline
    from sdtpu.diffusion.schedule import get_sigmas

    pipe = create_pipeline(SDVersion.FLUX2, small=True, seed=0)
    assert pipe.default_schedule == "flux2"
    assert pipe._resolve_schedule("discrete") == "flux2"
    assert pipe._resolve_schedule("karras") == "karras"
    sig = get_sigmas(pipe.denoiser, 4, scheduler="flux2", image_seq_len=256)
    assert len(sig) == 5 and sig[0] == 1.0 and sig[-1] == 0.0
    assert all(a > b for a, b in zip(sig, sig[1:]))


def test_pipeline_e2e():
    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.factory import create_pipeline

    pipe = create_pipeline(SDVersion.FLUX2_KLEIN, small=True, seed=0)
    assert not pipe.uses_distilled_guidance
    res = pipe.generate(GenerationParams(
        prompt="a corgi", width=32, height=32, sample_steps=2,
        sample_method="euler", cfg_scale=1.0))
    assert res.images.shape == (1, 32, 32, 3)

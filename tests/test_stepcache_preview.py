"""Step cache (EasyCache/UCache) and latent preview tests."""
import numpy as np
import pytest

import jax.numpy as jnp

from sdtpu.diffusion.denoiser import CompVisDenoiser
from sdtpu.diffusion.preview import latent_family_for_version, preview_latent_proj
from sdtpu.diffusion.samplers import sample, sample_stepwise
from sdtpu.diffusion.schedule import get_sigmas
from sdtpu.diffusion.stepcache import EasyCacheConfig, make_step_cache


def _toy_model():
    calls = []

    def model(x, sigma, i):
        calls.append(1)
        den = jnp.tanh(x * 0.9 / (1 + sigma))
        return den, den

    return model, calls


def test_stepwise_matches_scan():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)).astype(np.float32))
    d = CompVisDenoiser()
    sigmas = get_sigmas(d, 6, scheduler="karras")
    noises = jnp.asarray(rng.standard_normal((6, 1, 8, 8, 4)).astype(np.float32))
    m1, _ = _toy_model()
    m2, _ = _toy_model()
    a = np.asarray(sample(m1, x, sigmas, method="euler_a", noises=noises, eta=1.0))
    b = np.asarray(sample_stepwise(m2, x, sigmas, method="euler_a", noises=noises, eta=1.0))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_stepwise_callback_and_cancel():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 4)).astype(np.float32))
    d = CompVisDenoiser()
    sigmas = get_sigmas(d, 8, scheduler="discrete")
    model, calls = _toy_model()
    seen = []

    def cb(i, xi):
        seen.append(i)
        return i < 3  # cancel after step 3

    sample_stepwise(model, x, sigmas, method="euler", step_callback=cb)
    assert seen == [0, 1, 2, 3]
    assert len(calls) == 4  # cancelled early


def test_easycache_skips_steps():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)).astype(np.float32))
    d = CompVisDenoiser()
    sigmas = get_sigmas(d, 16, scheduler="discrete")
    model, calls = _toy_model()
    cached = make_step_cache(
        "easycache", model, d, 16, reuse_threshold=0.9, start_percent=0.0, end_percent=1.0
    )
    out = sample_stepwise(cached, x, sigmas, method="euler")
    assert np.isfinite(np.asarray(out)).all()
    assert cached.steps_skipped > 0
    assert len(calls) == 16 - cached.steps_skipped


def test_ucache_runs():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)).astype(np.float32))
    d = CompVisDenoiser()
    sigmas = get_sigmas(d, 12, scheduler="discrete")
    model, calls = _toy_model()
    cached = make_step_cache("ucache", model, d, 12, threshold=0.5)
    out = sample_stepwise(cached, x, sigmas, method="euler")
    assert np.isfinite(np.asarray(out)).all()
    assert cached.steps_skipped > 0


def test_preview_proj_families():
    rng = np.random.default_rng(4)
    for family, ch in [("sd", 4), ("sdxl", 4), ("sd3", 16), ("flux", 16), ("wan21", 16)]:
        lat = rng.standard_normal((1, 8, 8, ch)).astype(np.float32)
        img = preview_latent_proj(lat, family)
        assert img.shape == (1, 8, 8, 3)
        assert img.dtype == np.uint8


def test_latent_family_mapping():
    from sdtpu.config import SDVersion

    assert latent_family_for_version(SDVersion.SD1) == "sd"
    assert latent_family_for_version(SDVersion.SDXL) == "sdxl"
    assert latent_family_for_version(SDVersion.SD3) == "sd3"
    assert latent_family_for_version(SDVersion.FLUX) == "flux"
    assert latent_family_for_version(SDVersion.WAN2) == "wan21"


def test_taylorseer_skips_and_approximates():
    from sdtpu.diffusion.stepcache import make_step_cache

    calls = []

    def model(x, sigma, i):
        calls.append(int(i))
        out = np.asarray(x) * 0.9
        return out, out

    cached = make_step_cache("taylorseer", model, None, 10, n_derivatives=1,
                             max_warmup_steps=2, skip_interval_steps=1)
    x = np.ones((1, 4, 4, 4), np.float32)
    sigmas = np.linspace(1.0, 0.1, 11).astype(np.float32)
    out = sample_stepwise(cached, jnp.asarray(x), sigmas, method="euler")
    assert cached.steps_skipped > 0
    assert calls != list(range(10))  # some steps skipped
    assert np.isfinite(np.asarray(out)).all()


def test_spectrum_warmup_then_skips():
    from sdtpu.diffusion.stepcache import make_step_cache

    calls = []

    def model(x, sigma, i):
        calls.append(int(i))
        out = np.asarray(x) * 0.95
        return out, out

    cached = make_step_cache("spectrum", model, None, 20, warmup_steps=4,
                             window_size=2)
    x = np.ones((1, 4, 4, 4), np.float32)
    sigmas = np.linspace(1.0, 0.05, 21).astype(np.float32)
    out = sample_stepwise(cached, jnp.asarray(x), sigmas, method="euler")
    # warmup steps always computed
    assert calls[:4] == [0, 1, 2, 3]
    assert cached.steps_skipped > 0
    assert np.isfinite(np.asarray(out)).all()


def test_pipeline_step_cache_integration():
    """step_cache through pipeline.generate (reference --cache-option wiring,
    stable-diffusion.cpp:2484)."""
    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.factory import create_pipeline

    pipe = create_pipeline(SDVersion.SD1, small=True, seed=0)
    gp = GenerationParams(prompt="x", width=64, height=64, sample_steps=8,
                          cfg_scale=3.0, sample_method="euler", seed=7)
    full = pipe.generate(gp)
    cached = pipe.generate(gp, step_cache="taylorseer",
                           cache_options={"max_warmup_steps": 2})
    assert cached.images.shape == full.images.shape
    assert np.isfinite(cached.latents).all()
    # identical toy model outputs → the approximation stays close
    rel = np.abs(cached.latents - full.latents).mean() / (np.abs(full.latents).mean() + 1e-6)
    assert rel < 1.0  # sanity: same scale, no blow-up

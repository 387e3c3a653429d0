"""Chroma-Radiance pixel-space NeRF-head tests."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from sdtpu.models.flux import (
    CHROMA_RADIANCE_CONFIG,
    flux_forward,
    init_flux_params,
    radiance_dct_basis,
)

TINY = dataclasses.replace(
    CHROMA_RADIANCE_CONFIG, hidden_size=64, num_heads=2, depth=2,
    depth_single=2, axes_dim=(8, 12, 12), context_in_dim=24, patch_size=4,
    nerf_hidden=16, nerf_depth=2, nerf_max_freqs=4)


@pytest.fixture(scope="module")
def tiny_params():
    return init_flux_params(TINY, seed=0)


def test_dct_basis():
    """cos(px·fx·π)·cos(py·fy·π)/(1+fx·fy) on a row-major [0,1] grid
    (reference fetch_dct_pos, flux.hpp:1444-1492)."""
    d = radiance_dct_basis(4, 3)
    assert d.shape == (16, 9)
    # f=0 row: constant 1 everywhere
    np.testing.assert_allclose(d[:, 0], 1.0, atol=1e-6)
    # spot check position p=(y=1,x=2) of a 4-grid, fx=2, fy=1
    px, py = 2 / 3.0, 1 / 3.0
    want = np.cos(px * 2 * np.pi) * np.cos(py * 1 * np.pi) / (1 + 2 * 1)
    assert abs(d[1 * 4 + 2, 2 * 3 + 1] - want) < 1e-6


def test_pixel_space_forward_and_padding(tiny_params):
    g = np.random.default_rng(1)
    # odd sizes exercise the pad-to-patch-grid path
    x = jnp.asarray(g.standard_normal((1, 18, 14, 3), dtype=np.float32))
    ctx = jnp.asarray(g.standard_normal((1, 7, 24), dtype=np.float32) * 0.1)
    mask = jnp.zeros((1, 7))
    out = flux_forward(tiny_params, x, jnp.asarray([0.5]), ctx, mask, cfg=TINY)
    assert out.shape == (1, 18, 14, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_x0_residual(tiny_params):
    """__x0__ checkpoints convert the x0 prediction to velocity:
    v = (noisy - x0) / t (reference _apply_x0_residual, flux.hpp:1181)."""
    g = np.random.default_rng(2)
    x = jnp.asarray(g.standard_normal((1, 8, 8, 3), dtype=np.float32))
    ctx = jnp.asarray(g.standard_normal((1, 5, 24), dtype=np.float32) * 0.1)
    mask = jnp.zeros((1, 5))
    cfg_x0 = dataclasses.replace(TINY, radiance_x0=True)
    raw = flux_forward(tiny_params, x, jnp.asarray([0.5]), ctx, mask, cfg=TINY)
    v = flux_forward(tiny_params, x, jnp.asarray([0.5]), ctx, mask, cfg=cfg_x0)
    np.testing.assert_allclose(np.asarray(v), (np.asarray(x) - np.asarray(raw)) / 0.5,
                               rtol=1e-4, atol=1e-5)


def test_nerf_conditioning_matters(tiny_params):
    """The NeRF GLU weights are generated per-token from the DiT output:
    a different prompt context must change the decoded pixels."""
    g = np.random.default_rng(3)
    x = jnp.asarray(g.standard_normal((1, 8, 8, 3), dtype=np.float32))
    c1 = jnp.asarray(g.standard_normal((1, 5, 24), dtype=np.float32) * 0.1)
    c2 = jnp.asarray(g.standard_normal((1, 5, 24), dtype=np.float32) * 0.1)
    mask = jnp.zeros((1, 5))
    o1 = flux_forward(tiny_params, x, jnp.asarray([0.5]), c1, mask, cfg=TINY)
    o2 = flux_forward(tiny_params, x, jnp.asarray([0.5]), c2, mask, cfg=TINY)
    assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 1e-6


def test_pipeline_e2e():
    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.factory import create_pipeline

    pipe = create_pipeline(SDVersion.CHROMA_RADIANCE, small=True, seed=0)
    assert pipe.scale_factor == 1 and pipe.latent_channels == 3
    res = pipe.generate(GenerationParams(
        prompt="a corgi", width=32, height=32, sample_steps=2,
        sample_method="euler", cfg_scale=1.0))
    assert res.images.shape == (1, 32, 32, 3)


def test_detect_radiance(tiny_params):
    from sdtpu.config import SDVersion
    from sdtpu.io.detect import detect_version

    shapes = {k: tuple(v.shape) for k, v in tiny_params.items()}
    assert detect_version(tiny_params.keys(), shapes) == SDVersion.CHROMA_RADIANCE

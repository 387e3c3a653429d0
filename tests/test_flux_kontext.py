"""FLUX Kontext reference latents: token-stream append + ref-index rope."""
import dataclasses

import numpy as np
import jax.numpy as jnp

from sdtpu.models.flux import FluxConfig, init_flux_params, flux_forward

TINY = FluxConfig(in_channels=16, hidden_size=64, num_heads=2, depth=2,
                  depth_single=2, axes_dim=(8, 12, 12), context_in_dim=48,
                  vec_in_dim=24, guidance_embed=False)


def _io(seed=1):
    g = np.random.default_rng(seed)
    x = jnp.asarray(g.standard_normal((1, 8, 8, 4), dtype=np.float32))
    ctx = jnp.asarray(g.standard_normal((1, 6, 48), dtype=np.float32) * 0.1)
    y = jnp.asarray(g.standard_normal((1, 24), dtype=np.float32) * 0.1)
    ref = jnp.asarray(g.standard_normal((1, 6, 4, 4), dtype=np.float32))
    return x, ctx, y, ref


def test_ref_latents_change_output_keep_shape():
    p = init_flux_params(TINY, seed=0)
    x, ctx, y, ref = _io()
    t = jnp.asarray([0.5])
    base = flux_forward(p, x, t, ctx, y, cfg=TINY)
    out = flux_forward(p, x, t, ctx, y, cfg=TINY, ref_latents=[ref])
    assert out.shape == base.shape == (1, 8, 8, 4)
    assert np.abs(np.asarray(out) - np.asarray(base)).max() > 1e-5
    out2 = flux_forward(p, x, t, ctx, y, cfg=TINY, ref_latents=[ref, ref])
    assert out2.shape == (1, 8, 8, 4)
    assert np.abs(np.asarray(out2) - np.asarray(out)).max() > 1e-6


def test_ref_index_increase_mode_differs_from_fixed():
    """FLUX.2-style INCREASE rope indexing must change the result vs FIXED
    (reference rope.hpp:366-391)."""
    p = init_flux_params(TINY, seed=0)
    x, ctx, y, ref = _io()
    t = jnp.asarray([0.5])
    inc_cfg = dataclasses.replace(TINY, ref_index_increase=True,
                                  ref_index_scale=10.0)
    fixed = flux_forward(p, x, t, ctx, y, cfg=TINY, ref_latents=[ref, ref])
    inc = flux_forward(p, x, t, ctx, y, cfg=inc_cfg, ref_latents=[ref, ref])
    assert np.abs(np.asarray(inc) - np.asarray(fixed)).max() > 1e-6


def test_pipeline_ref_images_end_to_end():
    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.factory import create_pipeline

    pipe = create_pipeline(SDVersion.FLUX, small=True, seed=0)
    gp = GenerationParams(prompt="edit", width=32, height=32, sample_steps=2,
                          sample_method="euler", seed=7)
    base = pipe.generate(gp)
    ref = np.random.default_rng(5).random((32, 32, 3), dtype=np.float32)
    out = pipe.generate(gp, ref_images=[ref])
    assert out.images.shape == base.images.shape
    assert np.abs(out.latents - base.latents).max() > 1e-6

"""Hunyuan Video 1.5 DiT + 16×/4× causal VAE (reference
src/model/diffusion/hunyuan.hpp, src/model/vae/hunyuan_vae.hpp)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdtpu.models.hunyuan import (
    HunyuanVideoConfig,
    detect_hunyuan_config,
    init_hunyuan_params,
    hunyuan_forward,
)
from sdtpu.models.hunyuan_vae import (
    HunyuanVAEConfig,
    init_hunyuan_vae_params,
    hunyuan_vae_decode,
    hunyuan_vae_encode,
)

SMALL_DIT = HunyuanVideoConfig(
    in_channels=4, out_channels=4, hidden_size=64, context_in_dim=48,
    num_heads=2, depth=2, axes_dim=(8, 12, 12), refiner_depth=1,
)
SMALL_VAE = HunyuanVAEConfig(
    z_channels=4, block_out_channels=(8, 8, 16, 16, 16), layers_per_block=1,
)


def test_hunyuan_dit_shapes():
    p = init_hunyuan_params(SMALL_DIT, seed=0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 2, 8, 8, 4), dtype=np.float32))
    ctx = jnp.asarray(rng.standard_normal((1, 12, 48), dtype=np.float32))
    fn = jax.jit(lambda p, x, t, c: hunyuan_forward(p, x, t, c, cfg=SMALL_DIT))
    out = fn(p, x, jnp.asarray([0.6]), ctx)
    assert out.shape == (1, 2, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()
    # token refiner couples context: different context → different output
    out2 = fn(p, x, jnp.asarray([0.6]),
              jnp.asarray(rng.standard_normal((1, 12, 48), dtype=np.float32)))
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_hunyuan_config_detection():
    p = init_hunyuan_params(SMALL_DIT, seed=0)
    cfg = detect_hunyuan_config(p.keys(), {k: tuple(v.shape) for k, v in p.items()})
    assert cfg.depth == 2 and cfg.hidden_size == 64
    assert cfg.in_channels == 4 and cfg.context_in_dim == 48


def test_hunyuan_vae_shapes():
    """16× spatial, 4× temporal: Tl latent frames → 1+4(Tl-1)."""
    p = init_hunyuan_vae_params(SMALL_VAE, seed=0, decode_only=True)
    z = jnp.asarray(np.random.default_rng(0).standard_normal((1, 2, 2, 2, 4), dtype=np.float32))
    out = hunyuan_vae_decode(p, z, cfg=SMALL_VAE)
    assert out.shape == (1, 1 + 4 * 1, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_hunyuan_vae_encode_roundtrip_shapes():
    p = init_hunyuan_vae_params(SMALL_VAE, seed=0)
    x = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (1, 5, 32, 32, 3)).astype(np.float32))
    z = hunyuan_vae_encode(p, x, cfg=SMALL_VAE)
    assert z.shape == (1, 2, 2, 2, 4)
    y = hunyuan_vae_decode(p, z, cfg=SMALL_VAE)
    assert y.shape == x.shape


def test_hunyuan_vae_temporal_causality():
    p = init_hunyuan_vae_params(SMALL_VAE, seed=0, decode_only=True)
    rng = np.random.default_rng(0)
    z = rng.standard_normal((1, 3, 2, 2, 4)).astype(np.float32)
    base = np.asarray(hunyuan_vae_decode(p, jnp.asarray(z), cfg=SMALL_VAE))
    z2 = z.copy()
    z2[:, 2] += 1.0
    out = np.asarray(hunyuan_vae_decode(p, jnp.asarray(z2), cfg=SMALL_VAE))
    # frames before 1+4*(2-1)=5 unaffected
    np.testing.assert_allclose(base[:, :5], out[:, :5], atol=1e-4)
    assert not np.allclose(base[:, 5:], out[:, 5:], atol=1e-4)


def test_hunyuan_pipeline_end_to_end():
    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.factory import create_pipeline

    pipe = create_pipeline(SDVersion.HUNYUAN_VIDEO, small=True, seed=0)
    gp = GenerationParams(
        prompt="a river", width=32, height=32, sample_steps=2, cfg_scale=3.0,
        sample_method="euler", schedule="simple", seed=2,
    )
    res = pipe.generate_video(gp, frames=5)
    assert res.frames.shape == (1, 5, 32, 32, 3)
    assert res.latents.shape == (1, 2, 2, 2, 4)
    assert np.isfinite(res.latents).all()
    # image mode through the same pipeline
    img = pipe.generate(gp)
    assert img.images.shape == (1, 32, 32, 3)


def test_meanflow_variant():
    """time_r_in second-timestep stream (reference hunyuan.hpp:433-439,
    detection :253)."""
    import dataclasses

    from sdtpu.models.hunyuan import (
        detect_hunyuan_config, init_hunyuan_params, hunyuan_forward,
    )

    cfg = detect_hunyuan_config(
        ["double_blocks.0.img_mod.lin.weight", "time_r_in.in_layer.weight"], {})
    assert cfg.use_meanflow

    small = dataclasses.replace(
        SMALL, use_meanflow=True) if "SMALL" in globals() else None
    if small is None:
        from sdtpu.models.hunyuan import HunyuanVideoConfig

        small = HunyuanVideoConfig(
            in_channels=8, out_channels=4, hidden_size=64, context_in_dim=48,
            num_heads=2, depth=2, axes_dim=(8, 12, 12), refiner_depth=1,
            use_meanflow=True)
    p = init_hunyuan_params(small, seed=0)
    assert "time_r_in.in_layer.weight" in p
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 2, 8, 8, 8)), dtype=jnp.float32)
    t = jnp.asarray([700.0], dtype=jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 7, 48)), dtype=jnp.float32)
    tr = jnp.asarray([600.0], dtype=jnp.float32)
    with_r = hunyuan_forward(p, x, t, ctx, cfg=small, timestep_r=tr)
    without = hunyuan_forward(p, x, t, ctx, cfg=small)
    assert with_r.shape == (1, 2, 8, 8, 4)
    assert np.abs(np.asarray(with_r) - np.asarray(without)).max() > 1e-5

"""Lens DiT + FLUX.2 packed-VAE tests."""
import jax.numpy as jnp
import numpy as np
import pytest

from sdtpu.models.lens import (
    LensConfig,
    detect_lens_config,
    init_lens_params,
    lens_forward,
)

TINY = LensConfig(
    in_channels=16, out_channels=4, num_layers=2, head_dim=8, num_heads=4,
    joint_attention_dim=16, selected_layer_count=2, axes_dim=(4, 2, 2),
)


@pytest.fixture(scope="module")
def tiny_params():
    return init_lens_params(TINY, seed=0)


def test_forward_shapes(tiny_params):
    g = np.random.default_rng(1)
    x = jnp.asarray(g.standard_normal((1, 4, 4, 16), dtype=np.float32))
    ctx = jnp.asarray(g.standard_normal((1, 7, 32), dtype=np.float32) * 0.1)
    out = lens_forward(tiny_params, x, jnp.asarray([0.5]), ctx, cfg=TINY)
    assert out.shape == (1, 4, 4, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_detect_config(tiny_params):
    shapes = {k: tuple(v.shape) for k, v in tiny_params.items()}
    # joint_attention_dim is a fixed constant in detection (2880); scale the
    # tiny txt_in so count detection still works
    cfg = detect_lens_config(set(tiny_params.keys()), shapes)
    assert cfg.num_layers == 2
    assert cfg.head_dim == 8
    assert cfg.in_channels == 16
    assert cfg.num_heads == 4
    assert cfg.out_channels == 4


def test_flux2_pack_roundtrip():
    from sdtpu.models.vae import flux2_pack, flux2_unpack

    g = np.random.default_rng(0)
    z = jnp.asarray(g.standard_normal((1, 4, 6, 8), dtype=np.float32))
    packed = flux2_pack(z)
    assert packed.shape == (1, 2, 3, 32)
    np.testing.assert_array_equal(np.asarray(flux2_unpack(packed)), np.asarray(z))


def test_flux2_latent_stats_roundtrip():
    from sdtpu.models.vae import (FLUX2_LATENT_MEAN, FLUX2_LATENT_STD)

    assert FLUX2_LATENT_MEAN.shape == (128,)
    assert FLUX2_LATENT_STD.shape == (128,)
    assert (FLUX2_LATENT_STD > 1.5).all()


def test_pipeline_e2e():
    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.factory import create_pipeline

    pipe = create_pipeline(SDVersion.LENS, small=True, seed=0)
    res = pipe.generate(GenerationParams(
        prompt="a corgi", width=64, height=64, sample_steps=2,
        sample_method="euler", cfg_scale=1.0, schedule="discrete"))
    assert res.images.shape == (1, 64, 64, 3)
    assert res.latents.shape == (1, 4, 4, 16)

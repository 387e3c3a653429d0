"""Mage-Flow DiT variant + Mage VAE tests."""
import jax.numpy as jnp
import numpy as np
import pytest

from sdtpu.models.mage_vae import (
    dct_basis,
    init_mage_vae_params,
    mage_vae_decode,
    mage_vae_encode,
)


@pytest.fixture(scope="module")
def vae_params():
    return init_mage_vae_params(seed=0, n_blocks=2)


def test_mage_vae_encode_decode_shapes(vae_params):
    g = np.random.default_rng(0)
    img = jnp.asarray(g.standard_normal((1, 32, 32, 3), dtype=np.float32) * 0.1)
    z = mage_vae_encode(vae_params, img, n_blocks=2)
    assert z.shape == (1, 2, 2, 128)
    out = mage_vae_decode(vae_params, z, n_blocks=2)
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_dct_basis():
    d = dct_basis(16)
    assert d.shape == (256, 64)
    # frequency (0,0): cos(0)*cos(0)*1 = 1 everywhere
    np.testing.assert_allclose(d[:, 0], 1.0, atol=1e-6)
    assert np.abs(d).max() <= 1.0 + 1e-6


def test_mage_rope_and_bf16_timestep():
    import dataclasses

    from sdtpu.models.qwen_image import (QwenImageConfig,
                                         init_qwen_image_params,
                                         qwen_image_forward)

    cfg = QwenImageConfig(
        patch_size=1, in_channels=128, out_channels=128, num_layers=1,
        head_dim=16, num_heads=4, joint_attention_dim=48, axes_dim=(4, 6, 6),
        rope_scheme="mage", bf16_timestep=True)
    p = init_qwen_image_params(cfg, seed=0)
    g = np.random.default_rng(1)
    x = jnp.asarray(g.standard_normal((1, 4, 4, 128), dtype=np.float32))
    ctx = jnp.asarray(g.standard_normal((1, 7, 48), dtype=np.float32) * 0.1)
    out = qwen_image_forward(p, x, jnp.asarray([0.5]), ctx, cfg=cfg)
    assert out.shape == (1, 4, 4, 128)
    # bf16-rounded timestep projection differs from the f32 path
    cfg2 = dataclasses.replace(cfg, bf16_timestep=False)
    out2 = qwen_image_forward(p, x, jnp.asarray([0.5]), ctx, cfg=cfg2)
    assert np.abs(np.asarray(out) - np.asarray(out2)).max() > 0


def test_pipeline_e2e():
    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.factory import create_pipeline

    pipe = create_pipeline(SDVersion.MAGE_FLOW, small=True, seed=0)
    res = pipe.generate(GenerationParams(
        prompt="a corgi", width=64, height=64, sample_steps=2,
        sample_method="euler", cfg_scale=1.0, schedule="discrete"))
    assert res.images.shape == (1, 64, 64, 3)
    assert res.latents.shape == (1, 4, 4, 128)

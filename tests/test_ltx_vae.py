"""LTX video VAE tests: shapes, temporal causality of the encoder,
patchify round trip, latent statistics, config detection."""
import jax.numpy as jnp
import numpy as np
import pytest

from sdtpu.models.ltx_vae import (
    LTXVAEBlock,
    LTXVAEConfig,
    detect_ltx_vae_config,
    init_ltx_vae_params,
    ltx_patchify,
    ltx_unpatchify,
    ltx_vae_decode,
    ltx_vae_encode,
    ltx_vae_normalize,
    ltx_vae_un_normalize,
)

# tiny layout: one res stage + one compress_all each way, patch 2, 8 latent ch
TINY = LTXVAEConfig(
    patch_size=2,
    latent_channels=8,
    timestep_conditioning=True,
    encoder_blocks=(LTXVAEBlock("res_x", 1),
                    LTXVAEBlock("compress_all_res", 0, 2),
                    LTXVAEBlock("res_x", 1)),
    decoder_blocks=(LTXVAEBlock("res_x", 1),
                    LTXVAEBlock("compress_all", 0, 2),
                    LTXVAEBlock("res_x", 1)),
)


@pytest.fixture(scope="module")
def tiny_params():
    return init_ltx_vae_params(TINY, channels=16, seed=0)


def test_patchify_roundtrip():
    g = np.random.default_rng(0)
    x = jnp.asarray(g.standard_normal((1, 2, 8, 8, 3), dtype=np.float32))
    p = ltx_patchify(x, 4)
    assert p.shape == (1, 2, 2, 2, 48)
    np.testing.assert_array_equal(np.asarray(ltx_unpatchify(p, 4)), np.asarray(x))


def test_decode_shapes(tiny_params):
    # latent [B, Tl, Hl, Wl, 8]: spatial x2 (depth-to-space) x2 (patch) = x4
    # temporal causal: T = 2*(Tl-1)+1
    g = np.random.default_rng(1)
    z = jnp.asarray(g.standard_normal((1, 3, 4, 4, 8), dtype=np.float32))
    out = ltx_vae_decode(tiny_params, z, TINY)
    assert out.shape == (1, 5, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_encode_shapes(tiny_params):
    g = np.random.default_rng(2)
    # T=5 -> crop to 2k+1 temporal grid; encoder halves T (front-padded) so
    # 5 pixel frames -> 3 latent frames; spatial /4
    x = jnp.asarray(g.standard_normal((1, 5, 16, 16, 3), dtype=np.float32))
    z = ltx_vae_encode(tiny_params, x, TINY)
    assert z.shape == (1, 3, 4, 4, 8)
    assert np.isfinite(np.asarray(z)).all()


def test_encoder_causality(tiny_params):
    """The encoder is temporally causal: perturbing the last pixel frames
    must not change the first latent frame."""
    g = np.random.default_rng(3)
    x = np.asarray(g.standard_normal((1, 5, 16, 16, 3), dtype=np.float32))
    z1 = np.asarray(ltx_vae_encode(tiny_params, jnp.asarray(x), TINY))
    x2 = x.copy()
    x2[:, 3:] += 10.0
    z2 = np.asarray(ltx_vae_encode(tiny_params, jnp.asarray(x2), TINY))
    np.testing.assert_allclose(z1[:, 0], z2[:, 0], atol=1e-4)
    assert np.abs(z1[:, -1] - z2[:, -1]).max() > 1e-3


def test_latent_statistics_roundtrip(tiny_params):
    p = dict(tiny_params)
    p["per_channel_statistics.mean-of-means"] = jnp.asarray(
        np.linspace(-1, 1, 8, dtype=np.float32))
    p["per_channel_statistics.std-of-means"] = jnp.asarray(
        np.linspace(0.5, 2.0, 8, dtype=np.float32))
    z = jnp.asarray(np.random.default_rng(4).standard_normal(
        (1, 2, 2, 2, 8), dtype=np.float32))
    back = ltx_vae_normalize(p, ltx_vae_un_normalize(p, z))
    np.testing.assert_allclose(np.asarray(back), np.asarray(z), atol=1e-5)


def test_decode_timestep_conditioning_matters(tiny_params):
    import dataclasses

    z = jnp.asarray(np.random.default_rng(5).standard_normal(
        (1, 2, 4, 4, 8), dtype=np.float32))
    a = ltx_vae_decode(tiny_params, z, TINY)
    cfg2 = dataclasses.replace(TINY, decode_timestep=0.5)
    b = ltx_vae_decode(tiny_params, z, cfg2)
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-4


def test_detect_config():
    p = init_ltx_vae_params(TINY, channels=16, seed=0)
    shapes = {k: tuple(v.shape) for k, v in p.items()}
    cfg = detect_ltx_vae_config(set(p.keys()), shapes)
    assert cfg.timestep_conditioning
    assert [b.type for b in cfg.decoder_blocks] == [
        "res_x", "compress_all", "res_x"]
    assert cfg.decoder_blocks[1].multiplier == 2
    assert [b.type for b in cfg.encoder_blocks] == [
        "res_x", "compress_all_res", "res_x"]
    assert cfg.encoder_blocks[1].multiplier == 2

"""TAEHV tiny video autoencoder + latent preview projection tests."""
import jax
import jax.numpy as jnp
import numpy as np

from sdtpu.models.taehv import (
    TAEHV_LTXAV_CONFIG,
    TAEHV_WAN_CONFIG,
    TAEHVConfig,
    detect_taehv_config,
    init_taehv_params,
    taehv_decode,
    taehv_encode,
)


def test_decode_shapes_and_warmup_crop():
    """T latent frames → T*t_up - (t_up-1) output frames at 8x spatial
    (reference TinyVideoDecoder::forward, tae.hpp:470-513)."""
    p = init_taehv_params(TAEHV_WAN_CONFIG, seed=0, hidden=8)
    z = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, 2, 4, 4, 16), dtype=np.float32))
    out = jax.jit(lambda zz: taehv_decode(p, zz, TAEHV_WAN_CONFIG))(z)
    assert out.shape == (1, 2 * 4 - 3, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_encode_pads_and_downscales():
    p = init_taehv_params(TAEHV_WAN_CONFIG, seed=0, hidden=8)
    x = jnp.asarray(np.random.default_rng(2).standard_normal(
        (1, 5, 32, 32, 3), dtype=np.float32))
    z = jax.jit(lambda xx: taehv_encode(p, xx, TAEHV_WAN_CONFIG))(x)
    # 5 frames pad to 8, /4 temporal, /8 spatial
    assert z.shape == (1, 2, 4, 4, 16)


def test_mem_block_causality():
    """MemBlocks condition on the PREVIOUS frame only: changing the last
    input frame must not affect the first output latent frame group."""
    p = init_taehv_params(TAEHV_WAN_CONFIG, seed=0, hidden=8)
    g = np.random.default_rng(3)
    x = g.standard_normal((1, 8, 16, 16, 3)).astype(np.float32)
    enc = jax.jit(lambda xx: taehv_encode(p, xx, TAEHV_WAN_CONFIG))
    z1 = np.asarray(enc(jnp.asarray(x)))
    x2 = x.copy()
    x2[0, -1] += 1.0
    z2 = np.asarray(enc(jnp.asarray(x2)))
    np.testing.assert_allclose(z1[0, 0], z2[0, 0], atol=1e-6)
    assert np.abs(z1[0, -1] - z2[0, -1]).max() > 1e-6


def test_detect_config():
    p = init_taehv_params(TAEHV_LTXAV_CONFIG, seed=0, hidden=8)
    shapes = {k: tuple(v.shape) for k, v in p.items()}
    cfg = detect_taehv_config(set(p.keys()), shapes)
    assert cfg.z_channels == 128 and cfg.patch_size == 4
    wide = init_taehv_params(TAEHVConfig(is_wide=True), seed=0, hidden=8)
    shapes = {k: tuple(v.shape) for k, v in wide.items()}
    assert detect_taehv_config(set(wide.keys()), shapes).is_wide


def test_preview_projections():
    from sdtpu.utils.latent_preview import (
        FLUX_PROJ,
        LTXAV_PROJ,
        WAN_22_PROJ,
        preview_latent,
    )

    assert FLUX_PROJ.shape == (16, 3)
    assert LTXAV_PROJ.shape == (128, 3)
    assert WAN_22_PROJ.shape == (48, 3)
    g = np.random.default_rng(0)
    for c, ver, out_hw in ((4, "sd1", (8, 8)), (16, "flux", (8, 8)),
                           (48, "wan2_2_ti2v", (8, 8)),
                           (128, "ltxav", (8, 8)), (128, "flux2", (16, 16)),
                           (144, "sefi", (16, 16))):
        z = g.standard_normal((1, 8, 8, c)).astype(np.float32)
        img = preview_latent(z, ver)
        assert img.shape == (1,) + out_hw + (3,), (c, ver, img.shape)
        assert img.dtype == np.uint8

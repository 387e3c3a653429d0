"""LTX-2 audio-video DiT tests: shapes, per-token timesteps, gating,
connector padding, packed-AV-latent round trip, config detection."""
import jax.numpy as jnp
import numpy as np
import pytest

from sdtpu.models.ltxv import (
    LTXAVConfig,
    detect_ltxav_config,
    get_num_audio_latents,
    init_ltxav_params,
    ltxav_forward,
    pack_av_latents,
    unpack_audio_latent,
    video_rope,
)

TINY = LTXAVConfig(
    in_channels=8, out_channels=8, hidden_size=48, cross_attention_dim=24,
    caption_channels=16, num_heads=4, head_dim=12, num_layers=2,
    audio_in_channels=6, audio_out_channels=6, audio_hidden_size=32,
    audio_cross_attention_dim=32, audio_num_heads=4, audio_head_dim=8,
    num_audio_channels=2, audio_frequency_bins=3,
)


@pytest.fixture(scope="module")
def tiny_params():
    return init_ltxav_params(TINY, seed=0)


def _video(b=1, t=3, h=4, w=4, c=8, seed=1):
    g = np.random.default_rng(seed)
    return jnp.asarray(g.standard_normal((b, t, h, w, c), dtype=np.float32))


def test_forward_shapes_av(tiny_params):
    x = _video()
    audio = jnp.asarray(np.random.default_rng(2).standard_normal(
        (1, 5, 2, 3), dtype=np.float32))
    ctx = jnp.asarray(np.random.default_rng(3).standard_normal(
        (1, 7, TINY.cross_attention_dim + TINY.audio_cross_attention_dim),
        dtype=np.float32) * 0.1)
    ts = jnp.asarray([0.7], dtype=jnp.float32)
    vout, aout = ltxav_forward(tiny_params, x, ts, ctx, audio_x=audio,
                               audio_timesteps=ts, cfg=TINY)
    assert vout.shape == (1, 3, 4, 4, 8)
    assert aout.shape == (1, 5, 2, 3)
    assert np.isfinite(np.asarray(vout)).all()
    assert np.isfinite(np.asarray(aout)).all()


def test_forward_no_audio(tiny_params):
    x = _video()
    ctx = jnp.asarray(np.random.default_rng(3).standard_normal(
        (1, 7, TINY.cross_attention_dim), dtype=np.float32) * 0.1)
    vout, aout = ltxav_forward(tiny_params, x, jnp.asarray([0.5]), ctx, cfg=TINY)
    assert vout.shape == (1, 3, 4, 4, 8)
    assert aout is None


def test_per_token_timesteps_match_scalar(tiny_params):
    """A per-token timestep vector that is constant must equal the scalar
    path (reference process_ltxav_video_timesteps with an all-ones mask)."""
    x = _video()
    ctx = jnp.asarray(np.random.default_rng(3).standard_normal(
        (1, 7, TINY.cross_attention_dim), dtype=np.float32) * 0.1)
    lv = 3 * 4 * 4
    scalar, _ = ltxav_forward(tiny_params, x, jnp.asarray([0.4]), ctx, cfg=TINY)
    per_tok, _ = ltxav_forward(
        tiny_params, x, jnp.full((1, lv), 0.4, dtype=jnp.float32), ctx, cfg=TINY)
    np.testing.assert_allclose(np.asarray(scalar), np.asarray(per_tok),
                               rtol=2e-4, atol=2e-4)


def test_per_token_timesteps_vary(tiny_params):
    """Zeroing the timestep on conditioning tokens must change the output."""
    x = _video()
    lv = 3 * 4 * 4
    tvec = np.full((1, lv), 0.4, dtype=np.float32)
    tvec[0, : lv // 2] = 0.0
    ctx = jnp.asarray(np.random.default_rng(3).standard_normal(
        (1, 7, TINY.cross_attention_dim), dtype=np.float32) * 0.1)
    base, _ = ltxav_forward(tiny_params, x, jnp.asarray([0.4]), ctx, cfg=TINY)
    mixed, _ = ltxav_forward(tiny_params, x, jnp.asarray(tvec), ctx, cfg=TINY)
    assert np.abs(np.asarray(base) - np.asarray(mixed)).max() > 1e-4


def test_video_rope_shape_and_identity_pad():
    cfg = TINY
    cos, sin = video_rope(4, 4, 3, cfg)
    lv = 3 * 4 * 4
    assert cos.shape == (lv, cfg.num_heads, cfg.head_dim // 2)
    # pad lanes (half - 3*freq_count, spread across leading heads) are
    # identity rotations: cos=1, sin=0
    half = cfg.hidden_size // 2
    n_freq = cfg.hidden_size // 6
    pad = half - 3 * n_freq
    flat_cos = cos.reshape(lv, half)
    flat_sin = sin.reshape(lv, half)
    assert np.allclose(flat_cos[:, :pad], 1.0)
    assert np.allclose(flat_sin[:, :pad], 0.0)


def test_connector_register_padding():
    cfg = LTXAVConfig(
        in_channels=8, out_channels=8, hidden_size=48, cross_attention_dim=48,
        caption_channels=16, num_heads=4, head_dim=12, num_layers=1,
        audio_in_channels=6, audio_hidden_size=32,
        audio_cross_attention_dim=32, audio_num_heads=4, audio_head_dim=8,
        num_audio_channels=2, audio_frequency_bins=3,
        use_connector=True, connector_hidden_size=48, connector_num_heads=4,
        connector_head_dim=12, connector_num_layers=1,
        connector_num_registers=8, use_caption_projection=False,
    )
    p = init_ltxav_params(cfg, seed=0)
    x = _video()
    # context dim == connector hidden -> runs through connector; padded
    # internally to >=1024 tokens in multiples of 8 registers.
    ctx = jnp.asarray(np.random.default_rng(5).standard_normal(
        (1, 9, 48), dtype=np.float32) * 0.1)
    vout, _ = ltxav_forward(p, x, jnp.asarray([0.3]), ctx, cfg=cfg)
    assert vout.shape == (1, 3, 4, 4, 8)
    assert np.isfinite(np.asarray(vout)).all()


def test_pack_unpack_roundtrip():
    g = np.random.default_rng(0)
    video = g.standard_normal((1, 2, 3, 3, 8), dtype=np.float32)
    audio = g.standard_normal((1, 5, 2, 3), dtype=np.float32)
    packed = pack_av_latents(video, audio)
    assert packed.shape[-1] > 8
    np.testing.assert_array_equal(packed[..., :8], video)
    back = unpack_audio_latent(packed, 5, 8, num_audio_channels=2, freq_bins=3)
    np.testing.assert_array_equal(back, audio)


def test_num_audio_latents():
    # 121 frames @ 24fps ≈ 5.04s * 25 latents/s = 127
    assert get_num_audio_latents(121, 24) == 127
    assert get_num_audio_latents(24, 24) == 25


def test_detect_config_from_shapes():
    p = init_ltxav_params(TINY, seed=0)
    shapes = {k: tuple(v.shape) for k, v in p.items()}
    cfg = detect_ltxav_config(set(p.keys()), shapes)
    assert cfg.num_layers == TINY.num_layers
    assert cfg.hidden_size == TINY.hidden_size
    assert cfg.in_channels == TINY.in_channels
    assert cfg.audio_hidden_size == TINY.audio_hidden_size
    assert cfg.cross_attention_dim == TINY.cross_attention_dim
    assert not cfg.cross_attention_adaln


def test_latent_upsampler_spatial():
    from sdtpu.models.ltx_latent_upsampler import (
        LatentUpsamplerConfig, detect_upsampler_config, init_upsampler_params,
        latent_upsample)

    cfg = LatentUpsamplerConfig(in_channels=8, mid_channels=32,
                                num_blocks_per_stage=1)
    p = init_upsampler_params(cfg, seed=0)
    shapes = {k: tuple(v.shape) for k, v in p.items()}
    det = detect_upsampler_config(set(p.keys()), shapes)
    assert det.mid_channels == 32 and det.in_channels == 8
    assert det.spatial_upsample and not det.temporal_upsample
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 2, 4, 4, 8), dtype=np.float32))
    y = latent_upsample(p, x, cfg)
    assert y.shape == (1, 2, 8, 8, 8)
    assert np.isfinite(np.asarray(y)).all()


def test_latent_upsampler_temporal():
    from sdtpu.models.ltx_latent_upsampler import (
        LatentUpsamplerConfig, init_upsampler_params, latent_upsample)

    cfg = LatentUpsamplerConfig(in_channels=8, mid_channels=32,
                                num_blocks_per_stage=1, spatial_upsample=False,
                                temporal_upsample=True, temporal_up_factor=2)
    p = init_upsampler_params(cfg, seed=0)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 3, 4, 4, 8), dtype=np.float32))
    y = latent_upsample(p, x, cfg)
    assert y.shape == (1, 5, 4, 4, 8)


def test_latent_upsampler_rational():
    from sdtpu.models.ltx_latent_upsampler import (
        LatentUpsamplerConfig, init_upsampler_params, latent_upsample)

    cfg = LatentUpsamplerConfig(in_channels=8, mid_channels=32,
                                num_blocks_per_stage=1,
                                rational_resampler=True, spatial_up_num=3,
                                spatial_down_den=2)
    p = init_upsampler_params(cfg, seed=0)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 2, 4, 4, 8), dtype=np.float32))
    y = latent_upsample(p, x, cfg)
    assert y.shape == (1, 2, 6, 6, 8)

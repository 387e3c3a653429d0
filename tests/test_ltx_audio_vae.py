"""LTX audio VAE tests: mel decoder + vocoder shapes, snake activation,
resampler filters, BWE path, config detection."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from sdtpu.models.ltx_audio_vae import (
    LTXAudioVAEConfig,
    build_hann_resample_filter,
    detect_ltx_audio_vae_config,
    init_ltx_audio_vae_params,
    ltx_audio_vae_decode,
)

TINY = LTXAudioVAEConfig(
    mel_bins=8, latent_channels=2, latent_frequency_bins=2,
    decoder_channels=4, decoder_channel_multipliers=(1, 2, 4),
    decoder_num_res_blocks=1,
    base_upsample_initial_channel=8,
    base_upsample_rates=(2, 2), base_upsample_kernel_sizes=(4, 4),
    base_resblock_kernel_sizes=(3,), base_resblock_dilations=((1, 2, 3),),
)


def test_output_sample_rate():
    assert LTXAudioVAEConfig().output_sample_rate() == 16000 * 40 // 160 * 4
    assert dataclasses.replace(
        LTXAudioVAEConfig(), has_bwe=True).output_sample_rate() == 48000
    assert TINY.output_sample_rate() == 400


def test_decode_shapes():
    p = init_ltx_audio_vae_params(TINY, seed=0)
    g = np.random.default_rng(1)
    latent = jnp.asarray(g.standard_normal((1, 5, 2, 2), dtype=np.float32))
    wav = ltx_audio_vae_decode(p, latent, TINY)
    # mel time = 5*4-3 = 17 -> upsample x2 (decoder level) happens in freq/time
    # of the 2-D stage; vocoder then upsamples mel frames by prod(rates)=4
    assert wav.ndim == 3 and wav.shape[0] == 1 and wav.shape[2] == 2
    assert wav.shape[1] == 17 * 4
    w = np.asarray(wav)
    assert np.isfinite(w).all()
    assert w.max() <= 1.0 and w.min() >= -1.0


def test_bwe_path():
    cfg = dataclasses.replace(
        TINY, has_bwe=True, bwe_hop_length=4, bwe_n_fft=16, bwe_num_mels=8,
        bwe_upsample_initial_channel=8, bwe_upsample_rates=(3, 2, 2),
        bwe_upsample_kernel_sizes=(6, 4, 4), bwe_resblock_kernel_sizes=(3,),
        bwe_resblock_dilations=((1, 2, 3),))
    p = init_ltx_audio_vae_params(cfg, seed=0)
    latent = jnp.asarray(np.random.default_rng(2).standard_normal(
        (1, 3, 2, 2), dtype=np.float32))
    wav = ltx_audio_vae_decode(p, latent, cfg)
    low_t = (3 * 4 - 3) * 4  # 36 base-rate samples
    assert wav.shape == (1, low_t * 3, 2)
    assert np.isfinite(np.asarray(wav)).all()


def test_hann_filter_matches_torchaudio_form():
    f = build_hann_resample_filter(3)
    width = 7  # ceil(6/0.99)
    assert f.shape == (2 * width * 3 + 1,)
    # center tap is the peak; filter integrates to ~1/ratio per phase
    assert np.argmax(f) == f.shape[0] // 2
    np.testing.assert_allclose(f.sum(), 1.0, atol=5e-2)


def test_detect_config():
    p = init_ltx_audio_vae_params(TINY, seed=0)
    shapes = {k: tuple(v.shape) for k, v in p.items()}
    cfg = detect_ltx_audio_vae_config(set(p.keys()), shapes)
    assert cfg.latent_channels == 2
    assert cfg.audio_channels == 2
    assert cfg.latent_frequency_bins == 2
    assert cfg.mel_bins == 8
    assert cfg.decoder_channels == 4
    assert cfg.decoder_channel_multipliers == (1, 2, 4)
    assert cfg.decoder_num_res_blocks == 1
    assert not cfg.has_bwe

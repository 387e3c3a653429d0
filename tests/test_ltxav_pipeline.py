"""LTXAV end-to-end pipeline tests (tiny random-init configs)."""
import numpy as np
import pytest

from sdtpu.config import GenerationParams, SDVersion
from sdtpu.factory import create_pipeline


@pytest.fixture(scope="module")
def pipe():
    return create_pipeline(SDVersion.LTXAV, small=True, seed=0)


def _gp(**kw):
    base = dict(prompt="a red panda", width=32, height=32, sample_steps=2,
                sample_method="euler", cfg_scale=3.0, schedule="discrete")
    base.update(kw)
    return GenerationParams(**base)


def test_t2v_with_audio(pipe):
    res = pipe.generate_video(_gp(), frames=5, fps=24)
    assert res.frames.shape == (1, 5, 32, 32, 3)
    # packed latent keeps the audio channel(s)
    assert res.latents.shape[-1] > pipe.latent_channels
    assert res.audio is not None and res.audio.shape[1] == 2
    assert res.sample_rate == 400  # tiny audio cfg: 16000*4/160
    assert np.isfinite(res.audio).all()
    assert np.abs(res.audio).max() <= 1.0


def test_t2v_no_audio(pipe):
    res = pipe.generate_video(_gp(cfg_scale=1.0), frames=5, fps=24, audio=False)
    assert res.frames.shape == (1, 5, 32, 32, 3)
    assert res.audio is None
    assert res.latents.shape[-1] == pipe.latent_channels


def test_i2v_first_frame_conditioning(pipe):
    img = (np.random.default_rng(0).random((32, 32, 3)) * 255).astype(np.uint8)
    res = pipe.generate_video(_gp(cfg_scale=1.0, strength=1.0), frames=5,
                              fps=24, init_image=img)
    assert res.frames.shape == (1, 5, 32, 32, 3)
    # sanity: conditioning changed the result vs the unconditioned run
    res2 = pipe.generate_video(_gp(cfg_scale=1.0), frames=5, fps=24)
    assert np.abs(res.latents[..., :8] - res2.latents[..., :8]).max() > 1e-4


def test_latent_upscale_refine(pipe):
    from sdtpu.models.ltx_latent_upsampler import (
        LatentUpsamplerConfig, init_upsampler_params)

    up_cfg = LatentUpsamplerConfig(in_channels=8, mid_channels=32,
                                   num_blocks_per_stage=1)
    up_params = init_upsampler_params(up_cfg, seed=7)
    res = pipe.generate_video(_gp(cfg_scale=1.0), frames=5, fps=24,
                              upsampler_params=up_params, refine_strength=0.5)
    # 32x32 -> latent 8x8 -> upsampled 16x16 -> pixels 64x64
    assert res.frames.shape == (1, 5, 64, 64, 3)
    assert res.audio is not None


def test_wav_writer(tmp_path):
    import wave

    from sdtpu.utils.video import write_wav

    path = str(tmp_path / "a.wav")
    write_wav(path, np.zeros((100, 2), dtype=np.float32), 16000)
    w = wave.open(path)
    assert w.getnchannels() == 2
    assert w.getframerate() == 16000
    assert w.getnframes() == 100

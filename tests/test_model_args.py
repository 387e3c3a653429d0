"""--model-args escape hatch (reference parse_key_value_args consumers:
flux.hpp:1417 chroma_use_dit_mask, conditioner.hpp:1300 chroma_use_t5_mask /
chroma_t5_mask_pad, qwen_image.hpp:579 qwen_image_zero_cond_t)."""
import dataclasses

import numpy as np

import jax.numpy as jnp

from sdtpu.config import GenerationParams, SDVersion, parse_key_value_args
from sdtpu.factory import create_pipeline


def test_parse_key_value_args():
    got = parse_key_value_args("a=1,b=true,c=false,d=0.5,e=xy, f = 2 ")
    assert got == {"a": 1, "b": True, "c": False, "d": 0.5, "e": "xy", "f": 2}
    assert parse_key_value_args(None) == {}
    assert parse_key_value_args({"k": 3}) == {"k": 3}


def test_chroma_dit_mask_model_arg():
    from sdtpu.models.flux import FluxConfig, flux_forward, init_flux_params

    cfg = FluxConfig(
        in_channels=16, hidden_size=64, num_heads=2, depth=1, depth_single=1,
        axes_dim=(8, 12, 12), context_in_dim=32, vec_in_dim=0,
        guidance_embed=False, is_chroma=True,
    )
    p = init_flux_params(cfg, seed=0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4), dtype=np.float32))
    t = jnp.asarray([0.5], dtype=jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 6, 32), dtype=np.float32))
    mask = jnp.asarray(np.array([[0, 0, 0, -1e9, -1e9, -1e9]], np.float32))
    g = jnp.asarray([0.0], dtype=jnp.float32)

    masked = np.asarray(flux_forward(p, x, t, ctx, mask, guidance=g, cfg=cfg))
    no_mask_cfg = dataclasses.replace(cfg, chroma_use_dit_mask=False)
    unmasked = np.asarray(
        flux_forward(p, x, t, ctx, mask, guidance=g, cfg=no_mask_cfg))
    assert np.abs(masked - unmasked).max() > 1e-6


class _StubT5Tokenizer:
    eos_token_id = 1

    def encode(self, text):
        return [(hash(ch) % 200) + 2 for ch in text][:8]

    def pad(self, ids, seq_len):
        mask = [1] * len(ids) + [0] * (seq_len - len(ids))
        return ids + [0] * (seq_len - len(ids)), mask


def test_chroma_t5_mask_model_args():
    from sdtpu.conditioning.conditioner import ChromaConditioner
    from sdtpu.models import t5 as t5_mod

    t5_cfg = t5_mod.T5Config(vocab_size=256, d_model=48, d_kv=12, d_ff=96,
                             num_layers=2, num_heads=4)
    t5_params = t5_mod.init_t5_params(t5_cfg, 0)
    tok = _StubT5Tokenizer()

    base = ChromaConditioner(tok, t5_params, t5_cfg, seq_len=16)
    masked = ChromaConditioner(tok, t5_params, t5_cfg, seq_len=16,
                               use_mask=True)
    c0 = base.get_learned_condition("hello")
    c1 = masked.get_learned_condition("hello")
    # masking padding inside T5 changes the hidden states
    assert np.abs(np.asarray(c0.c_crossattn)
                  - np.asarray(c1.c_crossattn)).max() > 1e-6

    padded = ChromaConditioner(tok, t5_params, t5_cfg, seq_len=16, mask_pad=4)
    m1 = np.asarray(base.get_learned_condition("hello").c_vector)[0]
    m4 = np.asarray(padded.get_learned_condition("hello").c_vector)[0]
    # mask_pad keeps that many extra padding tokens attendable
    assert np.isfinite(m4).sum() == np.isfinite(m1).sum() + 3


def test_qwen_zero_cond_t_model_arg():
    # zero_cond_t only changes the modulation of REFERENCE-image tokens
    # (qwen_image.hpp:319-343), so drive the edit path with a ref image
    gp = GenerationParams(prompt="x", width=32, height=32, sample_steps=1,
                          cfg_scale=1.0, seed=3, sample_method="euler")
    ref = np.full((32, 32, 3), 0.6, dtype=np.float32)
    base = create_pipeline(SDVersion.QWEN_IMAGE, small=True, seed=0)
    zero = create_pipeline(SDVersion.QWEN_IMAGE, small=True, seed=0,
                           model_args="qwen_image_zero_cond_t=true")
    a = np.asarray(base.generate(gp, ref_images=[ref]).latents)
    b = np.asarray(zero.generate(gp, ref_images=[ref]).latents)
    assert a.shape == b.shape
    assert np.abs(a - b).max() > 0  # zero-cond-t path actually engaged


def test_model_args_via_create_pipeline_chroma():
    gp = GenerationParams(prompt="x", width=32, height=32, sample_steps=1,
                          cfg_scale=1.0, seed=3, sample_method="euler")
    base = create_pipeline(SDVersion.CHROMA, small=True, seed=0)
    alt = create_pipeline(
        SDVersion.CHROMA, small=True, seed=0,
        model_args="chroma_use_dit_mask=false,chroma_use_t5_mask=true")
    a = np.asarray(base.generate(gp).latents)
    b = np.asarray(alt.generate(gp).latents)
    assert a.shape == b.shape


def test_ref_image_args_routing():
    """ref_image_args (reference stable-diffusion.cpp:3030-3128):
    pass_to_dit=false drops the ref latents from the DiT extras."""
    ref = np.full((32, 32, 3), 0.4, dtype=np.float32)
    pipe = create_pipeline(SDVersion.QWEN_IMAGE, small=True, seed=0)
    gp = GenerationParams(prompt="x", width=32, height=32, sample_steps=1,
                          cfg_scale=1.0, seed=3, sample_method="euler")
    with_refs = np.asarray(pipe.generate(gp, ref_images=[ref]).latents)
    no_dit = np.asarray(pipe.generate(
        dataclasses.replace(gp, ref_image_args="pass_to_dit=false"),
        ref_images=[ref]).latents)
    plain = np.asarray(pipe.generate(gp).latents)
    # dropping the DiT refs reproduces the no-ref trajectory
    np.testing.assert_allclose(no_dit, plain, rtol=1e-5, atol=1e-5)
    assert np.abs(with_refs - plain).max() > 1e-6


def test_temporal_tiled_decode_windowing():
    """Temporal window math (reference LTX decode_tiled TemporalTilePlan):
    with a synthetic causal decoder whose receptive field fits the overlap,
    windowed decode is EXACT."""
    from sdtpu.models.tiling import tiled_decode_temporal

    ts = 4

    def causal_decode(z):
        # out frame count 1 + ts*(T-1); each output frame depends on its
        # latent frame and the previous one (receptive field 1)
        z = np.asarray(z)
        b, t = z.shape[:2]
        outs = [z[:, :1]]
        for i in range(1, t):
            prev, cur = z[:, i - 1: i], z[:, i: i + 1]
            for k in range(ts):
                outs.append(cur * (k + 1) / ts + prev * (ts - k - 1) / ts)
        return np.concatenate(outs, axis=1)

    rng = np.random.default_rng(0)
    z = rng.standard_normal((1, 9, 2, 2, 3), dtype=np.float32)
    full = causal_decode(z)
    for frames, overlap in [(3, 1), (4, 2), (5, 1), (9, 4)]:
        tiled = tiled_decode_temporal(causal_decode, z, frames=frames,
                                      overlap=overlap, temporal_scale=ts)
        assert tiled.shape == full.shape, (frames, overlap, tiled.shape)
        np.testing.assert_allclose(tiled, full, atol=1e-6,
                                   err_msg=f"frames={frames} ov={overlap}")


def test_temporal_tiled_decode_pipeline():
    """Pipeline wiring: temporal tiling produces the right frame count and
    matches the full decode over the first window (causal prefix)."""
    pipe = create_pipeline(SDVersion.WAN2, small=True, seed=0)
    gp = GenerationParams(prompt="a dog", width=64, height=64, sample_steps=1,
                          cfg_scale=1.0, seed=5, sample_method="euler")
    full = pipe.generate_video(gp, frames=17)  # 5 latent frames
    pipe.set_vae_tiling(False, temporal=True,
                        extra_tiling_args="temporal_tile_frames=3,"
                                          "temporal_tile_overlap=2")
    tiled = pipe.generate_video(gp, frames=17)
    a = np.asarray(full.frames, dtype=np.float32).reshape(-1, 64, 64, 3)
    b = np.asarray(tiled.frames, dtype=np.float32).reshape(-1, 64, 64, 3)
    assert a.shape == b.shape
    # the first window decodes the causal prefix exactly (uint8 rounding)
    n0 = 1 + 4 * (3 - 1)  # frames from the first 3 latent frames
    assert np.abs(a[:n0] - b[:n0]).max() <= 1.0

"""Wan 2.1 video DiT + 3-D causal VAE (reference src/model/diffusion/wan.hpp,
src/model/vae/wan_vae.hpp): shapes, jit, temporal compression arithmetic, and
causality of the temporal convs."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdtpu.models.wan import (
    WanConfig,
    detect_wan_config,
    init_wan_params,
    wan_forward,
)
from sdtpu.models.wan_vae import (
    WanVAEConfig,
    diffusion_to_vae_latents,
    init_wan_vae_params,
    vae_to_diffusion_latents,
    wan_vae_decode,
    wan_vae_encode,
)

SMALL_DIT = WanConfig(
    in_dim=8,
    dim=64,
    ffn_dim=128,
    freq_dim=32,
    text_dim=48,
    out_dim=8,
    num_heads=2,
    num_layers=2,
    axes_dim=(8, 12, 12),
)
SMALL_VAE = WanVAEConfig(dim=8, z_dim=4, num_res_blocks=1)


def test_wan_dit_shapes_and_jit():
    p = init_wan_params(SMALL_DIT, seed=0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 3, 8, 8, 8), dtype=np.float32))
    t = jnp.asarray([500.0])
    ctx = jnp.asarray(rng.standard_normal((1, 16, 48), dtype=np.float32))
    fn = jax.jit(lambda p, x, t, c: wan_forward(p, x, t, c, cfg=SMALL_DIT))
    out = fn(p, x, t, ctx)
    assert out.shape == (1, 3, 8, 8, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_wan_dit_i2v_clip_fea():
    cfg = WanConfig(
        model_type="i2v", in_dim=8, dim=64, ffn_dim=128, freq_dim=32, text_dim=48,
        out_dim=8, num_heads=2, num_layers=2, axes_dim=(8, 12, 12),
    )
    p = init_wan_params(cfg, seed=0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 2, 4, 4, 8), dtype=np.float32))
    ctx = jnp.asarray(rng.standard_normal((1, 8, 48), dtype=np.float32))
    fea = jnp.asarray(rng.standard_normal((1, 5, 1280), dtype=np.float32))
    out = wan_forward(p, x, jnp.asarray([100.0]), ctx, clip_fea=fea, cfg=cfg)
    assert out.shape == (1, 2, 4, 4, 8)
    # image tokens must influence the output (note: a uniform shift/scale of
    # fea would be erased by the img_emb LayerNorm — use fresh randomness)
    fea2 = jnp.asarray(rng.standard_normal((1, 5, 1280), dtype=np.float32))
    out2 = wan_forward(p, x, jnp.asarray([100.0]), ctx, clip_fea=fea2, cfg=cfg)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_wan_config_detection():
    names = [f"blocks.{i}.self_attn.q.weight" for i in range(40)] + ["head.head.weight"]
    cfg = detect_wan_config(names, {"patch_embedding.weight": (5120, 16, 1, 2, 2)})
    assert cfg.dim == 5120 and cfg.num_layers == 40 and cfg.model_type == "t2v"
    cfg = detect_wan_config(
        names + ["img_emb.proj.1.weight"],
        {"patch_embedding.weight": (5120, 36, 1, 2, 2)},
    )
    assert cfg.model_type == "i2v" and cfg.in_dim == 36


def test_wan_vae_decode_shape():
    """Tl latent frames → 1 + 4(Tl-1) video frames, 8× spatial."""
    p = init_wan_vae_params(SMALL_VAE, seed=0, decode_only=True)
    z = jnp.asarray(np.random.default_rng(0).standard_normal((1, 3, 4, 4, 4), dtype=np.float32))
    out = jax.jit(lambda p, z: wan_vae_decode(p, z, cfg=SMALL_VAE))(p, z)
    assert out.shape == (1, 1 + 4 * 2, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_wan_vae_encode_shape():
    p = init_wan_vae_params(SMALL_VAE, seed=0)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 9, 32, 32, 3), dtype=np.float32))
    z = wan_vae_encode(p, x, cfg=SMALL_VAE)
    assert z.shape == (1, 3, 4, 4, 4)


def test_wan_vae_roundtrip_runs():
    p = init_wan_vae_params(SMALL_VAE, seed=0)
    x = jnp.asarray(
        np.random.default_rng(1).uniform(-1, 1, (1, 5, 16, 16, 3)).astype(np.float32)
    )
    z = wan_vae_encode(p, x, cfg=SMALL_VAE)
    y = wan_vae_decode(p, z, cfg=SMALL_VAE)
    assert y.shape == x.shape


def test_wan_vae_temporal_causality():
    """Causal convs: perturbing latent frame j must not change video frames
    that precede its receptive window start 1+4(j-1)."""
    p = init_wan_vae_params(SMALL_VAE, seed=0, decode_only=True)
    rng = np.random.default_rng(0)
    z = rng.standard_normal((1, 4, 4, 4, 4)).astype(np.float32)
    base = np.asarray(wan_vae_decode(p, jnp.asarray(z), cfg=SMALL_VAE))
    z2 = z.copy()
    z2[:, 3] += 1.0  # perturb last latent frame
    out = np.asarray(wan_vae_decode(p, jnp.asarray(z2), cfg=SMALL_VAE))
    # frames before 1+4*(3-1)=9 are unaffected
    np.testing.assert_allclose(base[:, :9], out[:, :9], atol=1e-5)
    assert not np.allclose(base[:, 9:], out[:, 9:], atol=1e-4)


def test_latent_stats_roundtrip():
    z = np.random.default_rng(0).standard_normal((1, 2, 4, 4, 16)).astype(np.float32)
    back = np.asarray(diffusion_to_vae_latents(vae_to_diffusion_latents(jnp.asarray(z))))
    np.testing.assert_allclose(back, z, atol=1e-5)


def test_wan_pipeline_t2v_end_to_end():
    """Small Wan pipeline: UMT5 conditioner → flow sampling over 3-D latents
    → causal VAE decode (reference generate_video, stable-diffusion.cpp:6374)."""
    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.factory import create_pipeline

    pipe = create_pipeline(SDVersion.WAN2, small=True, seed=0)
    gp = GenerationParams(
        prompt="a cat", width=32, height=32, sample_steps=2, cfg_scale=3.0,
        sample_method="euler", schedule="simple", seed=11,
    )
    res = pipe.generate_video(gp, frames=9)
    assert res.frames.shape == (1, 9, 32, 32, 3)
    assert res.latents.shape == (1, 3, 4, 4, 4)
    assert np.isfinite(res.latents).all()
    # deterministic across runs
    res2 = pipe.generate_video(gp, frames=9)
    np.testing.assert_array_equal(res.frames, res2.frames)


def test_animatediff_motion_modules():
    """AnimateDiff temporal transformers in the SD1 UNet (reference
    animatediff.hpp + unet.hpp:603-630)."""
    import dataclasses

    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.factory import create_pipeline, unet_config_for
    from sdtpu.models.animatediff import default_motion_channel_map, init_motion_params

    ucfg = unet_config_for(SDVersion.SD1, small=True)
    motion = init_motion_params(default_motion_channel_map(ucfg), seed=1)
    pipe = create_pipeline(SDVersion.SD1, small=True, seed=0,
                           params={"motion": motion})
    gp = GenerationParams(prompt="a cat walking", width=64, height=64,
                          sample_steps=2, cfg_scale=3.0, sample_method="euler",
                          seed=6)
    res = pipe.generate_video(gp, frames=4)
    assert res.frames.shape == (1, 4, 64, 64, 3)
    assert np.isfinite(res.latents).all()
    # motion modules couple the frames: perturbing nothing but comparing
    # frame-wise to a no-motion pipeline shows temporal mixing
    pipe2 = create_pipeline(SDVersion.SD1, small=True, seed=0)
    res2 = pipe2.generate_video(gp, frames=4)
    assert not np.allclose(res.latents, res2.latents, atol=1e-4)
    # single-image generation through the motion pipeline is unaffected
    img_a = pipe.generate(gp)
    img_b = pipe2.generate(gp)
    np.testing.assert_allclose(img_a.latents, img_b.latents, atol=1e-5)


def test_wan22_moe_two_phase():
    """Wan2.2 MoE: high-noise model above the sigma boundary, low-noise below
    (reference two-phase sampling, stable-diffusion.cpp:6460-6505)."""
    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.factory import create_pipeline
    from sdtpu.models.wan import WanConfig, init_wan_params

    pipe = create_pipeline(SDVersion.WAN2, small=True, seed=0)
    cfg = WanConfig(
        in_dim=4, dim=64, ffn_dim=128, freq_dim=32, text_dim=96, out_dim=4,
        num_heads=2, num_layers=2, axes_dim=(8, 12, 12),
    )
    hn = init_wan_params(cfg, seed=99)  # a different "expert"
    gp = GenerationParams(prompt="a cat", width=32, height=32, sample_steps=6,
                          cfg_scale=3.0, sample_method="euler", schedule="simple",
                          seed=4)
    single = pipe.generate_video(gp, frames=5)
    moe = pipe.generate_video(gp, frames=5, high_noise_params=hn, moe_boundary=0.8)
    assert moe.frames.shape == single.frames.shape
    assert not np.allclose(single.latents, moe.latents, atol=1e-5)
    # boundary above all sigmas → high-noise model never used → identical
    same = pipe.generate_video(gp, frames=5, high_noise_params=hn, moe_boundary=2.0)
    np.testing.assert_allclose(single.latents, same.latents, rtol=1e-4, atol=1e-4)


def test_wan_i2v_conditioning():
    """Wan i2v: first-frame VAE latent + 4ch mask concat + CLIP-vision
    features (reference stable-diffusion.cpp:5855-5911)."""
    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.factory import create_pipeline

    pipe = create_pipeline(SDVersion.WAN2_2_I2V, small=True, seed=0)
    assert pipe.video_condition_fn is not None
    gp = GenerationParams(prompt="a cat", width=32, height=32, sample_steps=2,
                          cfg_scale=3.0, sample_method="euler", schedule="simple",
                          seed=4)
    img_a = (np.random.default_rng(1).uniform(0, 255, (32, 32, 3))).astype(np.uint8)
    img_b = (np.random.default_rng(2).uniform(0, 255, (32, 32, 3))).astype(np.uint8)
    ra = pipe.generate_video(gp, frames=5, init_image=img_a)
    rb = pipe.generate_video(gp, frames=5, init_image=img_b)
    assert ra.frames.shape == (1, 5, 32, 32, 3)
    assert not np.allclose(ra.latents, rb.latents, atol=1e-5)
    # the conditioning tensor has mask(4) + latent(4) channels
    cc, fea = pipe.video_condition_fn(img_a, 5, 32, 32)
    assert cc.shape == (1, 2, 4, 4, 8)
    assert (cc[:, 0, :, :, :4] == 1.0).all() and (cc[:, 1:, :, :, :4] == 0.0).all()
    assert fea.shape == (1, 257, 1280)


def test_moe_phase_overrides():
    """Wan2.2 MoE: per-phase sampler overrides (reference
    high_noise_sample_params, SamplePlan stable-diffusion.cpp:4184-4256)."""
    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.factory import create_pipeline
    from sdtpu.models.wan import init_wan_params

    import dataclasses as _dc

    pipe = create_pipeline(SDVersion.WAN2, small=True, seed=0)
    # the tokenizer-less small conditioner encodes every prompt identically
    # (cond == uncond → cfg moot); add a prompt-dependent offset so guidance
    # has something to act on
    _orig_cond = pipe.conditioner.get_learned_condition

    def _salted(text, **kw):
        c = _orig_cond(text, **kw)
        off = (abs(hash(text)) % 997) / 997.0
        return _dc.replace(c, c_crossattn=c.c_crossattn + off)

    pipe.conditioner.get_learned_condition = _salted
    hn = init_wan_params(
        __import__("dataclasses").replace(
            __import__("sdtpu.models.wan", fromlist=["WanConfig"]).WanConfig(
                in_dim=4, dim=64, ffn_dim=128, freq_dim=32, text_dim=96,
                out_dim=4, num_heads=2, num_layers=2, axes_dim=(8, 12, 12),
            )
        ), seed=9,
    )
    gp = GenerationParams(prompt="cat", width=64, height=64, sample_steps=4,
                          sample_method="euler", seed=3, cfg_scale=3.0)
    base = pipe.generate_video(gp, frames=5, high_noise_params=hn,
                               high_noise_steps=2).latents
    # different high-noise cfg → different trajectory
    hot = pipe.generate_video(gp, frames=5, high_noise_params=hn,
                              high_noise_steps=2,
                              high_noise_cfg_scale=6.0).latents
    assert np.abs(base - hot).max() > 1e-5
    # high-noise stochastic method with eta works end-to-end
    mixed = pipe.generate_video(gp, frames=5, high_noise_params=hn,
                                high_noise_steps=2,
                                high_noise_sample_method="euler_a",
                                high_noise_eta=1.0).latents
    assert np.isfinite(mixed).all()
    assert np.abs(base - mixed).max() > 1e-5

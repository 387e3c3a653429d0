"""In-jit preview tap (io_callback), --preview-noisy semantics, TAESD
attach/detach, and high-noise SLG overrides.

VERDICT r3 missing #4/#6 closures: the reference previews fire inside the
denoise closure with the denoised estimate (stable-diffusion.cpp:2788) and
--preview-noisy switches to the noisy inputs (cli/main.cpp:126);
--taesd-preview-only keeps the full VAE for the final decode
(cli/main.cpp:122); --high-noise-slg-scale/--high-noise-skip-layers apply
SLG only to the Wan2.2 MoE high-noise phase (common.cpp:1141,1566).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from sdtpu.config import GenerationParams, SDVersion
from sdtpu.factory import create_pipeline


@pytest.fixture(scope="module")
def sd1_pipe():
    return create_pipeline(SDVersion.SD1, small=True, seed=0)


def _gp(steps=3, **kw):
    kw.setdefault("cfg_scale", 3.0)
    return GenerationParams(
        prompt="a cat", width=64, height=64, sample_steps=steps,
        sample_method="euler", seed=5, **kw,
    )


def test_preview_tap_fires_in_fused_scan(sd1_pipe):
    """Preview alone must NOT force the stepwise path — the tap streams
    from inside the compiled scan."""
    seen = []

    def cb(step, lat):
        seen.append((step, lat.shape, float(np.abs(lat).max())))

    res = sd1_pipe.generate(_gp(steps=3), preview_callback=cb)
    assert res.images.shape[0] == 1
    steps_seen = [s for s, _, _ in seen]
    assert steps_seen == [1, 2, 3]
    assert all(np.isfinite(m) for _, _, m in seen)


def test_preview_interval_and_reset(sd1_pipe):
    seen = []
    sd1_pipe.generate(
        _gp(steps=4),
        preview_callback=lambda s, l: seen.append(s),
        preview_interval=2,
    )
    assert seen == [2, 4]
    # a follow-up run without preview must not fire the old callback
    seen.clear()
    sd1_pipe.generate(_gp(steps=2))
    assert seen == []


def test_video_preview_tap_and_no_leak():
    """generate_video supports the in-jit preview tap with 5-D video
    latents, and a tap installed by a prior generate() does NOT leak into
    generate_video (regression: the stale image callback would be baked
    into the video program and fire with [B,T,H,W,C] latents)."""
    p = create_pipeline(SDVersion.WAN2, small=True, seed=0)
    gp = GenerationParams(prompt="a cat", width=32, height=32,
                          sample_steps=2, cfg_scale=1.0, seed=1,
                          sample_method="euler")
    seen = []
    p.generate_video(gp, frames=5,
                     preview_callback=lambda s, l: seen.append(l.shape))
    assert len(seen) == 2 and len(seen[0]) == 5  # [B,T,H,W,C] per step
    # leak check: stale tap from an earlier call must not fire
    stale = []
    p.generate_video(gp, frames=5)  # no callback → tap must be cleared
    assert p._preview_tap[0] is None
    assert stale == []


def test_preview_noisy_differs_from_denoised(sd1_pipe):
    den, noisy = [], []
    sd1_pipe.generate(_gp(steps=2),
                      preview_callback=lambda s, l: den.append(l.copy()))
    sd1_pipe.generate(_gp(steps=2), preview_noisy=True,
                      preview_callback=lambda s, l: noisy.append(l.copy()))
    assert len(den) == len(noisy) == 2
    # the noisy input at step 1 IS the scaled init noise; the denoised
    # estimate is the model prediction — they must differ
    assert not np.allclose(den[0], noisy[0])
    # determinism: the noisy tap is reproducible run-to-run
    noisy2 = []
    sd1_pipe.generate(_gp(steps=2), preview_noisy=True,
                      preview_callback=lambda s, l: noisy2.append(l.copy()))
    np.testing.assert_array_equal(noisy[0], noisy2[0])


def test_preview_works_with_progress_stepwise(sd1_pipe):
    """progress forces the stepwise loop; preview must still fire once per
    step (via the tap), not twice."""
    seen = []
    prog = []
    sd1_pipe.generate(
        _gp(steps=3),
        preview_callback=lambda s, l: seen.append(s),
        progress_callback=lambda i, n, x: prog.append(i),
    )
    assert seen == [1, 2, 3]
    assert prog == [1, 2, 3]


def test_set_tae_decode_and_preview_only():
    from sdtpu.models.tae import TAEConfig, init_tae_params

    pipe = create_pipeline(SDVersion.SD1, small=True, seed=0)
    base = pipe.generate(_gp(steps=2))
    cfg = TAEConfig(z_channels=pipe.latent_channels)
    tae_p = init_tae_params(cfg, seed=1)

    # decode mode: final images come from the TAE decoder
    pipe.set_tae(tae_p, cfg)
    tae_res = pipe.generate(_gp(steps=2))
    assert tae_res.images.shape == base.images.shape
    assert not np.array_equal(tae_res.images, base.images)
    # latents are decoder-independent
    np.testing.assert_allclose(tae_res.latents, base.latents, rtol=1e-4,
                               atol=1e-5)

    # detach restores the full VAE
    pipe.set_tae(None)
    back = pipe.generate(_gp(steps=2))
    np.testing.assert_array_equal(back.images, base.images)

    # preview-only: final decode unchanged, tae_preview_decode works
    pipe.set_tae(tae_p, cfg, preview_only=True)
    po = pipe.generate(_gp(steps=2))
    np.testing.assert_array_equal(po.images, base.images)
    img = pipe.tae_preview_decode(base.latents[:1])
    assert img.shape == (1, 64, 64, 3)
    assert np.isfinite(img).all()

    # re-attach over an existing TAE, then detach: must restore the FULL
    # VAE, not the previous TAE (round-4 review finding)
    tae_p2 = init_tae_params(cfg, seed=2)
    pipe.set_tae(tae_p, cfg)
    pipe.set_tae(tae_p2, cfg)
    pipe.set_tae(None)
    back2 = pipe.generate(_gp(steps=2))
    np.testing.assert_array_equal(back2.images, base.images)


def test_slg_unsupported_model_warns_not_crashes(sd1_pipe):
    """--slg-scale on a model whose diffusion_fn has no skip_layers
    parameter (SD1 UNet, HunyuanVideo, ...) must be ignored with a
    warning — not raise TypeError at trace (round-4 review finding; the
    reference's backbones without SLG wiring ignore skip_layers)."""
    from sdtpu.utils.logging import set_log_callback

    base = sd1_pipe.generate(_gp(steps=2)).images
    logs = []
    set_log_callback(lambda lvl, msg: logs.append((lvl, msg)))
    try:
        got = sd1_pipe.generate(
            _gp(steps=2, slg_scale=2.5, skip_layers=(1,))).images
    finally:
        set_log_callback(None)
    assert any(lvl == "warn" and "skip_layers" in m for lvl, m in logs)
    np.testing.assert_array_equal(got, base)

    # video path: HunyuanVideo's diffusion_fn has no skip_layers either
    p = create_pipeline(SDVersion.HUNYUAN_VIDEO, small=True, seed=0)
    gp = GenerationParams(prompt="a cat", width=32, height=32,
                          sample_steps=1, cfg_scale=3.0, seed=1,
                          sample_method="euler", slg_scale=2.5,
                          skip_layers=(1,))
    res = p.generate_video(gp, frames=5)  # must not TypeError
    assert np.isfinite(np.asarray(res.latents)).all()


def test_wan_skip_layers_changes_output():
    from sdtpu.models.wan import WanConfig, init_wan_params, wan_forward

    cfg = WanConfig(
        in_dim=4, dim=64, ffn_dim=128, freq_dim=32, text_dim=96, out_dim=4,
        num_heads=2, num_layers=2, axes_dim=(8, 12, 12),
    )
    p = init_wan_params(cfg, seed=0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 2, 8, 8, 4)), dtype=jnp.float32)
    t = jnp.asarray([500.0], dtype=jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 16, 96)), dtype=jnp.float32)
    full = np.asarray(wan_forward(p, x, t, ctx, cfg=cfg))
    skipped = np.asarray(wan_forward(p, x, t, ctx, cfg=cfg, skip_layers=(1,)))
    assert not np.allclose(full, skipped)


def test_high_noise_slg_applies_only_to_high_phase():
    pipe = create_pipeline(SDVersion.WAN2, small=True, seed=0)
    gp = _gp(steps=4)
    base = pipe.generate_video(gp, frames=5).latents
    hn = {k: v for k, v in pipe.diffusion_params.items()}
    with_slg = pipe.generate_video(
        gp, frames=5, high_noise_params=hn, moe_boundary=0.5,
        high_noise_slg_scale=2.5, high_noise_skip_layers=(0,),
        high_noise_slg_start=0.0, high_noise_slg_end=1.0,
    ).latents
    # same weights both phases; only the high-noise SLG differs from base
    assert not np.allclose(base, with_slg)
    # slg scale 0 with the same phase split reproduces the base exactly
    no_slg = pipe.generate_video(
        gp, frames=5, high_noise_params=hn, moe_boundary=0.5,
        high_noise_slg_scale=0.0,
    ).latents
    np.testing.assert_allclose(no_slg, base, rtol=1e-5, atol=1e-6)


def test_high_noise_img_cfg_warns_and_ignores():
    pipe = create_pipeline(SDVersion.WAN2, small=True, seed=0)
    gp = _gp(steps=2)
    hn = dict(pipe.diffusion_params)
    base = pipe.generate_video(gp, frames=5, high_noise_params=hn,
                               moe_boundary=0.5).latents
    got = pipe.generate_video(gp, frames=5, high_noise_params=hn,
                              moe_boundary=0.5,
                              high_noise_img_cfg_scale=1.5).latents
    np.testing.assert_allclose(got, base, rtol=1e-6, atol=1e-7)

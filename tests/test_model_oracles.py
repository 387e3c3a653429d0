"""FLUX / Wan / Qwen-Image numerics vs independent torch oracles
(VERDICT r1 item 4: replace shape-only model tests with numeric parity).

Each oracle in tests/torch_ref/ is a test-only transcription of the
reference C++ math, consuming the SAME checkpoint-named param dict as the
sdtpu model — a transposed weight, wrong norm epsilon, or swapped modulation
index fails these at 1e-4.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


def _to_torch(params):
    return {k: torch.from_numpy(np.asarray(v, dtype=np.float32)) for k, v in params.items()}


def test_flux_matches_torch_oracle():
    from sdtpu.models.flux import FluxConfig, flux_forward, init_flux_params
    from tests.torch_ref.flux import flux_forward_torch

    cfg = FluxConfig(
        in_channels=16, hidden_size=64, num_heads=2, depth=2, depth_single=2,
        axes_dim=(8, 12, 12), context_in_dim=32, vec_in_dim=24,
    )
    p = init_flux_params(cfg, seed=0)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 8, 4), dtype=np.float32)
    t = np.array([0.8, 0.3], dtype=np.float32)
    ctx = rng.standard_normal((2, 10, 32), dtype=np.float32)
    y = rng.standard_normal((2, 24), dtype=np.float32)
    g = np.array([3.5, 3.5], dtype=np.float32)

    got = np.asarray(
        jax.jit(
            lambda p, x, t, c, y, g: flux_forward(p, x, t, c, y, guidance=g, cfg=cfg)
        )(p, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx), jnp.asarray(y), jnp.asarray(g))
    )
    with torch.no_grad():
        want = flux_forward_torch(
            _to_torch(p), torch.from_numpy(x), torch.from_numpy(t),
            torch.from_numpy(ctx), torch.from_numpy(y), torch.from_numpy(g), cfg,
        ).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("i2v", [False, True])
def test_wan_matches_torch_oracle(i2v):
    from sdtpu.models.wan import WanConfig, init_wan_params, wan_forward
    from tests.torch_ref.wan import wan_forward_torch

    cfg = WanConfig(
        model_type="i2v" if i2v else "t2v",
        in_dim=8, dim=64, ffn_dim=128, freq_dim=32, text_dim=48, out_dim=8,
        num_heads=2, num_layers=2, axes_dim=(8, 12, 12),
    )
    p = init_wan_params(cfg, seed=0)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 4, 8, 8, 8), dtype=np.float32)
    t = np.array([500.0], dtype=np.float32)
    ctx = rng.standard_normal((1, 12, 48), dtype=np.float32)
    clip_fea = (
        rng.standard_normal((1, 5, 1280), dtype=np.float32) if i2v else None
    )

    got = np.asarray(
        wan_forward(
            p, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx),
            clip_fea=jnp.asarray(clip_fea) if clip_fea is not None else None,
            cfg=cfg,
        )
    )
    with torch.no_grad():
        want = wan_forward_torch(
            _to_torch(p), torch.from_numpy(x), torch.from_numpy(t),
            torch.from_numpy(ctx), cfg,
            clip_fea=torch.from_numpy(clip_fea) if clip_fea is not None else None,
        ).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_qwen_image_matches_torch_oracle():
    from sdtpu.models.qwen_image import (
        QwenImageConfig, init_qwen_image_params, qwen_image_forward,
    )
    from tests.torch_ref.qwen_image import qwen_image_forward_torch

    cfg = QwenImageConfig(
        in_channels=16, out_channels=4, num_layers=2, head_dim=16, num_heads=4,
        joint_attention_dim=48, axes_dim=(4, 6, 6),
    )
    p = init_qwen_image_params(cfg, seed=0)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 8, 8, 4), dtype=np.float32)
    t = np.array([0.6], dtype=np.float32)
    ctx = rng.standard_normal((1, 9, 48), dtype=np.float32)

    got = np.asarray(
        qwen_image_forward(p, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx), cfg=cfg)
    )
    with torch.no_grad():
        want = qwen_image_forward_torch(
            _to_torch(p), torch.from_numpy(x), torch.from_numpy(t),
            torch.from_numpy(ctx), cfg,
        ).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_ltxv_video_matches_torch_oracle():
    from sdtpu.models.ltxv import (
        LTXAVConfig, init_ltxav_params, ltxav_forward, video_rope,
    )
    from tests.torch_ref.ltxv import ltxv_video_forward_torch

    cfg = LTXAVConfig(
        in_channels=8, out_channels=8, hidden_size=64, cross_attention_dim=48,
        caption_channels=999,  # != context dim → projection bypassed
        num_heads=2, head_dim=32, num_layers=2,
        audio_in_channels=8, audio_hidden_size=32, audio_cross_attention_dim=32,
        audio_num_heads=2, audio_head_dim=16,
        use_caption_projection=False, use_connector=False,
    )
    p = init_ltxav_params(cfg, seed=0)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 2, 4, 4, 8), dtype=np.float32)
    t = np.array([0.7], dtype=np.float32)
    ctx = rng.standard_normal((1, 7, 48), dtype=np.float32)

    got, audio = ltxav_forward(
        p, jnp.asarray(x), jnp.asarray(t), context=jnp.asarray(ctx), cfg=cfg
    )
    assert audio is None
    got = np.asarray(got)

    v_pe = video_rope(4, 4, 2, cfg, 24.0)
    with torch.no_grad():
        want = ltxv_video_forward_torch(
            _to_torch(p), torch.from_numpy(x), torch.from_numpy(t),
            torch.from_numpy(ctx), cfg, v_pe,
        ).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("meanflow", [False, True])
def test_hunyuan_matches_torch_oracle(meanflow):
    from sdtpu.models.hunyuan import (
        HunyuanVideoConfig, hunyuan_forward, init_hunyuan_params,
    )
    from tests.torch_ref.hunyuan import hunyuan_forward_torch

    cfg = HunyuanVideoConfig(
        in_channels=8, out_channels=4, hidden_size=64, context_in_dim=48,
        num_heads=2, depth=2, axes_dim=(8, 12, 12), refiner_depth=1,
        use_meanflow=meanflow,
    )
    p = init_hunyuan_params(cfg, seed=0)
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 2, 8, 8, 8), dtype=np.float32)
    t = np.array([700.0], dtype=np.float32)
    ctx = rng.standard_normal((1, 7, 48), dtype=np.float32)
    tr = np.array([600.0], dtype=np.float32) if meanflow else None

    got = np.asarray(hunyuan_forward(
        p, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx), cfg=cfg,
        timestep_r=jnp.asarray(tr) if tr is not None else None,
    ))
    with torch.no_grad():
        want = hunyuan_forward_torch(
            _to_torch(p), torch.from_numpy(x), torch.from_numpy(t),
            torch.from_numpy(ctx), cfg,
            timestep_r=torch.from_numpy(tr) if tr is not None else None,
        ).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_z_image_matches_torch_oracle():
    from sdtpu.models.z_image import (
        ZImageConfig, init_z_image_params, z_image_forward,
    )
    from tests.torch_ref.z_image import z_image_forward_torch

    cfg = ZImageConfig(
        hidden_size=48, in_channels=4, out_channels=4, num_layers=2,
        num_refiner_layers=1, head_dim=12, num_heads=4, num_kv_heads=2,
        multiple_of=16, cap_feat_dim=32, axes_dim=(4, 4, 4),
    )
    p = init_z_image_params(cfg, seed=0)
    rng = np.random.default_rng(5)
    x = rng.standard_normal((1, 8, 8, 4), dtype=np.float32)
    t = np.array([400.0], dtype=np.float32)
    ctx = rng.standard_normal((1, 9, 32), dtype=np.float32)

    got = np.asarray(z_image_forward(p, jnp.asarray(x), jnp.asarray(t),
                                     jnp.asarray(ctx), cfg=cfg))
    with torch.no_grad():
        want = z_image_forward_torch(
            _to_torch(p), torch.from_numpy(x), torch.from_numpy(t),
            torch.from_numpy(ctx), cfg,
        ).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_chroma_matches_torch_oracle():
    """Chroma variant: distilled modulation table + T5 mask attention."""
    import dataclasses

    from sdtpu.models.flux import FluxConfig, flux_forward, init_flux_params
    from tests.torch_ref.flux import chroma_forward_torch

    cfg = FluxConfig(
        in_channels=16, hidden_size=64, num_heads=2, depth=2, depth_single=2,
        axes_dim=(8, 12, 12), context_in_dim=32, vec_in_dim=0,
        guidance_embed=False, is_chroma=True,
    )
    p = init_flux_params(cfg, seed=0)
    rng = np.random.default_rng(6)
    x = rng.standard_normal((1, 8, 8, 4), dtype=np.float32)
    t = np.array([0.7], dtype=np.float32)
    ctx = rng.standard_normal((1, 10, 32), dtype=np.float32)
    # T5 token mask: last 3 tokens masked out
    y = np.zeros((1, 10), dtype=np.float32)
    y[:, 7:] = -1e30
    g = np.array([0.0], dtype=np.float32)

    got = np.asarray(flux_forward(
        p, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx), jnp.asarray(y),
        guidance=jnp.asarray(g), cfg=cfg,
    ))
    with torch.no_grad():
        want = chroma_forward_torch(
            _to_torch(p), torch.from_numpy(x), torch.from_numpy(t),
            torch.from_numpy(ctx), torch.from_numpy(y), torch.from_numpy(g), cfg,
        ).numpy()
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_wan_vae_decode_matches_torch_oracle():
    """Wan 3-D causal VAE decode numerics vs an independent torch
    transcription (layout, causal padding, Rep temporal upsample, RMS eps)."""
    from sdtpu.models.wan_vae import (
        WanVAEConfig, init_wan_vae_params, wan_vae_decode,
    )
    from tests.torch_ref.wan_vae import wan_vae_decode_torch

    cfg = WanVAEConfig(dim=8, z_dim=4, num_res_blocks=1)
    p = init_wan_vae_params(cfg, seed=0)
    rng = np.random.default_rng(7)
    z = rng.standard_normal((1, 3, 4, 4, 4), dtype=np.float32)

    got = np.asarray(wan_vae_decode(p, jnp.asarray(z), cfg))
    with torch.no_grad():
        want = wan_vae_decode_torch(_to_torch(p), torch.from_numpy(z), cfg).numpy()
    assert got.shape == want.shape  # [1, 1+4*(3-1), 32, 32, 3]
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_ernie_image_matches_torch_oracle():
    from sdtpu.models.ernie_image import (
        ErnieImageConfig, ernie_image_forward, init_ernie_params,
    )
    from tests.torch_ref.ernie_image import ernie_image_forward_torch

    cfg = ErnieImageConfig(
        hidden_size=64, num_heads=4, num_layers=2, ffn_hidden_size=128,
        in_channels=8, out_channels=8, patch_size=1, text_in_dim=48,
        axes_dim=(8, 4, 4),
    )
    p = init_ernie_params(cfg, seed=0)
    rng = np.random.default_rng(8)
    x = rng.standard_normal((1, 6, 6, 8), dtype=np.float32)
    t = np.array([600.0], dtype=np.float32)
    ctx = rng.standard_normal((1, 7, 48), dtype=np.float32)

    got = np.asarray(ernie_image_forward(
        p, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx), cfg=cfg))
    with torch.no_grad():
        want = ernie_image_forward_torch(
            _to_torch(p), torch.from_numpy(x), torch.from_numpy(t),
            torch.from_numpy(ctx), cfg).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def _svd_block_params(c, emb_dim, ctx_dim, depth, rng):
    def wt(*shape, scale=0.05):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * scale)

    p = {}

    def lin(pre, o, i, bias=True):
        p[f"{pre}.weight"] = wt(o, i)
        if bias:
            p[f"{pre}.bias"] = jnp.zeros((o,))

    def gn(pre, d):
        p[f"{pre}.weight"] = jnp.ones((d,))
        p[f"{pre}.bias"] = jnp.zeros((d,))

    def ln(pre, d):
        gn(pre, d)

    def res(pre, temporal):
        gn(f"{pre}.in_layers.0", c)
        p[f"{pre}.in_layers.2.weight"] = (wt(c, c, 3, 1, 1) if temporal
                                          else wt(c, c, 3, 3))
        p[f"{pre}.in_layers.2.bias"] = jnp.zeros((c,))
        lin(f"{pre}.emb_layers.1", c, emb_dim)
        gn(f"{pre}.out_layers.0", c)
        p[f"{pre}.out_layers.3.weight"] = (wt(c, c, 3, 1, 1) if temporal
                                           else wt(c, c, 3, 3))
        p[f"{pre}.out_layers.3.bias"] = jnp.zeros((c,))

    res("blk", False)
    res("blk.time_stack", True)
    p["blk.time_mixer.mix_factor"] = jnp.asarray([0.3])

    def tblock(pre, ff_in, cdim):
        if ff_in:
            ln(f"{pre}.norm_in", c)
            lin(f"{pre}.ff_in.net.0.proj", 8 * c, c)
            lin(f"{pre}.ff_in.net.2", c, 4 * c)
        for i, cd in (("1", c), ("2", cdim)):
            ln(f"{pre}.norm{i}", c)
            a = f"{pre}.attn{i}"
            lin(f"{a}.to_q", c, c, bias=False)
            lin(f"{a}.to_k", c, cd, bias=False)
            lin(f"{a}.to_v", c, cd, bias=False)
            lin(f"{a}.to_out.0", c, c)
        ln(f"{pre}.norm3", c)
        lin(f"{pre}.ff.net.0.proj", 8 * c, c)
        lin(f"{pre}.ff.net.2", c, 4 * c)

    gn("tr.norm", c)
    lin("tr.proj_in", c, c)
    lin("tr.proj_out", c, c)
    lin("tr.time_pos_embed.0", c, c)
    lin("tr.time_pos_embed.2", c, c)
    p["tr.time_mixer.mix_factor"] = jnp.asarray([0.2])
    for k in range(depth):
        tblock(f"tr.transformer_blocks.{k}", False, ctx_dim)
        tblock(f"tr.time_stack.{k}", True, ctx_dim)
    return p


def test_svd_video_blocks_match_torch_oracle():
    from sdtpu.models.unet import (
        UNetConfig, spatial_transformer, video_resblock,
    )
    from tests.torch_ref.svd_blocks import (
        spatial_video_transformer_torch, video_resblock_torch,
    )

    c, emb_dim, ctx_dim, frames, depth = 32, 24, 32, 4, 1
    rng = np.random.default_rng(32)
    p = _svd_block_params(c, emb_dim, ctx_dim, depth, rng)
    x = rng.standard_normal((frames, 6, 6, c)).astype(np.float32)
    emb = rng.standard_normal((frames, emb_dim)).astype(np.float32)
    ctx = rng.standard_normal((frames, 5, ctx_dim)).astype(np.float32)

    got = np.asarray(video_resblock(p, "blk", jnp.asarray(x),
                                    jnp.asarray(emb), frames))
    with torch.no_grad():
        want = video_resblock_torch(_to_torch(p), "blk",
                                    torch.from_numpy(x),
                                    torch.from_numpy(emb), frames).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    cfg = UNetConfig(num_heads=4, svd=True, use_linear_in_transformer=True,
                     context_dim=ctx_dim)
    got_t = np.asarray(spatial_transformer(
        p, "tr", jnp.asarray(x), jnp.asarray(ctx), cfg, depth,
        num_frames=frames))
    with torch.no_grad():
        want_t = spatial_video_transformer_torch(
            _to_torch(p), "tr", torch.from_numpy(x), torch.from_numpy(ctx),
            4, depth, frames).numpy()
    np.testing.assert_allclose(got_t, want_t, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("arch", ["qwen2.5vl", "qwen3vl"])
def test_qwen_vl_vision_matches_torch_oracle(arch):
    from sdtpu.models.qwen_vl_vision import (
        QwenVLVisionConfig, init_vision_params, qwen_vision_encode,
    )
    from tests.torch_ref.qwen_vl_vision import qwen_vision_encode_torch

    q3 = arch == "qwen3vl"
    cfg = QwenVLVisionConfig(
        arch=arch, num_layers=2, hidden_size=32, intermediate_size=48,
        num_heads=4, out_hidden_size=40, patch_size=4, spatial_merge_size=2,
        window_size=16, num_position_embeddings=16 if q3 else 0,
        fullatt_block_indexes=() if q3 else (1,), split_patch_embed=q3,
    )
    p = init_vision_params(cfg, seed=0)
    rng = np.random.default_rng(31)
    img = rng.standard_normal((16, 16, 3) if q3 else (24, 24, 3)
                              ).astype(np.float32)

    got = np.asarray(qwen_vision_encode(p, img, cfg))
    with torch.no_grad():
        want = qwen_vision_encode_torch(_to_torch(p), img, cfg).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("pit", [False, True])
def test_pid_matches_torch_oracle(pit):
    from sdtpu.models.pid import PidConfig, init_pid_params, pid_forward
    from tests.torch_ref.pid import pid_forward_torch

    cfg = PidConfig(
        hidden_size=48, num_groups=4, patch_mlp_hidden_dim=64,
        pixel_hidden_size=8, pixel_attn_hidden_size=32, pixel_num_groups=4,
        patch_depth=2, pixel_depth=1, patch_size=4, txt_embed_dim=24,
        txt_max_length=10, lq_hidden_dim=8, lq_num_res_blocks=1,
        lq_interval=2,
        lq_latent_channels=24 if pit else 6,
        lq_latent_unpatchify_factor=2 if pit else 1,
        lq_replicate_padding=pit, lq_gate_per_token=pit, pit_lq_inject=pit,
    )
    p = init_pid_params(cfg, seed=0)
    rng = np.random.default_rng(30)
    if pit:
        x = rng.standard_normal((1, 8, 8, 3), dtype=np.float32)
        lq = rng.standard_normal((1, 1, 1, 24), dtype=np.float32)
    else:
        x = rng.standard_normal((1, 9, 10, 3), dtype=np.float32)  # pad path
        lq = rng.standard_normal((1, 3, 3, 6), dtype=np.float32)
    t = np.array([700.0], dtype=np.float32)
    ctx = rng.standard_normal((1, 7, 24), dtype=np.float32)
    sigma = np.array([0.4], dtype=np.float32)

    got = np.asarray(pid_forward(
        p, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx), jnp.asarray(lq),
        cfg=cfg, degrade_sigma=jnp.asarray(sigma)))
    with torch.no_grad():
        want = pid_forward_torch(
            _to_torch(p), torch.from_numpy(x), torch.from_numpy(t),
            torch.from_numpy(ctx), torch.from_numpy(lq), cfg,
            degrade_sigma=torch.from_numpy(sigma)).numpy()
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("v2", [False, True])
def test_photomaker_matches_torch_oracle(v2):
    from sdtpu.models.clip import CLIPVisionConfig
    from sdtpu.models.pmid import init_pmid_params, photomaker_encode
    from tests.torch_ref.pmid import photomaker_encode_torch

    vcfg = CLIPVisionConfig(
        image_size=28, patch_size=14, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=4, projection_dim=16, hidden_act="quick_gelu",
    )
    p = init_pmid_params(vcfg, embed_dim=48, v2=v2, seed=0)
    rng = np.random.default_rng(29)
    pixels = rng.standard_normal((1, 28, 28, 3), dtype=np.float32)
    prompt = rng.standard_normal((1, 6, 48), dtype=np.float32)
    mask = np.zeros(6, dtype=bool)
    mask[2] = True
    if v2:
        mask[3] = True  # 2 tokens per id image
    id_embeds = rng.standard_normal((1, 512), dtype=np.float32) if v2 else None

    got = np.asarray(photomaker_encode(
        p, jnp.asarray(pixels), jnp.asarray(prompt), mask,
        id_embeds=jnp.asarray(id_embeds) if v2 else None, vision_cfg=vcfg))
    with torch.no_grad():
        want = photomaker_encode_torch(
            _to_torch(p), torch.from_numpy(pixels), torch.from_numpy(prompt),
            mask, id_embeds=torch.from_numpy(id_embeds) if v2 else None,
            vision_cfg=vcfg).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_esrgan_matches_torch_oracle():
    from sdtpu.models.esrgan import (
        ESRGANConfig, esrgan_forward, init_esrgan_params,
    )
    from tests.torch_ref.esrgan_yolo import esrgan_forward_torch

    cfg = ESRGANConfig(num_feat=16, num_block=2, num_grow=8)
    p = init_esrgan_params(cfg, seed=0)
    rng = np.random.default_rng(27)
    x = rng.random((1, 8, 8, 3), dtype=np.float32)

    got = np.asarray(esrgan_forward(p, jnp.asarray(x), cfg))
    with torch.no_grad():
        want = esrgan_forward_torch(_to_torch(p), torch.from_numpy(x),
                                    cfg).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_yolov8_matches_torch_oracle():
    from sdtpu.models.yolov8 import (
        YOLOv8Config, init_yolov8_params, yolov8_forward,
    )
    from tests.torch_ref.esrgan_yolo import yolov8_forward_torch

    oc = [0] * 22
    for i, c in zip((0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 12, 15, 16, 18, 19, 21),
                    (8, 16, 16, 32, 32, 32, 32, 64, 64, 64, 32, 16, 16, 32,
                     32, 64)):
        oc[i] = c
    cfg = YOLOv8Config(
        out_channels=tuple(oc),
        hidden={2: 8, 4: 16, 6: 16, 8: 32, 12: 16, 15: 8, 18: 16, 21: 32},
        repeats={k: 1 for k in (2, 4, 6, 8, 12, 15, 18, 21)},
        reg_max=4, num_classes=2,
    )
    p = init_yolov8_params(cfg, seed=0)
    rng = np.random.default_rng(28)
    x = rng.random((1, 64, 64, 3), dtype=np.float32)

    got = np.asarray(yolov8_forward(p, jnp.asarray(x), cfg))
    with torch.no_grad():
        want = yolov8_forward_torch(_to_torch(p), torch.from_numpy(x),
                                    cfg).numpy()
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_controlnet_matches_torch_oracle():
    from sdtpu.models.controlnet import controlnet_forward
    from sdtpu.models.unet import UNetConfig
    from tests.torch_ref.controlnet import TorchControlNet

    cfg = UNetConfig(
        in_channels=4, out_channels=4, model_channels=32, num_res_blocks=1,
        channel_mult=(1, 2), attention_resolutions=(1, 2),
        transformer_depth=(1, 1), context_dim=48, num_heads=2,
    )
    torch.manual_seed(0)
    m = TorchControlNet(cfg)
    m.eval()
    rng = np.random.default_rng(25)
    x = rng.standard_normal((1, 16, 16, 4), dtype=np.float32)
    hint = rng.random((1, 128, 128, 3), dtype=np.float32)
    t = np.array([500.0], dtype=np.float32)
    ctx = rng.standard_normal((1, 7, 48), dtype=np.float32)

    with torch.no_grad():
        want_c, want_m = m(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                           torch.from_numpy(hint.transpose(0, 3, 1, 2)),
                           torch.from_numpy(t), torch.from_numpy(ctx))
    p = {k: jnp.asarray(v.detach().numpy()) for k, v in m.state_dict().items()}
    got_c, got_m = controlnet_forward(
        p, jnp.asarray(x), jnp.asarray(hint), jnp.asarray(t),
        jnp.asarray(ctx), cfg=cfg)
    assert len(got_c) == len(want_c)
    for g, w in zip(got_c, want_c):
        np.testing.assert_allclose(np.asarray(g),
                                   w.numpy().transpose(0, 2, 3, 1),
                                   rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_m),
                               want_m.numpy().transpose(0, 2, 3, 1),
                               rtol=2e-4, atol=2e-4)


def test_animatediff_motion_module_matches_torch_oracle():
    from sdtpu.models.animatediff import (
        init_motion_params, motion_module_forward,
    )
    from tests.torch_ref.animatediff import motion_module_forward_torch

    key = "down_blocks.0.motion_modules.0"
    p = init_motion_params({key: 32}, max_frames=8, seed=0)
    rng = np.random.default_rng(26)
    x = rng.standard_normal((4, 6, 6, 32), dtype=np.float32)

    got = np.asarray(motion_module_forward(
        p, f"motion_module.{key}", jnp.asarray(x), num_frames=4, num_heads=4))
    with torch.no_grad():
        want = motion_module_forward_torch(
            _to_torch(p), f"motion_module.{key}", torch.from_numpy(x),
            num_frames=4, num_heads=4).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_ltx_audio_vae_matches_torch_oracle():
    from sdtpu.models.ltx_audio_vae import (
        LTXAudioVAEConfig, init_ltx_audio_vae_params, ltx_audio_vae_decode,
    )
    from tests.torch_ref.ltx_audio_vae import ltx_audio_vae_decode_torch

    cfg = LTXAudioVAEConfig(
        latent_channels=4, latent_frequency_bins=4, mel_bins=8,
        audio_channels=2, decoder_channels=8,
        decoder_channel_multipliers=(1, 2), decoder_num_res_blocks=1,
        base_upsample_initial_channel=16, base_upsample_rates=(2, 2),
        base_upsample_kernel_sizes=(4, 4), base_resblock_kernel_sizes=(3,),
        base_resblock_dilations=((1, 3, 5),),
        has_bwe=True, bwe_hop_length=4, bwe_n_fft=16, bwe_num_mels=8,
        bwe_upsample_initial_channel=16, bwe_upsample_rates=(2, 2),
        bwe_upsample_kernel_sizes=(4, 4), bwe_resblock_kernel_sizes=(3,),
        bwe_resblock_dilations=((1, 3, 5),),
        bwe_input_sample_rate=16000, bwe_output_sample_rate=32000,
    )
    p = init_ltx_audio_vae_params(cfg, seed=0)
    rng = np.random.default_rng(24)
    z = rng.standard_normal((1, 3, 4, 4), dtype=np.float32)

    got = np.asarray(ltx_audio_vae_decode(p, jnp.asarray(z), cfg))
    with torch.no_grad():
        want = ltx_audio_vae_decode_torch(_to_torch(p), torch.from_numpy(z),
                                          cfg).numpy()
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("mode", ["spatial", "temporal", "rational"])
def test_ltx_latent_upsampler_matches_torch_oracle(mode):
    from sdtpu.models.ltx_latent_upsampler import (
        LatentUpsamplerConfig, init_upsampler_params, latent_upsample,
    )
    from tests.torch_ref.ltx_latent_upsampler import latent_upsample_torch

    cfg = LatentUpsamplerConfig(
        in_channels=8, mid_channels=32, num_blocks_per_stage=1,
        spatial_upsample=mode == "spatial",
        temporal_upsample=mode == "temporal",
        rational_resampler=mode == "rational",
        spatial_up_num=3 if mode == "rational" else 2,
        spatial_down_den=2 if mode == "rational" else 1,
        temporal_up_factor=2 if mode == "temporal" else 1,
    )
    p = init_upsampler_params(cfg, seed=0)
    rng = np.random.default_rng(23)
    x = rng.standard_normal((1, 2, 4, 4, 8), dtype=np.float32)

    got = np.asarray(latent_upsample(p, jnp.asarray(x), cfg))
    with torch.no_grad():
        want = latent_upsample_torch(_to_torch(p), torch.from_numpy(x),
                                     cfg).numpy()
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_taesd_matches_torch_oracle():
    from sdtpu.models.tae import (
        TAEConfig, init_tae_params, tae_decode, tae_encode,
    )
    from tests.torch_ref.tae import tae_decode_torch, tae_encode_torch

    cfg = TAEConfig(channels=16, num_blocks=1)
    p = init_tae_params(cfg, seed=0)
    rng = np.random.default_rng(21)
    x = rng.standard_normal((1, 16, 16, 3), dtype=np.float32)
    z = rng.standard_normal((1, 2, 2, 4), dtype=np.float32) * 0.2

    got_e = np.asarray(tae_encode(p, jnp.asarray(x), cfg))
    got_d = np.asarray(tae_decode(p, jnp.asarray(z), cfg))
    with torch.no_grad():
        tp = _to_torch(p)
        want_e = tae_encode_torch(tp, torch.from_numpy(x), cfg).numpy()
        want_d = tae_decode_torch(tp, torch.from_numpy(z), cfg).numpy()
    np.testing.assert_allclose(got_e, want_e, rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(got_d, want_d, rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("wide", [False, True])
def test_taehv_matches_torch_oracle(wide):
    from sdtpu.models.taehv import (
        TAEHVConfig, init_taehv_params, taehv_decode, taehv_encode,
    )
    from tests.torch_ref.tae import taehv_decode_torch, taehv_encode_torch

    cfg = TAEHVConfig(z_channels=8, patch_size=2, num_blocks=1, is_wide=wide)
    p = init_taehv_params(cfg, seed=0, hidden=16)
    rng = np.random.default_rng(22)
    x = rng.standard_normal((1, 5, 16, 16, 3), dtype=np.float32)
    z = rng.standard_normal((1, 2, 2, 2, 8), dtype=np.float32) * 0.3

    got_e = np.asarray(taehv_encode(p, jnp.asarray(x), cfg))
    got_d = np.asarray(taehv_decode(p, jnp.asarray(z), cfg))
    with torch.no_grad():
        tp = _to_torch(p)
        want_e = taehv_encode_torch(tp, torch.from_numpy(x), cfg).numpy()
        want_d = taehv_decode_torch(tp, torch.from_numpy(z), cfg).numpy()
    np.testing.assert_allclose(got_e, want_e, rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(got_d, want_d, rtol=3e-4, atol=3e-4)


def test_mage_vae_matches_torch_oracle():
    from sdtpu.models.mage_vae import (
        init_mage_vae_params, mage_vae_decode, mage_vae_encode,
    )
    from tests.torch_ref.mage_vae import (
        mage_vae_decode_torch, mage_vae_encode_torch,
    )

    p = init_mage_vae_params(seed=0, n_blocks=2)
    rng = np.random.default_rng(20)
    img = rng.standard_normal((1, 32, 32, 3), dtype=np.float32)
    z = rng.standard_normal((1, 2, 2, 128), dtype=np.float32) * 0.5
    noise = rng.standard_normal((1, 2, 2, 128), dtype=np.float32)

    got_e = np.asarray(mage_vae_encode(p, jnp.asarray(img),
                                       noise=jnp.asarray(noise), n_blocks=2))
    got_d = np.asarray(mage_vae_decode(p, jnp.asarray(z), n_blocks=2))
    with torch.no_grad():
        tp = _to_torch(p)
        want_e = mage_vae_encode_torch(tp, torch.from_numpy(img),
                                       noise=torch.from_numpy(noise),
                                       n_blocks=2).numpy()
        want_d = mage_vae_decode_torch(tp, torch.from_numpy(z),
                                       n_blocks=2).numpy()
    np.testing.assert_allclose(got_e, want_e, rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(got_d, want_d, rtol=3e-4, atol=3e-4)


def test_ltx_vae_matches_torch_oracle():
    from sdtpu.models.ltx_vae import (
        LTXVAEBlock, LTXVAEConfig, init_ltx_vae_params, ltx_vae_decode,
        ltx_vae_encode,
    )
    from tests.torch_ref.ltx_vae import (
        ltx_vae_decode_torch, ltx_vae_encode_torch,
    )

    cfg = LTXVAEConfig(
        patch_size=2, latent_channels=8, timestep_conditioning=True,
        encoder_blocks=(LTXVAEBlock("res_x", 1),
                        LTXVAEBlock("compress_all_res", 0, 2),
                        LTXVAEBlock("res_x", 1)),
        decoder_blocks=(LTXVAEBlock("res_x", 1),
                        LTXVAEBlock("compress_all", 0, 2),
                        LTXVAEBlock("res_x", 1)),
    )
    p = init_ltx_vae_params(cfg, channels=16, seed=0)
    rng = np.random.default_rng(19)
    p["per_channel_statistics.mean-of-means"] = jnp.asarray(
        rng.standard_normal(8, dtype=np.float32) * 0.2)
    p["per_channel_statistics.std-of-means"] = jnp.asarray(
        1.0 + 0.1 * rng.standard_normal(8).astype(np.float32))
    x = rng.standard_normal((1, 3, 8, 8, 3), dtype=np.float32)
    z = rng.standard_normal((1, 2, 2, 2, 8), dtype=np.float32)

    got_e = np.asarray(ltx_vae_encode(p, jnp.asarray(x), cfg))
    got_d = np.asarray(ltx_vae_decode(p, jnp.asarray(z), cfg))
    with torch.no_grad():
        tp = _to_torch(p)
        want_e = ltx_vae_encode_torch(tp, torch.from_numpy(x), cfg).numpy()
        want_d = ltx_vae_decode_torch(tp, torch.from_numpy(z), cfg).numpy()
    np.testing.assert_allclose(got_e, want_e, rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(got_d, want_d, rtol=3e-4, atol=3e-4)


def test_hunyuan_vae_matches_torch_oracle():
    from sdtpu.models.hunyuan_vae import (
        HunyuanVAEConfig, hunyuan_vae_decode, hunyuan_vae_encode,
        init_hunyuan_vae_params,
    )
    from tests.torch_ref.hunyuan_vae import (
        hunyuan_vae_decode_torch, hunyuan_vae_encode_torch,
    )

    cfg = HunyuanVAEConfig(
        z_channels=4, block_out_channels=(8, 16, 16), layers_per_block=1,
        spatial_ratio=4, temporal_ratio=2,
    )
    p = init_hunyuan_vae_params(cfg, seed=0)
    rng = np.random.default_rng(18)
    x = rng.standard_normal((1, 5, 8, 8, 3), dtype=np.float32)
    z = rng.standard_normal((1, 3, 2, 2, 4), dtype=np.float32)

    got_e = np.asarray(hunyuan_vae_encode(p, jnp.asarray(x), cfg))
    got_d = np.asarray(hunyuan_vae_decode(p, jnp.asarray(z), cfg))
    with torch.no_grad():
        tp = _to_torch(p)
        want_e = hunyuan_vae_encode_torch(tp, torch.from_numpy(x), cfg).numpy()
        want_d = hunyuan_vae_decode_torch(tp, torch.from_numpy(z), cfg).numpy()
    np.testing.assert_allclose(got_e, want_e, rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(got_d, want_d, rtol=3e-4, atol=3e-4)


def test_lingbot_video_matches_torch_oracle():
    from sdtpu.models.lingbot_video import (
        LingBotVideoConfig, init_lingbot_params, lingbot_forward,
    )
    from tests.torch_ref.lingbot_video import lingbot_forward_torch

    cfg = LingBotVideoConfig(
        hidden_size=64, num_heads=4, depth=2, intermediate_size=96,
        text_dim=24, freq_dim=16, in_channels=8, out_channels=8,
        axes_dim=(8, 4, 4), num_experts=8, num_experts_per_tok=2,
        moe_intermediate_size=32, n_group=4, topk_group=2, sparse_layers=(1,),
    )
    p = init_lingbot_params(cfg, seed=0)
    rng = np.random.default_rng(17)
    x = rng.standard_normal((1, 2, 4, 4, 8), dtype=np.float32)
    t = np.array([[700.0, 400.0]], dtype=np.float32)  # per-frame timesteps
    ctx = rng.standard_normal((1, 5, 24), dtype=np.float32)

    got = np.asarray(lingbot_forward(
        p, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx), cfg=cfg))
    with torch.no_grad():
        want = lingbot_forward_torch(
            _to_torch(p), torch.from_numpy(x), torch.from_numpy(t),
            torch.from_numpy(ctx), cfg).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def _tiny_llm_cfgs():
    from sdtpu.models.llm import LLMConfig

    return {
        "qwen25vl": LLMConfig(
            arch="qwen2.5vl", num_layers=2, hidden_size=48,
            intermediate_size=96, num_heads=4, num_kv_heads=2, head_dim=12,
            vocab_size=64, qkv_bias=True),
        "qwen3_vl": LLMConfig(
            arch="qwen3_vl", num_layers=2, hidden_size=48,
            intermediate_size=96, num_heads=4, num_kv_heads=2, head_dim=12,
            vocab_size=64, qkv_bias=False, qk_norm=True, rope_theta=5e6,
            rope_style="imrope", mrope_sections=(2, 1, 1, 0)),
        "gemma": LLMConfig(
            arch="gemma2_2b", num_layers=2, hidden_size=48,
            intermediate_size=96, num_heads=4, num_kv_heads=2, head_dim=12,
            vocab_size=64, qkv_bias=False, rope_theta=1e4,
            mlp_activation="gelu_tanh", norm_add=True, normalize_input=True,
            gemma_norms=True),
        "mistral": LLMConfig(
            arch="mistral_small_3_2", num_layers=2, hidden_size=48,
            intermediate_size=96, num_heads=4, num_kv_heads=2, head_dim=12,
            vocab_size=64, qkv_bias=False, rms_norm_eps=1e-5,
            rope_theta=1e9, rope_style="normal"),
        "gpt_oss": LLMConfig(
            arch="gpt_oss_20b", num_layers=2, hidden_size=48,
            intermediate_size=32, num_heads=4, num_kv_heads=2, head_dim=12,
            vocab_size=64, qkv_bias=True, attention_out_bias=True,
            rms_norm_eps=1e-5, rope_theta=150000.0, rope_scales=(32.0,),
            rope_yarn=True, rope_orig_ctx=4096, sliding_attention=(4, 0),
            attention_sinks=True, num_experts=4, num_experts_per_tok=2),
    }


@pytest.mark.parametrize("arch", ["qwen25vl", "qwen3_vl", "gemma", "mistral",
                                  "gpt_oss"])
def test_llm_matches_torch_oracle(arch):
    from sdtpu.models.llm import init_llm_params, llm_forward
    from tests.torch_ref.llm import llm_forward_torch

    cfg = _tiny_llm_cfgs()[arch]
    p = init_llm_params(cfg, seed=0)
    # perturb norm weights so scale handling (incl. norm_add) is exercised
    rng = np.random.default_rng(15)
    p = {k: (jnp.asarray(np.asarray(v) +
                         0.1 * rng.standard_normal(np.asarray(v).shape)
                         .astype(np.float32))
             if k.endswith("norm.weight") or "layernorm" in k else v)
         for k, v in p.items()}
    ids = np.array([[3, 1, 7, 0, 2, 5, 9, 4]], dtype=np.int32)

    got = np.asarray(llm_forward(p, jnp.asarray(ids), cfg))
    with torch.no_grad():
        want = llm_forward_torch(_to_torch(p), torch.from_numpy(ids).long(),
                                 cfg).numpy()
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_hidream_o1_matches_torch_oracle():
    from sdtpu.models.hidream_o1 import (
        HiDreamO1Config, build_hidream_state, hidream_forward,
        init_hidream_params,
    )
    from tests.torch_ref.hidream_o1 import hidream_forward_torch

    cfg = HiDreamO1Config(llm=_tiny_llm_cfgs()["qwen3_vl"], patch_size=8)
    p = init_hidream_params(cfg, seed=0)
    state = build_hidream_state([3, 1, 5, 2], 2, 2)
    rng = np.random.default_rng(16)
    x = rng.standard_normal((1, 16, 16, 3), dtype=np.float32)
    t = np.array([0.25], dtype=np.float32)

    got = np.asarray(hidream_forward(
        p, jnp.asarray(x), jnp.asarray(t), jnp.asarray(state["input_ids"]),
        jnp.asarray(state["position_ids"]), jnp.asarray(state["attn_bias"]),
        cfg=cfg))
    with torch.no_grad():
        want = hidream_forward_torch(
            _to_torch(p), torch.from_numpy(x), torch.from_numpy(t),
            torch.from_numpy(state["input_ids"]).long(),
            state["position_ids"],
            torch.from_numpy(state["attn_bias"]), cfg).numpy()
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_anima_matches_torch_oracle():
    from sdtpu.models.anima import (
        AnimaConfig, anima_forward, init_anima_params, llm_adapter_forward,
    )
    from tests.torch_ref.anima import (
        anima_forward_torch, llm_adapter_forward_torch,
    )

    cfg = AnimaConfig(
        hidden_size=64, num_heads=4, head_dim=16, num_layers=2,
        text_embed_dim=24, adaln_lora_dim=16, in_channels=8, out_channels=8,
        axes_dim=(8, 4, 4),
    )
    p = init_anima_params(cfg, seed=0, adapter_layers=1, adapter_vocab=32,
                          adapter_dim=24)
    rng = np.random.default_rng(14)
    x = rng.standard_normal((1, 5, 6, 8), dtype=np.float32)
    t = np.array([600.0], dtype=np.float32)
    ctx = rng.standard_normal((1, 5, 24), dtype=np.float32)

    got = np.asarray(anima_forward(
        p, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx), cfg=cfg))
    with torch.no_grad():
        want = anima_forward_torch(
            _to_torch(p), torch.from_numpy(x), torch.from_numpy(t),
            torch.from_numpy(ctx), cfg).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    src = rng.standard_normal((1, 4, 24), dtype=np.float32)
    ids = np.array([[3, 1, 7, 0, 2]], dtype=np.int32)
    got_a = np.asarray(llm_adapter_forward(p, jnp.asarray(src),
                                           jnp.asarray(ids)))
    with torch.no_grad():
        want_a = llm_adapter_forward_torch(
            _to_torch(p), torch.from_numpy(src),
            torch.from_numpy(ids).long()).numpy()
    np.testing.assert_allclose(got_a, want_a, rtol=2e-4, atol=2e-4)


def test_minit2i_matches_torch_oracle():
    from sdtpu.models.minit2i import (
        MiniT2IConfig, init_minit2i_params, minit2i_forward,
    )
    from tests.torch_ref.minit2i import minit2i_forward_torch

    cfg = MiniT2IConfig(
        image_size=32, patch_size=8, hidden_size=64, txt_hidden_size=64,
        txt_input_size=24, cond_vec_size=32, depth_double=2,
        txt_preamble_depth=1, num_heads=4, head_dim=16, pca_channels=12,
    )
    p = init_minit2i_params(cfg, seed=0)
    rng = np.random.default_rng(13)
    x = rng.standard_normal((1, 32, 32, 3), dtype=np.float32)
    ctx = rng.standard_normal((1, 6, 24), dtype=np.float32)
    mask = np.array([[1, 1, 1, 1, 0, 0]], dtype=np.float32)

    got = np.asarray(minit2i_forward(
        p, jnp.asarray(x), None, jnp.asarray(ctx), mask=jnp.asarray(mask),
        cfg=cfg))
    with torch.no_grad():
        want = minit2i_forward_torch(
            _to_torch(p), torch.from_numpy(x), None, torch.from_numpy(ctx),
            torch.from_numpy(mask), cfg).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_boogu_matches_torch_oracle():
    from sdtpu.models.boogu import BooguConfig, boogu_forward, init_boogu_params
    from tests.torch_ref.boogu import boogu_forward_torch

    cfg = BooguConfig(
        hidden_size=64, num_layers=2, num_double_stream_layers=1,
        num_refiner_layers=1, num_heads=4, num_kv_heads=2, head_dim=16,
        multiple_of=32, instruction_feat_dim=24, in_channels=8, out_channels=8,
        axes_dim=(8, 4, 4),
    )
    p = init_boogu_params(cfg, seed=0)
    rng = np.random.default_rng(12)
    x = rng.standard_normal((1, 6, 4, 8), dtype=np.float32)
    ref = rng.standard_normal((1, 4, 4, 8), dtype=np.float32)
    t = np.array([0.3], dtype=np.float32)
    ctx = rng.standard_normal((1, 5, 24), dtype=np.float32)

    got = np.asarray(boogu_forward(
        p, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx), cfg=cfg,
        ref_latents=[jnp.asarray(ref)]))
    with torch.no_grad():
        want = boogu_forward_torch(
            _to_torch(p), torch.from_numpy(x), torch.from_numpy(t),
            torch.from_numpy(ctx), cfg,
            ref_latents=[torch.from_numpy(ref)]).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_krea2_matches_torch_oracle():
    from sdtpu.models.krea2 import Krea2Config, init_krea2_params, krea2_forward
    from tests.torch_ref.krea2 import krea2_forward_torch

    cfg = Krea2Config(
        features=64, heads=4, kv_heads=2, layers=2, timestep_dim=16,
        text_dim=32, text_heads=2, text_kv_heads=2, text_layers=3,
        in_channels=8, out_channels=8, patch_size=2,
    )
    p = init_krea2_params(cfg, seed=0)
    rng = np.random.default_rng(11)
    x = rng.standard_normal((1, 5, 6, 8), dtype=np.float32)  # odd h: pad path
    t = np.array([0.4], dtype=np.float32)
    ctx = rng.standard_normal((1, 5, 3 * 32), dtype=np.float32)

    got = np.asarray(krea2_forward(
        p, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx), cfg=cfg))
    with torch.no_grad():
        want = krea2_forward_torch(
            _to_torch(p), torch.from_numpy(x), torch.from_numpy(t),
            torch.from_numpy(ctx), cfg).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_ideogram4_matches_torch_oracle():
    from sdtpu.models.ideogram4 import (
        Ideogram4Config, ideogram4_forward, init_ideogram4_params,
    )
    from tests.torch_ref.ideogram4 import ideogram4_forward_torch

    cfg = Ideogram4Config(
        emb_dim=64, num_layers=2, num_heads=4, intermediate_size=96,
        adaln_dim=32, in_channels=16, llm_features_dim=24,
        patch_size=2, ae_channels=4, mrope_section=(4, 2, 2), llm_layers=2,
    )
    p = init_ideogram4_params(cfg, seed=0)
    rng = np.random.default_rng(10)
    x = rng.standard_normal((1, 5, 6, 16), dtype=np.float32)
    t = np.array([0.7], dtype=np.float32)
    ctx = rng.standard_normal((1, 5, 24), dtype=np.float32)

    got = np.asarray(ideogram4_forward(
        p, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx), cfg=cfg))
    with torch.no_grad():
        want = ideogram4_forward_torch(
            _to_torch(p), torch.from_numpy(x), torch.from_numpy(t),
            torch.from_numpy(ctx), cfg).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    # no-context path (separate-uncond checkpoints, prefix="")
    got_nc = np.asarray(ideogram4_forward(
        p, jnp.asarray(x), jnp.asarray(t), None, cfg=cfg))
    with torch.no_grad():
        want_nc = ideogram4_forward_torch(
            _to_torch(p), torch.from_numpy(x), torch.from_numpy(t),
            None, cfg).numpy()
    np.testing.assert_allclose(got_nc, want_nc, rtol=2e-4, atol=2e-4)


def test_lens_matches_torch_oracle():
    from sdtpu.models.lens import LensConfig, init_lens_params, lens_forward
    from tests.torch_ref.lens import lens_forward_torch

    cfg = LensConfig(
        in_channels=16, out_channels=4, num_layers=2, head_dim=16,
        num_heads=4, joint_attention_dim=24, selected_layer_count=2,
        axes_dim=(4, 6, 6),
    )
    p = init_lens_params(cfg, seed=0)
    rng = np.random.default_rng(9)
    x = rng.standard_normal((1, 6, 6, 16), dtype=np.float32)
    t = np.array([0.5], dtype=np.float32)
    ctx = rng.standard_normal((1, 7, 48), dtype=np.float32)

    got = np.asarray(lens_forward(
        p, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx), cfg=cfg))
    with torch.no_grad():
        want = lens_forward_torch(
            _to_torch(p), torch.from_numpy(x), torch.from_numpy(t),
            torch.from_numpy(ctx), cfg).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

"""Qwen-Image DiT + Qwen2.5-VL LLM text encoder (reference
src/model/diffusion/qwen_image.hpp, src/model/te/llm.hpp)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdtpu.models.llm import (
    GEMMA2_2B_CONFIG,
    LLMConfig,
    detect_llm_config,
    init_llm_params,
    llm_forward,
)
from sdtpu.models.qwen_image import (
    QwenImageConfig,
    detect_qwen_image_config,
    init_qwen_image_params,
    qwen_image_forward,
)

SMALL_LLM = LLMConfig(
    num_layers=2, hidden_size=48, intermediate_size=96, num_heads=4,
    num_kv_heads=2, head_dim=12, vocab_size=128,
)
SMALL_DIT = QwenImageConfig(
    in_channels=16, out_channels=4, num_layers=2, head_dim=16, num_heads=4,
    joint_attention_dim=48, axes_dim=(4, 6, 6),
)


def test_llm_forward_shapes_and_causality():
    p = init_llm_params(SMALL_LLM, seed=0)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 128, (1, 12), dtype=np.int32))
    h = llm_forward(p, ids, SMALL_LLM)
    assert h.shape == (1, 12, 48)
    # causal: changing a LATER token must not affect earlier hidden states
    ids2 = ids.at[0, 8].set((ids[0, 8] + 1) % 128)
    h2 = llm_forward(p, ids2, SMALL_LLM)
    np.testing.assert_allclose(np.asarray(h[:, :8]), np.asarray(h2[:, :8]), atol=1e-5)
    assert not np.allclose(np.asarray(h[:, 8:]), np.asarray(h2[:, 8:]), atol=1e-4)


def test_llm_gqa_and_qk_norm():
    cfg = LLMConfig(num_layers=1, hidden_size=48, intermediate_size=96, num_heads=4,
                    num_kv_heads=4, head_dim=12, vocab_size=64, qk_norm=True,
                    qkv_bias=False)
    p = init_llm_params(cfg, seed=1)
    ids = jnp.asarray([[1, 2, 3, 4]])
    h = llm_forward(p, ids, cfg)
    assert h.shape == (1, 4, 48)
    assert np.isfinite(np.asarray(h)).all()


def test_llm_config_detection():
    p = init_llm_params(SMALL_LLM, seed=0)
    shapes = {k: tuple(v.shape) for k, v in p.items()}
    base = detect_llm_config(p.keys(), shapes)
    assert base.num_layers == 2
    assert base.vocab_size == 128 and base.hidden_size == 48
    assert base.intermediate_size == 96


def test_qwen_image_dit_shapes():
    p = init_qwen_image_params(SMALL_DIT, seed=0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4), dtype=np.float32))
    ctx = jnp.asarray(rng.standard_normal((1, 10, 48), dtype=np.float32))
    fn = jax.jit(lambda p, x, t, c: qwen_image_forward(p, x, t, c, cfg=SMALL_DIT))
    out = fn(p, x, jnp.asarray([0.4]), ctx)
    assert out.shape == (1, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()
    # context influence
    out2 = fn(p, x, jnp.asarray([0.4]),
              jnp.asarray(rng.standard_normal((1, 10, 48), dtype=np.float32)))
    assert not np.allclose(np.asarray(out), np.asarray(out2))
    assert detect_qwen_image_config(
        [f"transformer_blocks.{i}.attn.to_q.weight" for i in range(60)]
    ).num_layers == 60


def test_qwen_image_pipeline_end_to_end():
    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.factory import create_pipeline

    pipe = create_pipeline(SDVersion.QWEN_IMAGE, small=True, seed=0)
    gp = GenerationParams(
        prompt="a fox", width=32, height=32, sample_steps=2, cfg_scale=3.0,
        sample_method="euler", schedule="simple", seed=3,
    )
    res = pipe.generate(gp)
    assert res.images.shape == (1, 32, 32, 3)
    assert res.latents.shape == (1, 4, 4, 4)
    res2 = pipe.generate(gp)
    np.testing.assert_array_equal(res.images, res2.images)


def test_layered_variant_detection_and_forward():
    """QWEN_IMAGE_LAYERED (VERDICT r1 item 10; reference qwen_image.hpp:589,
    model_loader.cpp:505): addition_t embedding + layered 5-D latent."""
    from sdtpu.config import SDVersion
    from sdtpu.io.detect import detect_version
    from sdtpu.models.qwen_image import (
        detect_qwen_image_config, init_qwen_image_params, qwen_image_forward,
    )
    import dataclasses

    names = [
        "model.diffusion_model.transformer_blocks.0.img_mod.1.weight",
        "model.diffusion_model.time_text_embed.addition_t_embedding.weight",
        "model.diffusion_model.img_in.weight",
    ]
    shapes = {"model.diffusion_model.img_in.weight": (64, 64)}
    assert detect_version(names, shapes) == SDVersion.QWEN_IMAGE_LAYERED
    # without the embedding → plain qwen_image
    assert detect_version(names[:1] + names[2:], shapes) == SDVersion.QWEN_IMAGE

    cfg = dataclasses.replace(SMALL_DIT, use_additional_t_cond=True)
    assert detect_qwen_image_config(
        ["transformer_blocks.1.attn.to_q.weight",
         "time_text_embed.addition_t_embedding.weight"]).use_additional_t_cond

    p = init_qwen_image_params(cfg, seed=0)
    assert "time_text_embed.addition_t_embedding.weight" in p
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 4, 8, 8, 4)), dtype=jnp.float32)  # 3+1 layers
    t = jnp.asarray([0.5], dtype=jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 7, 48)), dtype=jnp.float32)
    out = qwen_image_forward(p, x, t, ctx, cfg=cfg)
    assert out.shape == (1, 4, 8, 8, 4)
    assert bool(jnp.isfinite(out).all())


def test_layered_pipeline_end_to_end():
    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.factory import create_pipeline

    pipe = create_pipeline(SDVersion.QWEN_IMAGE_LAYERED, small=True, seed=0)
    assert pipe.version == SDVersion.QWEN_IMAGE_LAYERED
    gp = GenerationParams(prompt="layered cat", width=64, height=64,
                          sample_steps=2, sample_method="euler", seed=3,
                          cfg_scale=3.0)
    res = pipe.generate_video(gp, frames=4)  # 3 layers + 1 composite
    assert res.frames.shape[1] == 4  # each decoded layer is an image
    assert res.frames.shape[3:] == (64, 3)
    assert np.isfinite(res.latents).all()


def test_zero_cond_t_ref_token_modulation():
    """Qwen-Image-Edit 2509 zero_cond_t (reference qwen_image.hpp:319-343):
    ref tokens get t=0 modulation; without refs the path is a no-op."""
    import dataclasses

    from sdtpu.models.qwen_image import (
        detect_qwen_image_config, init_qwen_image_params, qwen_image_forward,
    )

    assert detect_qwen_image_config(
        ["transformer_blocks.0.attn.to_q.weight",
         "__index_timestep_zero__"]).zero_cond_t

    base_cfg = SMALL_DIT
    zc_cfg = dataclasses.replace(base_cfg, zero_cond_t=True)
    p = init_qwen_image_params(base_cfg, seed=0)
    # amplify the modulation projections so the ref-token t=0 effect is
    # visible through random 0.02-scale attention weights
    for i in range(base_cfg.num_layers):
        k = f"transformer_blocks.{i}.img_mod.1.weight"
        p[k] = p[k] * 50.0
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), dtype=jnp.float32)
    t = jnp.asarray([0.6], dtype=jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 7, 48)), dtype=jnp.float32)
    ref = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), dtype=jnp.float32)

    # no refs → all tokens are main tokens → identical output
    a = np.asarray(qwen_image_forward(p, x, t, ctx, cfg=base_cfg))
    b = np.asarray(qwen_image_forward(p, x, t, ctx, cfg=zc_cfg))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

    # with refs → ref tokens modulated at t=0 → output differs
    a = np.asarray(qwen_image_forward(p, x, t, ctx, cfg=base_cfg,
                                      ref_latents=[ref]))
    b = np.asarray(qwen_image_forward(p, x, t, ctx, cfg=zc_cfg,
                                      ref_latents=[ref]))
    assert np.abs(a - b).max() > 1e-5

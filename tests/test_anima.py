"""Anima DiT + LLM adapter tests."""
import jax.numpy as jnp
import numpy as np
import pytest

from sdtpu.models.anima import (
    AnimaConfig,
    anima_forward,
    anima_rope,
    detect_anima_config,
    init_anima_params,
    llm_adapter_forward,
)

TINY = AnimaConfig(
    in_channels=4, out_channels=4, hidden_size=32, text_embed_dim=24,
    num_heads=2, head_dim=16, num_layers=2, axes_dim=(6, 6, 4),
    adaln_lora_dim=8,
)


@pytest.fixture(scope="module")
def tiny_params():
    return init_anima_params(TINY, seed=0, adapter_layers=1, adapter_vocab=64,
                             adapter_dim=24)


def test_forward_shapes(tiny_params):
    g = np.random.default_rng(1)
    x = jnp.asarray(g.standard_normal((1, 8, 8, 4), dtype=np.float32))
    ctx = jnp.asarray(g.standard_normal((1, 12, 24), dtype=np.float32) * 0.1)
    out = anima_forward(tiny_params, x, jnp.asarray([500.0]), ctx, cfg=TINY)
    assert out.shape == (1, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_llm_adapter(tiny_params):
    g = np.random.default_rng(2)
    src = jnp.asarray(g.standard_normal((1, 9, 24), dtype=np.float32) * 0.1)
    t5_ids = jnp.asarray(np.arange(6, dtype=np.int32)[None])
    out = llm_adapter_forward(tiny_params, src, t5_ids)
    assert out.shape == (1, 6, 24)
    # changing the source states must change the adapter output (cross-attn)
    out2 = llm_adapter_forward(tiny_params, src + 1.0, t5_ids)
    assert np.abs(np.asarray(out) - np.asarray(out2)).max() > 1e-6


def test_ntk_rope_scaling():
    cos, sin = anima_rope(4, 4, TINY)
    assert cos.shape == (16, sum(TINY.axes_dim) // 2)
    # token (0,0) is identity
    np.testing.assert_allclose(np.asarray(cos)[0], 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sin)[0], 0.0, atol=1e-6)


def test_detect_config(tiny_params):
    shapes = {k: tuple(v.shape) for k, v in tiny_params.items()}
    cfg = detect_anima_config(set(tiny_params.keys()), shapes)
    assert cfg.num_layers == 2
    assert cfg.hidden_size == 32
    assert cfg.in_channels == 4
    assert cfg.head_dim == 16 and cfg.num_heads == 2
    assert cfg.text_embed_dim == 24
    assert cfg.adaln_lora_dim == 8


def test_pipeline_e2e():
    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.factory import create_pipeline

    pipe = create_pipeline(SDVersion.ANIMA, small=True, seed=0)
    res = pipe.generate(GenerationParams(
        prompt="a (corgi:1.2)", width=32, height=32, sample_steps=2,
        sample_method="euler", cfg_scale=1.0, schedule="discrete"))
    assert res.images.shape == (1, 32, 32, 3)

"""Mistral / GPT-OSS LLM arch tests: normal-style rope, YaRN, attention
sinks, MoE routing."""
import dataclasses

import jax.numpy as jnp
import numpy as np

from sdtpu.models.llm import (
    GPT_OSS_20B_CONFIG,
    MINISTRAL_33B_CONFIG,
    MISTRAL_SMALL_32_CONFIG,
    _moe_mlp,
    _neox_rope,
    _sink_attention,
    init_llm_params,
    llm_forward,
)

TINY_OSS = dataclasses.replace(
    GPT_OSS_20B_CONFIG, num_layers=2, hidden_size=16, intermediate_size=8,
    num_heads=2, num_kv_heads=1, head_dim=8, vocab_size=64,
    num_experts=4, num_experts_per_tok=2, sliding_attention=(4, 0),
)
TINY_MISTRAL = dataclasses.replace(
    MISTRAL_SMALL_32_CONFIG, num_layers=2, hidden_size=16,
    intermediate_size=32, num_heads=2, num_kv_heads=1, head_dim=8,
    vocab_size=64)


def test_mistral_forward():
    p = init_llm_params(TINY_MISTRAL, seed=0)
    ids = jnp.asarray(np.arange(7, dtype=np.int32)[None])
    h = llm_forward(p, ids, TINY_MISTRAL)
    assert h.shape == (1, 7, 16)
    assert np.isfinite(np.asarray(h)).all()


def test_gpt_oss_forward_with_moe_and_sinks():
    p = init_llm_params(TINY_OSS, seed=0)
    assert "model.layers.0.self_attn.sinks" in p
    assert "model.layers.0.mlp.router.weight" in p
    assert "model.layers.0.mlp.experts.gate_up_proj.weight" in p
    ids = jnp.asarray(np.arange(9, dtype=np.int32)[None])
    h = llm_forward(p, ids, TINY_OSS)
    assert h.shape == (1, 9, 16)
    assert np.isfinite(np.asarray(h)).all()


def test_rope_normal_vs_neox_differ():
    g = np.random.default_rng(0)
    x = jnp.asarray(g.standard_normal((1, 2, 5, 8), dtype=np.float32))
    pos = jnp.arange(5)
    a = _neox_rope(x, pos, 1e4, style="neox")
    b = _neox_rope(x, pos, 1e4, style="normal")
    # position 0 is identity for both
    np.testing.assert_allclose(np.asarray(a[:, :, 0]), np.asarray(x[:, :, 0]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(b[:, :, 0]), np.asarray(x[:, :, 0]),
                               atol=1e-6)
    # rotation norms are preserved
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(a), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1), rtol=1e-5)
    assert np.abs(np.asarray(a[:, :, 1:]) - np.asarray(b[:, :, 1:])).max() > 1e-4


def test_yarn_rope_changes_high_freq_only_slightly():
    g = np.random.default_rng(1)
    x = jnp.asarray(g.standard_normal((1, 1, 8, 64), dtype=np.float32))
    pos = jnp.arange(8)
    plain = _neox_rope(x, pos, 150000.0, 1.0)
    yarn = _neox_rope(x, pos, 150000.0, 32.0, yarn=True, orig_ctx=4096)
    # YaRN rescales by the attention mscale; outputs differ but stay finite
    assert np.isfinite(np.asarray(yarn)).all()
    assert np.abs(np.asarray(yarn) - np.asarray(plain)).max() > 1e-4


def test_sink_attention_reduces_mass():
    """With a very large sink logit attention output shrinks toward zero
    (the sink absorbs probability mass)."""
    g = np.random.default_rng(2)
    q = jnp.asarray(g.standard_normal((1, 2, 4, 8), dtype=np.float32))
    k = jnp.asarray(g.standard_normal((1, 2, 4, 8), dtype=np.float32))
    v = jnp.asarray(g.standard_normal((1, 2, 4, 8), dtype=np.float32))
    small = _sink_attention(q, k, v, None, jnp.asarray([-100.0, -100.0]))
    big = _sink_attention(q, k, v, None, jnp.asarray([100.0, 100.0]))
    assert np.abs(np.asarray(big)).max() < 1e-3
    # tiny sink ≈ plain softmax attention
    from sdtpu.ops import attention

    plain = attention(q, k, v, flash=False)
    np.testing.assert_allclose(np.asarray(small), np.asarray(plain),
                               rtol=1e-4, atol=1e-5)


def test_moe_top1_matches_single_expert():
    """With k=1 routing, the output equals running the selected expert's
    clamped-swiglu MLP alone."""
    cfg = dataclasses.replace(TINY_OSS, num_experts=2, num_experts_per_tok=1)
    g = np.random.default_rng(3)
    hid, it, e = 6, 4, 2
    p = {
        "mlp.router.weight": jnp.asarray(g.standard_normal((e, hid), dtype=np.float32)),
        "mlp.router.bias": jnp.zeros((e,), jnp.float32),
        "mlp.experts.gate_up_proj.weight": jnp.asarray(
            g.standard_normal((e, 2 * it, hid), dtype=np.float32) * 0.3),
        "mlp.experts.gate_up_proj.bias": jnp.zeros((e, 2 * it), jnp.float32),
        "mlp.experts.down_proj.weight": jnp.asarray(
            g.standard_normal((e, hid, it), dtype=np.float32) * 0.3),
        "mlp.experts.down_proj.bias": jnp.zeros((e, hid), jnp.float32),
    }
    x = jnp.asarray(g.standard_normal((1, 3, hid), dtype=np.float32))
    cfg1 = dataclasses.replace(cfg, hidden_size=hid, intermediate_size=it)
    out = np.asarray(_moe_mlp(p, "mlp", x, cfg1))

    logits = np.asarray(x) @ np.asarray(p["mlp.router.weight"]).T
    sel = logits.argmax(-1)  # [1, 3]
    for t in range(3):
        ei = sel[0, t]
        guw = np.asarray(p["mlp.experts.gate_up_proj.weight"])[ei]
        gu = np.asarray(x)[0, t] @ guw.T
        gate, up = gu[0::2], gu[1::2]
        gclip = np.minimum(gate, 7.0)
        uclip = np.clip(up, -7.0, 7.0)
        act = (uclip + 1.0) * (gclip / (1.0 + np.exp(-1.702 * gclip)))
        ref = act @ np.asarray(p["mlp.experts.down_proj.weight"])[ei].T
        np.testing.assert_allclose(out[0, t], ref, rtol=1e-4, atol=1e-5)


def test_detect_arch_defaults():
    from sdtpu.models.llm import detect_llm_config

    p = init_llm_params(TINY_OSS, seed=0)
    shapes = {k: tuple(v.shape) for k, v in p.items()}
    cfg = detect_llm_config(set(p.keys()), shapes, arch="gpt_oss_20b")
    assert cfg.num_layers == 2
    assert cfg.attention_sinks and cfg.rope_yarn
    assert cfg.num_experts == 4 or cfg.num_experts == 32  # base default kept

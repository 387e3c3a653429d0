"""HunyuanVideo byt5 glyph branch (reference hunyuan.hpp:137,317,452 +
conditioner.hpp:1828,2662): quoted prompt text encoded by byt5-small joins
the text stream through the ByT5Mapper, with cond-type embedding rows
tagging refiner vs glyph tokens."""
import numpy as np
import pytest

import jax.numpy as jnp

from sdtpu.conditioning.conditioner import byt5_tokenize, extract_quoted_texts


def test_extract_quoted_texts():
    """collect_quoted semantics (conditioner.hpp:2663-2677): straight double
    quotes plus the unicode single/double pairs; unterminated quotes drop."""
    assert extract_quoted_texts('a sign saying "HELLO" and "WORLD"') == [
        "HELLO", "WORLD"]
    assert extract_quoted_texts("neon ‘open’ sign") == ["open"]
    assert extract_quoted_texts("a “fancy” label") == ["fancy"]
    assert extract_quoted_texts("no quotes here") == []
    assert extract_quoted_texts('dangling "quote') == []


def test_byt5_tokenize():
    """byte+3 shift with EOS=1 (conditioner.hpp:2686-2689)."""
    toks = byt5_tokenize(["Hi"])
    want_text = 'Text "Hi". '
    assert toks == [b + 3 for b in want_text.encode()] + [1]


def test_byt5_mapper_and_cond_type_in_forward():
    """use_byt5 forward: glyph states change the output; the mapper math
    equals the manual LayerNorm→fc1→gelu→fc2→gelu→fc3 chain."""
    from sdtpu.models.hunyuan import (
        HunyuanVideoConfig,
        _byt5_mapper,
        hunyuan_forward,
        init_hunyuan_params,
    )

    cfg = HunyuanVideoConfig(
        in_channels=4, out_channels=4, hidden_size=64, context_in_dim=48,
        num_heads=2, depth=2, axes_dim=(8, 12, 12), refiner_depth=1,
        use_byt5=True, byt5_in_dim=16, use_cond_type_embedding=True,
    )
    p = init_hunyuan_params(cfg, seed=0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 3, 8, 8, 4)), jnp.float32)
    t = jnp.asarray([500.0], jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 12, 48)), jnp.float32)
    byt5 = jnp.asarray(rng.standard_normal((1, 5, 16)), jnp.float32)

    out_none = np.asarray(hunyuan_forward(p, x, t, ctx, cfg=cfg))
    out_b = np.asarray(hunyuan_forward(p, x, t, ctx, cfg=cfg,
                                       context_byt5=byt5))
    assert out_b.shape == out_none.shape
    assert np.abs(out_b - out_none).max() > 1e-5

    # mapper math vs manual chain
    got = np.asarray(_byt5_mapper(p, byt5))
    xb = np.asarray(byt5, np.float64)
    mu = xb.mean(-1, keepdims=True)
    var = xb.var(-1, keepdims=True)
    h = (xb - mu) / np.sqrt(var + 1e-5)
    h = h * np.asarray(p["byt5_in.layernorm.weight"], np.float64) \
        + np.asarray(p["byt5_in.layernorm.bias"], np.float64)

    def gelu(z):
        return 0.5 * z * (1 + np.tanh(np.sqrt(2 / np.pi) * (z + 0.044715 * z**3)))

    h = gelu(h @ np.asarray(p["byt5_in.fc1.weight"], np.float64).T
             + np.asarray(p["byt5_in.fc1.bias"], np.float64))
    h = gelu(h @ np.asarray(p["byt5_in.fc2.weight"], np.float64).T
             + np.asarray(p["byt5_in.fc2.bias"], np.float64))
    h = h @ np.asarray(p["byt5_in.fc3.weight"], np.float64).T \
        + np.asarray(p["byt5_in.fc3.bias"], np.float64)
    np.testing.assert_allclose(got, h, rtol=1e-4, atol=1e-4)


def test_detect_byt5_from_names():
    from sdtpu.models.hunyuan import detect_hunyuan_config

    names = ["double_blocks.0.img_mod.lin.weight", "byt5_in.fc1.weight",
             "cond_type_embedding.weight", "img_in.proj.weight"]
    shapes = {"byt5_in.fc1.weight": (2048, 1472),
              "img_in.proj.weight": (2048, 65, 1, 2, 2)}
    cfg = detect_hunyuan_config(names, shapes)
    assert cfg.use_byt5 and cfg.use_cond_type_embedding
    assert cfg.byt5_in_dim == 1472


def test_hunyuan_pipeline_byt5_end_to_end():
    """Full pipeline: a quoted prompt routes byt5 glyph states into the DiT
    (latents change vs the unquoted prompt); CFG exercises the branch-split
    (cond, uncond) extras tuple."""
    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.factory import create_pipeline
    from sdtpu.models.t5 import T5Config, init_t5_params

    t5_cfg = T5Config(vocab_size=384, d_model=16, d_kv=8, d_ff=32,
                      num_layers=1, num_heads=2)
    t5_params = init_t5_params(t5_cfg, seed=7)
    pipe = create_pipeline(SDVersion.HUNYUAN_VIDEO, small=True, seed=0,
                           params={"t5": t5_params})
    assert pipe.conditioner.byt5_params is not None

    kw = dict(width=32, height=32, sample_steps=2, sample_method="euler",
              seed=3, cfg_scale=1.0)
    plain = pipe.generate_video(
        GenerationParams(prompt="a cat", **kw), frames=3).latents
    quoted = pipe.generate_video(
        GenerationParams(prompt='a cat with a sign saying "MEOW"', **kw),
        frames=3).latents
    assert np.abs(quoted - plain).max() > 1e-6

    # cfg>1: cond carries glyph tokens, uncond does not → tuple extras path
    res = pipe.generate_video(
        GenerationParams(prompt='a "X" sign', negative_prompt="blurry",
                         **{**kw, "cfg_scale": 4.0}),
        frames=3)
    assert res.latents.shape == plain.shape

"""TAESD decode/encode shapes + LoRA merge math."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdtpu.models.lora import apply_lora, group_lora_tensors, lora_delta
from sdtpu.models.tae import (
    TAESD_CONFIG,
    convert_taesd_name,
    init_tae_params,
    tae_decode,
    tae_encode,
)


def test_tae_decode_shape():
    p = init_tae_params()
    z = jnp.asarray(np.random.default_rng(0).standard_normal((1, 8, 8, 4)), dtype=jnp.float32)
    out = jax.jit(lambda p, z: tae_decode(p, z))(p, z)
    assert out.shape == (1, 64, 64, 3)
    assert bool(jnp.isfinite(out).all())


def test_tae_encode_shape():
    p = init_tae_params()
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 64, 64, 3)), dtype=jnp.float32)
    z = jax.jit(lambda p, x: tae_encode(p, x))(p, x)
    assert z.shape == (1, 8, 8, 4)


def test_tae_param_count():
    # taesd has ~1.2M params per tower
    p = init_tae_params()
    n = sum(int(np.prod(v.shape)) for v in p.values())
    assert 2_000_000 < n < 3_000_000, n


def test_taesd_name_conversion():
    assert convert_taesd_name("decoder.1.weight") == "decoder.layers.0.weight"
    assert convert_taesd_name("decoder.3.conv.0.weight") == "decoder.layers.2.conv.0.weight"
    assert convert_taesd_name("encoder.0.weight") == "encoder.layers.0.weight"
    assert convert_taesd_name("encoder.14.bias") == "encoder.layers.14.bias"


def test_lora_group_and_delta():
    rng = np.random.default_rng(0)
    down = rng.standard_normal((4, 16)).astype(np.float32)
    up = rng.standard_normal((16, 4)).astype(np.float32)
    tensors = {
        "lora_unet_foo_bar.lora_down.weight": down,
        "lora_unet_foo_bar.lora_up.weight": up,
        "lora_unet_foo_bar.alpha": np.asarray(2.0, dtype=np.float32),
    }
    groups = group_lora_tensors(tensors)
    assert "lora_unet_foo_bar" in groups
    delta = lora_delta(groups["lora_unet_foo_bar"], multiplier := 0.5)
    want = (up @ down) * (0.5 * 2.0 / 4)
    np.testing.assert_allclose(delta, want, rtol=1e-6)


def test_apply_lora_kohya_to_unet():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((16, 16)).astype(np.float32)
    params = {
        "diffusion": {
            "input_blocks.1.1.transformer_blocks.0.attn1.to_q.weight": jnp.asarray(w)
        }
    }
    down = rng.standard_normal((2, 16)).astype(np.float32)
    up = rng.standard_normal((16, 2)).astype(np.float32)
    lora = {
        "lora_unet_input_blocks_1_1_transformer_blocks_0_attn1_to_q.lora_down.weight": down,
        "lora_unet_input_blocks_1_1_transformer_blocks_0_attn1_to_q.lora_up.weight": up,
        "lora_unet_input_blocks_1_1_transformer_blocks_0_attn1_to_q.alpha": np.float32(2.0),
    }
    applied, total = apply_lora(params, lora, multiplier=1.0)
    assert (applied, total) == (1, 1)
    want = w + (up @ down) * (2.0 / 2)
    np.testing.assert_allclose(
        np.asarray(params["diffusion"]["input_blocks.1.1.transformer_blocks.0.attn1.to_q.weight"]),
        want,
        rtol=1e-5,
    )


def test_apply_lora_conv():
    rng = np.random.default_rng(2)
    w = rng.standard_normal((8, 4, 3, 3)).astype(np.float32)
    params = {"diffusion": {"input_blocks.0.0.weight": jnp.asarray(w)}}
    down = rng.standard_normal((2, 4, 3, 3)).astype(np.float32)
    up = rng.standard_normal((8, 2, 1, 1)).astype(np.float32)
    lora = {
        "lora_unet_input_blocks_0_0.lora_down.weight": down,
        "lora_unet_input_blocks_0_0.lora_up.weight": up,
    }
    applied, _ = apply_lora(params, lora)
    assert applied == 1
    want = w + (up.reshape(8, 2) @ down.reshape(2, -1)).reshape(8, 4, 3, 3) * (2.0 / 2)
    np.testing.assert_allclose(np.asarray(params["diffusion"]["input_blocks.0.0.weight"]), want, rtol=1e-5)


def test_apply_lora_te():
    rng = np.random.default_rng(3)
    w = rng.standard_normal((8, 8)).astype(np.float32)
    params = {
        "clip_l": {"text_model.encoder.layers.0.self_attn.q_proj.weight": jnp.asarray(w)},
        "diffusion": {},
    }
    down = rng.standard_normal((2, 8)).astype(np.float32)
    up = rng.standard_normal((8, 2)).astype(np.float32)
    lora = {
        "lora_te_text_model_encoder_layers_0_self_attn_q_proj.lora_down.weight": down,
        "lora_te_text_model_encoder_layers_0_self_attn_q_proj.lora_up.weight": up,
    }
    applied, _ = apply_lora(params, lora)
    assert applied == 1


def test_runtime_lora_on_quantized_weights():
    """LoRA over int8 weights attaches runtime factors (never merged into the
    quantized base) and matches the dense-merge result within quantization
    error (reference at_runtime mode, lora.hpp:897)."""
    import numpy as np

    import jax.numpy as jnp

    from sdtpu.ops import linear
    from sdtpu.ops.quant import QuantLoraTensor, quantize_per_channel
    from sdtpu.models.lora import apply_lora

    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 96)).astype(np.float32) * 0.05
    down = rng.standard_normal((4, 96)).astype(np.float32) * 0.1
    up = rng.standard_normal((64, 4)).astype(np.float32) * 0.1
    lora = {
        "lora_unet_blk_proj.lora_down.weight": down,
        "lora_unet_blk_proj.lora_up.weight": up,
        "lora_unet_blk_proj.alpha": np.asarray([4.0], np.float32),
    }

    params = {"diffusion": {"blk.proj.weight": quantize_per_channel(w)}}
    applied, total = apply_lora(params, lora, multiplier=0.7)
    assert applied == 1
    qt = params["diffusion"]["blk.proj.weight"]
    assert isinstance(qt, QuantLoraTensor)

    x = jnp.asarray(rng.standard_normal((8, 96)), dtype=jnp.float32)
    got = np.asarray(linear(x, qt))
    ref = np.asarray(x) @ (w + 0.7 * up @ down).T
    rel = np.abs(got - ref).mean() / np.abs(ref).mean()
    assert rel < 0.02, rel

    # stacking a second LoRA concatenates ranks
    applied, _ = apply_lora(params, lora, multiplier=0.3)
    qt2 = params["diffusion"]["blk.proj.weight"]
    assert qt2.lora_down.shape[0] == 8
    got2 = np.asarray(linear(x, qt2))
    ref2 = np.asarray(x) @ (w + 1.0 * up @ down).T
    rel2 = np.abs(got2 - ref2).mean() / np.abs(ref2).mean()
    assert rel2 < 0.02, rel2


def test_loha_delta():
    """LoHa: (w1_a@w1_b) ⊙ (w2_a@w2_b) * alpha/rank (reference
    get_loha_weight_diff, lora.hpp:302)."""
    import numpy as np

    from sdtpu.models.lora import group_lora_tensors, lora_delta

    g = np.random.default_rng(0)
    t = {
        "lora.m.hada_w1_a.weight": g.standard_normal((6, 2), dtype=np.float32),
        "lora.m.hada_w1_b.weight": g.standard_normal((2, 4), dtype=np.float32),
        "lora.m.hada_w2_a.weight": g.standard_normal((6, 2), dtype=np.float32),
        "lora.m.hada_w2_b.weight": g.standard_normal((2, 4), dtype=np.float32),
        "lora.m.alpha": np.asarray(2.0, dtype=np.float32),
    }
    d = lora_delta(group_lora_tensors(t)["lora.m"], 1.0)
    want = (t["lora.m.hada_w1_a.weight"] @ t["lora.m.hada_w1_b.weight"]) * \
           (t["lora.m.hada_w2_a.weight"] @ t["lora.m.hada_w2_b.weight"])
    np.testing.assert_allclose(d, want, atol=1e-5)


def test_lokr_delta():
    """LoKr: kron(w1, w2) * alpha/rank with optionally factored halves
    (reference get_lokr_weight_diff, lora.hpp:405)."""
    import numpy as np

    from sdtpu.models.lora import group_lora_tensors, lora_delta

    g = np.random.default_rng(1)
    w1 = g.standard_normal((3, 2), dtype=np.float32)
    t = {
        "lora.k.lokr_w1": w1,
        "lora.k.lokr_w2_a.weight": g.standard_normal((4, 2), dtype=np.float32),
        "lora.k.lokr_w2_b.weight": g.standard_normal((2, 5), dtype=np.float32),
        "lora.k.alpha": np.asarray(1.0, dtype=np.float32),
    }
    d = lora_delta(group_lora_tensors(t)["lora.k"], 1.0)
    w2 = t["lora.k.lokr_w2_a.weight"] @ t["lora.k.lokr_w2_b.weight"]
    np.testing.assert_allclose(d, np.kron(w1, w2) * 0.5, atol=1e-5)


def test_lora_epochs_rederive_from_base():
    """Active-set changes re-derive from the pristine base (reference LoRA
    epochs, model_manager.h:73-88) — merges never accumulate."""
    import jax.numpy as jnp

    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.factory import create_pipeline

    pipe = create_pipeline(SDVersion.SD1, small=True, seed=0)
    key = "input_blocks.1.1.transformer_blocks.0.attn1.to_q.weight"
    base_w = np.asarray(pipe.diffusion_params[key]).copy()
    r, (o, i) = 2, pipe.diffusion_params[key].shape
    rng = np.random.default_rng(0)
    down = rng.standard_normal((r, i)).astype(np.float32)
    up = rng.standard_normal((o, r)).astype(np.float32)
    lora = {
        "lora_unet_input_blocks_1_1_transformer_blocks_0_attn1_to_q.lora_down.weight": down,
        "lora_unet_input_blocks_1_1_transformer_blocks_0_attn1_to_q.lora_up.weight": up,
    }

    pipe.set_loras([(lora, 0.5)])
    w_half = np.asarray(pipe.diffusion_params[key])
    np.testing.assert_allclose(w_half, base_w + 0.5 * (up @ down), rtol=2e-3, atol=2e-3)

    # changing the multiplier re-derives from base (NOT base + 0.5 + 1.0)
    pipe.set_loras([(lora, 1.0)])
    w_full = np.asarray(pipe.diffusion_params[key])
    np.testing.assert_allclose(w_full, base_w + up @ down, rtol=2e-3, atol=2e-3)

    # empty set restores the base
    pipe.set_loras([])
    np.testing.assert_allclose(
        np.asarray(pipe.diffusion_params[key]), base_w, rtol=1e-6)

    res = pipe.generate(GenerationParams(prompt="x", width=64, height=64,
                                         sample_steps=2, sample_method="euler"))
    assert np.isfinite(res.latents).all()

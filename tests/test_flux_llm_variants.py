"""Ovis-Image and LongCat-Image flux-variant tests."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from sdtpu.models.flux import (
    LONGCAT_CONFIG,
    OVIS_IMAGE_CONFIG,
    flux_forward,
    init_flux_params,
)

TINY_OVIS = dataclasses.replace(
    OVIS_IMAGE_CONFIG, in_channels=16, hidden_size=64, num_heads=2, depth=2,
    depth_single=2, axes_dim=(8, 12, 12), context_in_dim=24)
TINY_LONGCAT = dataclasses.replace(
    LONGCAT_CONFIG, in_channels=16, hidden_size=64, num_heads=2, depth=2,
    depth_single=2, axes_dim=(8, 12, 12), context_in_dim=24)


def test_ovis_yak_weights_and_forward():
    p = init_flux_params(TINY_OVIS, seed=0)
    # yak MLP: separate gate/up/down instead of fused mlp.0/mlp.2
    assert "double_blocks.0.img_mlp.gate_proj.weight" in p
    assert "double_blocks.0.img_mlp.0.weight" not in p
    # semantic txt norm over the raw context width
    assert p["txt_norm.weight"].shape == (24,)
    # single-block linear1 emits 3*hid + 2*mlp_hidden for the swiglu split
    assert p["single_blocks.0.linear1.weight"].shape[0] == 3 * 64 + 2 * 256

    g = np.random.default_rng(1)
    x = jnp.asarray(g.standard_normal((1, 8, 8, 4), dtype=np.float32))
    ctx = jnp.asarray(g.standard_normal((1, 7, 24), dtype=np.float32) * 0.1)
    out = flux_forward(p, x, jnp.asarray([0.5]), ctx, None, cfg=TINY_OVIS)
    assert out.shape == (1, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_longcat_rope_and_forward():
    p = init_flux_params(TINY_LONGCAT, seed=0)
    assert "txt_norm.weight" not in p
    g = np.random.default_rng(2)
    x = jnp.asarray(g.standard_normal((1, 8, 8, 4), dtype=np.float32))
    ctx = jnp.asarray(g.standard_normal((1, 7, 24), dtype=np.float32) * 0.1)
    out = flux_forward(p, x, jnp.asarray([0.5]), ctx, None, cfg=TINY_LONGCAT)
    assert out.shape == (1, 8, 8, 4)
    # longcat rope differs from default zeros-txt rope: same weights with
    # the flag off must produce different output
    out2 = flux_forward(p, x, jnp.asarray([0.5]), ctx, None,
                        cfg=dataclasses.replace(TINY_LONGCAT, longcat_rope=False))
    assert np.abs(np.asarray(out) - np.asarray(out2)).max() > 1e-6


def test_ovis_conditioner_pads_and_masks():
    import jax

    from sdtpu.conditioning.conditioner import OvisImageConditioner
    from sdtpu.models import llm as llm_mod

    cfg = dataclasses.replace(
        llm_mod.QWEN3_8B_CONFIG, num_layers=2, hidden_size=16,
        intermediate_size=32, num_heads=2, num_kv_heads=1, head_dim=8,
        vocab_size=64)
    p = llm_mod.init_llm_params(cfg, seed=0)
    cond = OvisImageConditioner(None, p, cfg, content_len=16)
    res = cond.get_learned_condition("x")
    # dummy path: 12 ids, start 3, padded to 3+16 → 16 content tokens
    assert res.c_crossattn.shape == (1, 16, 16)
    # reference masks pad KEYS (conditioner.hpp:1995-2009): changing a pad
    # token's id may change that position's own state (its query changes)
    # but must not leak into any other position
    ids = np.asarray([list(range(12)) + [0] * 7], dtype=np.int32)
    ids2 = ids.copy()
    ids2[0, 14] = 33  # change a PAD token
    mask = np.asarray([[1.0] * 12 + [0.0] * 7], dtype=np.float32)
    h1 = cond._jit_forward(p, jnp.asarray(ids), jnp.asarray(mask))
    h2 = cond._jit_forward(p, jnp.asarray(ids2), jnp.asarray(mask))
    keep = [i for i in range(19) if i != 14]
    np.testing.assert_allclose(np.asarray(h1[:, keep]), np.asarray(h2[:, keep]),
                               atol=1e-6)


@pytest.mark.parametrize("version_name", ["ovis", "longcat"])
def test_pipeline_e2e(version_name):
    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.factory import create_pipeline

    pipe = create_pipeline(SDVersion(version_name), small=True, seed=0)
    res = pipe.generate(GenerationParams(
        prompt="a corgi", width=32, height=32, sample_steps=2,
        sample_method="euler", cfg_scale=1.0))
    assert res.images.shape == (1, 32, 32, 3)


def test_detect_versions():
    from sdtpu.config import SDVersion
    from sdtpu.io.detect import detect_version

    p = init_flux_params(TINY_OVIS, seed=0)
    shapes = {k: tuple(v.shape) for k, v in p.items()}
    assert detect_version(p.keys(), shapes) == SDVersion.OVIS

    p = init_flux_params(
        dataclasses.replace(TINY_LONGCAT, context_in_dim=3584), seed=0)
    shapes = {k: tuple(v.shape) for k, v in p.items()}
    assert detect_version(p.keys(), shapes) == SDVersion.LONGCAT

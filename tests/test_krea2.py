"""Krea2 (Flux-Krea-2) DiT tests."""
import jax.numpy as jnp
import numpy as np
import pytest

from sdtpu.models.krea2 import (
    Krea2Config,
    detect_krea2_config,
    init_krea2_params,
    krea2_forward,
    krea2_text_fusion,
)

TINY = Krea2Config(
    in_channels=4, out_channels=4, features=32, timestep_dim=16,
    text_dim=24, text_layers=3, layers=2, heads=4, kv_heads=2,
    text_heads=2, text_kv_heads=2, mlp_multiplier=2,
)


@pytest.fixture(scope="module")
def tiny_params():
    return init_krea2_params(TINY, seed=0)


def test_forward_shapes(tiny_params):
    g = np.random.default_rng(1)
    x = jnp.asarray(g.standard_normal((2, 8, 8, 4), dtype=np.float32))
    ctx = jnp.asarray(
        g.standard_normal((2, 7, TINY.text_layers * TINY.text_dim),
                          dtype=np.float32) * 0.1)
    out = krea2_forward(tiny_params, x, jnp.asarray([0.5, 0.9]), ctx, cfg=TINY)
    assert out.shape == (2, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_odd_size_padding(tiny_params):
    g = np.random.default_rng(2)
    x = jnp.asarray(g.standard_normal((1, 7, 5, 4), dtype=np.float32))
    ctx = jnp.asarray(
        g.standard_normal((1, 4, TINY.text_layers * TINY.text_dim),
                          dtype=np.float32) * 0.1)
    out = krea2_forward(tiny_params, x, jnp.asarray([0.5]), ctx, cfg=TINY)
    assert out.shape == (1, 7, 5, 4)


def test_text_fusion_mixes_layers(tiny_params):
    """The fusion transformer attends across the LAYER axis per token, then
    projects [layers] -> 1: changing any single input layer must change the
    fused output, and the output has one feature vector per token."""
    g = np.random.default_rng(3)
    base = g.standard_normal((1, 5, TINY.text_layers * TINY.text_dim),
                             dtype=np.float32) * 0.1
    fused = krea2_text_fusion(tiny_params, jnp.asarray(base), TINY)
    assert fused.shape == (1, 5, TINY.text_dim)
    # perturb only the LAST layer's slice of token 0
    pert = base.copy()
    pert[0, 0, -TINY.text_dim:] += 1.0
    fused2 = krea2_text_fusion(tiny_params, jnp.asarray(pert), TINY)
    assert np.abs(np.asarray(fused2) - np.asarray(fused)).max() > 1e-5


def test_krea_rms_is_one_plus_weight(tiny_params):
    """KreaRMSNorm with zero-init scale must behave as plain unit-gain
    RMSNorm (scale = 1 + w, reference krea2.hpp KreaRMSNorm)."""
    from sdtpu.models.krea2 import _krea_rms

    x = jnp.asarray(np.random.default_rng(4).standard_normal(
        (2, 3, TINY.features), dtype=np.float32))
    y = _krea_rms({"n.scale": jnp.zeros((TINY.features,))}, "n.scale", x)
    expected = x / jnp.sqrt(jnp.mean(x * x, axis=-1, keepdims=True) + 1e-5)
    np.testing.assert_allclose(np.asarray(y), np.asarray(expected),
                               rtol=2e-5, atol=2e-5)


def test_detect_config(tiny_params):
    shapes = {k: tuple(v.shape) for k, v in tiny_params.items()}
    cfg = detect_krea2_config(set(tiny_params.keys()), shapes)
    assert cfg.features == 32
    assert cfg.in_channels == 4 and cfg.out_channels == 4
    assert cfg.layers == 2
    assert cfg.heads == 4 and cfg.kv_heads == 2
    assert cfg.text_dim == 24 and cfg.text_layers == 3
    assert cfg.text_heads == 2 and cfg.text_kv_heads == 2


def test_pipeline_e2e():
    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.factory import create_pipeline

    pipe = create_pipeline(SDVersion.KREA2, small=True, seed=0)
    res = pipe.generate(GenerationParams(
        prompt="a corgi", width=32, height=32, sample_steps=2,
        sample_method="euler", cfg_scale=1.0))
    assert res.images.shape == (1, 32, 32, 3)

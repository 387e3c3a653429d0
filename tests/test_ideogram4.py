"""Ideogram4 DiT tests."""
import jax.numpy as jnp
import numpy as np
import pytest

from sdtpu.models.ideogram4 import (
    Ideogram4Config,
    detect_ideogram4_config,
    ideogram4_forward,
    ideogram4_rope,
    init_ideogram4_params,
)

TINY = Ideogram4Config(
    emb_dim=32, num_layers=2, num_heads=4, intermediate_size=64,
    adaln_dim=16, in_channels=16, llm_features_dim=72, ae_channels=4,
    llm_layers=3, mrope_section=(2, 1, 1),
)


@pytest.fixture(scope="module")
def tiny_params():
    return init_ideogram4_params(TINY, seed=0)


def test_forward_shapes(tiny_params):
    g = np.random.default_rng(1)
    x = jnp.asarray(g.standard_normal((1, 4, 4, 16), dtype=np.float32))
    ctx = jnp.asarray(g.standard_normal((1, 9, 72), dtype=np.float32) * 0.1)
    out = ideogram4_forward(tiny_params, x, jnp.asarray([500.0]), ctx, cfg=TINY)
    assert out.shape == (1, 4, 4, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_uncond_model_prefix():
    p = init_ideogram4_params(TINY, seed=0)
    p.update(init_ideogram4_params(TINY, seed=1, prefix="uncond."))
    g = np.random.default_rng(2)
    x = jnp.asarray(g.standard_normal((1, 4, 4, 16), dtype=np.float32))
    a = ideogram4_forward(p, x, jnp.asarray([400.0]), None, cfg=TINY)
    b = ideogram4_forward(p, x, jnp.asarray([400.0]), None, cfg=TINY,
                          prefix="uncond.")
    assert a.shape == b.shape == (1, 4, 4, 16)
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-5


def test_mrope_axis_interleave():
    """Frequency slots cycle (t, h, w); slot 0 is axis 0, slots 1/2 are axes
    1/2 within the section bound."""
    cos, sin = ideogram4_rope(2, 2, 3, TINY)
    hd = TINY.emb_dim // TINY.num_heads  # 8 -> half 4
    assert cos.shape == (3 + 4, 4)
    s = np.asarray(sin)
    # text tokens use position=i on every axis; img token (0,0) has
    # positions (65536, 65536, 65536) -> all slots rotate hugely
    assert abs(s[3, 0]) <= 1.0
    # image tokens at different grid rows differ in slot 1 (axis 1)
    assert abs(s[3, 1] - s[3 + 2, 1]) > 1e-6 or abs(np.asarray(cos)[3, 1] - np.asarray(cos)[3 + 2, 1]) > 1e-6


def test_detect_config(tiny_params):
    shapes = {k: tuple(v.shape) for k, v in tiny_params.items()}
    cfg = detect_ideogram4_config(set(tiny_params.keys()), shapes)
    assert cfg.num_layers == 2
    assert cfg.emb_dim == 32
    assert cfg.num_heads == 4
    assert cfg.llm_features_dim == 72
    assert cfg.adaln_dim == 16


def test_pipeline_e2e():
    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.factory import create_pipeline

    pipe = create_pipeline(SDVersion.IDEOGRAM4, small=True, seed=0)
    res = pipe.generate(GenerationParams(
        prompt="a corgi", width=64, height=64, sample_steps=2,
        sample_method="euler", cfg_scale=1.0, schedule="discrete"))
    assert res.images.shape == (1, 64, 64, 3)

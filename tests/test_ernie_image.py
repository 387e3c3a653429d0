"""ERNIE-Image DiT tests."""
import jax.numpy as jnp
import numpy as np
import pytest

from sdtpu.models.ernie_image import (
    ErnieImageConfig,
    detect_ernie_config,
    ernie_image_forward,
    ernie_rope,
    init_ernie_params,
)

TINY = ErnieImageConfig(
    hidden_size=32, num_heads=4, num_layers=2, ffn_hidden_size=64,
    in_channels=16, out_channels=16, text_in_dim=24, axes_dim=(4, 2, 2),
)


@pytest.fixture(scope="module")
def tiny_params():
    return init_ernie_params(TINY, seed=0)


def test_forward_shapes(tiny_params):
    g = np.random.default_rng(1)
    x = jnp.asarray(g.standard_normal((1, 4, 4, 16), dtype=np.float32))
    ctx = jnp.asarray(g.standard_normal((1, 7, 24), dtype=np.float32) * 0.1)
    out = ernie_image_forward(tiny_params, x, jnp.asarray([500.0]), ctx, cfg=TINY)
    assert out.shape == (1, 4, 4, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_rope_layout():
    cos, sin = ernie_rope(2, 3, 4, TINY)
    s = 2 * 3 + 4
    hd = TINY.hidden_size // TINY.num_heads  # 8
    assert cos.shape == (s, hd)
    # duplicated-adjacent: cos[:, 2i] == cos[:, 2i+1]
    c = np.asarray(cos)
    np.testing.assert_array_equal(c[:, 0::2], c[:, 1::2])
    # image axis0 is constant n_txt; text axis0 counts up -> first angle of
    # token n_img+1 differs from n_img+0
    sn = np.asarray(sin)
    assert abs(sn[6 + 1, 0] - sn[6 + 0, 0]) > 1e-6


def test_shared_modulation_timestep(tiny_params):
    g = np.random.default_rng(2)
    x = jnp.asarray(g.standard_normal((1, 4, 4, 16), dtype=np.float32))
    ctx = jnp.asarray(g.standard_normal((1, 5, 24), dtype=np.float32) * 0.1)
    a = ernie_image_forward(tiny_params, x, jnp.asarray([100.0]), ctx, cfg=TINY)
    b = ernie_image_forward(tiny_params, x, jnp.asarray([900.0]), ctx, cfg=TINY)
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-5


def test_detect_config(tiny_params):
    shapes = {k: tuple(v.shape) for k, v in tiny_params.items()}
    cfg = detect_ernie_config(set(tiny_params.keys()), shapes)
    assert cfg.num_layers == 2
    assert cfg.hidden_size == 32
    assert cfg.num_heads == 4
    assert cfg.in_channels == 16 and cfg.out_channels == 16
    assert cfg.text_in_dim == 24
    assert cfg.ffn_hidden_size == 64


def test_pipeline_e2e():
    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.factory import create_pipeline

    pipe = create_pipeline(SDVersion.ERNIE_IMAGE, small=True, seed=0)
    res = pipe.generate(GenerationParams(
        prompt="a corgi", width=64, height=64, sample_steps=2,
        sample_method="euler", cfg_scale=1.0, schedule="discrete"))
    assert res.images.shape == (1, 64, 64, 3)

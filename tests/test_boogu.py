"""Boogu-Image DiT tests."""
import jax.numpy as jnp
import numpy as np
import pytest

from sdtpu.models.boogu import (
    BooguConfig,
    boogu_forward,
    boogu_rope,
    detect_boogu_config,
    init_boogu_params,
)

TINY = BooguConfig(
    in_channels=4, out_channels=4, hidden_size=48, num_layers=2,
    num_double_stream_layers=1, num_refiner_layers=1, num_heads=4,
    num_kv_heads=2, head_dim=12, multiple_of=16, instruction_feat_dim=24,
    axes_dim=(4, 4, 4),
)


@pytest.fixture(scope="module")
def tiny_params():
    return init_boogu_params(TINY, seed=0)


def test_forward_shapes(tiny_params):
    g = np.random.default_rng(1)
    x = jnp.asarray(g.standard_normal((1, 8, 8, 4), dtype=np.float32))
    ctx = jnp.asarray(g.standard_normal((1, 9, 24), dtype=np.float32) * 0.1)
    out = boogu_forward(tiny_params, x, jnp.asarray([0.5]), ctx, cfg=TINY)
    assert out.shape == (1, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_ref_latents_change_output(tiny_params):
    g = np.random.default_rng(2)
    x = jnp.asarray(g.standard_normal((1, 8, 8, 4), dtype=np.float32))
    ctx = jnp.asarray(g.standard_normal((1, 5, 24), dtype=np.float32) * 0.1)
    ref = jnp.asarray(g.standard_normal((1, 4, 4, 4), dtype=np.float32))
    a = boogu_forward(tiny_params, x, jnp.asarray([0.5]), ctx, cfg=TINY)
    b = boogu_forward(tiny_params, x, jnp.asarray([0.5]), ctx, cfg=TINY,
                      ref_latents=[ref])
    assert a.shape == b.shape
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-5


def test_rope_ref_shift():
    rot = boogu_rope(2, 2, 3, TINY, ref_sizes=[(2, 2)])
    # txt(3) + ref(4) + img(4) tokens
    assert rot.shape[0] == 11


def test_detect_config(tiny_params):
    shapes = {k: tuple(v.shape) for k, v in tiny_params.items()}
    cfg = detect_boogu_config(set(tiny_params.keys()), shapes)
    assert cfg.num_layers == 2
    assert cfg.num_double_stream_layers == 1
    assert cfg.num_refiner_layers == 1
    assert cfg.hidden_size == 48
    assert cfg.num_heads == 4 and cfg.num_kv_heads == 2 and cfg.head_dim == 12
    assert cfg.instruction_feat_dim == 24


def test_pipeline_e2e():
    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.factory import create_pipeline

    pipe = create_pipeline(SDVersion.BOOGU_IMAGE, small=True, seed=0)
    res = pipe.generate(GenerationParams(
        prompt="a corgi", width=32, height=32, sample_steps=2,
        sample_method="euler", cfg_scale=1.0, schedule="discrete"))
    assert res.images.shape == (1, 32, 32, 3)

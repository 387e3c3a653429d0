"""Z-Image DiT + pipeline tests (tiny random-init config)."""
import jax.numpy as jnp
import numpy as np
import pytest

from sdtpu.models.z_image import (
    ZImageConfig,
    detect_z_image_config,
    init_z_image_params,
    z_image_forward,
)

TINY = ZImageConfig(
    hidden_size=48, in_channels=4, out_channels=4, num_layers=2,
    num_refiner_layers=1, head_dim=12, num_heads=4, num_kv_heads=2,
    multiple_of=16, cap_feat_dim=32, axes_dim=(4, 4, 4),
)


@pytest.fixture(scope="module")
def tiny_params():
    return init_z_image_params(TINY, seed=0)


def test_forward_shapes(tiny_params):
    g = np.random.default_rng(1)
    x = jnp.asarray(g.standard_normal((1, 8, 8, 4), dtype=np.float32))
    ctx = jnp.asarray(g.standard_normal((1, 11, 32), dtype=np.float32) * 0.1)
    out = z_image_forward(tiny_params, x, jnp.asarray([500.0]), ctx, cfg=TINY)
    assert out.shape == (1, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_odd_sizes_pad_and_crop(tiny_params):
    g = np.random.default_rng(2)
    x = jnp.asarray(g.standard_normal((1, 7, 9, 4), dtype=np.float32))
    ctx = jnp.asarray(g.standard_normal((1, 5, 32), dtype=np.float32) * 0.1)
    out = z_image_forward(tiny_params, x, jnp.asarray([100.0]), ctx, cfg=TINY)
    assert out.shape == (1, 7, 9, 4)


def test_timestep_changes_output(tiny_params):
    g = np.random.default_rng(3)
    x = jnp.asarray(g.standard_normal((1, 4, 4, 4), dtype=np.float32))
    ctx = jnp.asarray(g.standard_normal((1, 5, 32), dtype=np.float32) * 0.1)
    a = z_image_forward(tiny_params, x, jnp.asarray([100.0]), ctx, cfg=TINY)
    b = z_image_forward(tiny_params, x, jnp.asarray([900.0]), ctx, cfg=TINY)
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-5


def test_detect_config(tiny_params):
    shapes = {k: tuple(v.shape) for k, v in tiny_params.items()}
    cfg = detect_z_image_config(set(tiny_params.keys()), shapes)
    assert cfg.num_layers == 2
    assert cfg.num_refiner_layers == 1
    assert cfg.hidden_size == 48
    assert cfg.in_channels == 4 and cfg.out_channels == 4
    assert cfg.head_dim == 12 and cfg.num_heads == 4 and cfg.num_kv_heads == 2
    assert cfg.cap_feat_dim == 32


def test_pipeline_e2e():
    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.factory import create_pipeline

    pipe = create_pipeline(SDVersion.Z_IMAGE, small=True, seed=0)
    res = pipe.generate(GenerationParams(
        prompt="a corgi", width=32, height=32, sample_steps=2,
        sample_method="euler", cfg_scale=3.0, schedule="discrete"))
    assert res.images.shape == (1, 32, 32, 3)
    assert np.isfinite(res.latents).all()

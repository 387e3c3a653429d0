"""MiniT2I pixel-space DiT tests."""
import jax.numpy as jnp
import numpy as np
import pytest

from sdtpu.models.minit2i import (
    MiniT2IConfig,
    detect_minit2i_config,
    init_minit2i_params,
    minit2i_forward,
    sincos_pos_embed_2d,
)

TINY = MiniT2IConfig(
    patch_size=4, txt_input_size=48, hidden_size=32, txt_hidden_size=32,
    cond_vec_size=32, depth_double=2, txt_preamble_depth=1, num_heads=4,
    head_dim=8, pca_channels=8, prompt_length=16,
)


@pytest.fixture(scope="module")
def tiny_params():
    return init_minit2i_params(TINY, seed=0)


def test_forward_shapes(tiny_params):
    g = np.random.default_rng(1)
    x = jnp.asarray(g.standard_normal((1, 16, 16, 3), dtype=np.float32))
    ctx = jnp.asarray(g.standard_normal((1, 8, 48), dtype=np.float32) * 0.1)
    mask = jnp.ones((1, 8), jnp.float32)
    out = minit2i_forward(tiny_params, x, None, ctx, mask=mask, cfg=TINY)
    assert out.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_mask_token_substitution(tiny_params):
    """Masked positions are replaced by the learned mask token, so changing
    the masked context values must not change the output."""
    g = np.random.default_rng(2)
    x = jnp.asarray(g.standard_normal((1, 16, 16, 3), dtype=np.float32))
    ctx1 = np.asarray(g.standard_normal((1, 8, 48), dtype=np.float32) * 0.1)
    ctx2 = ctx1.copy()
    ctx2[:, 4:] += 5.0  # perturb only masked positions
    mask = np.asarray([[1, 1, 1, 1, 0, 0, 0, 0]], dtype=np.float32)
    a = minit2i_forward(tiny_params, x, None, jnp.asarray(ctx1),
                        mask=jnp.asarray(mask), cfg=TINY)
    b = minit2i_forward(tiny_params, x, None, jnp.asarray(ctx2),
                        mask=jnp.asarray(mask), cfg=TINY)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sincos_pos_embed_layout():
    pe = sincos_pos_embed_2d(2, 8)
    assert pe.shape == (4, 8)
    # position (0,0) -> sin 0, cos 1 everywhere
    np.testing.assert_allclose(pe[0], [0, 0, 1, 1, 0, 0, 1, 1], atol=1e-6)


def test_detect_config(tiny_params):
    shapes = {k: tuple(v.shape) for k, v in tiny_params.items()}
    cfg = detect_minit2i_config(set(tiny_params.keys()), shapes)
    assert cfg.depth_double == 2
    assert cfg.txt_preamble_depth == 1
    assert cfg.hidden_size == 32
    assert cfg.patch_size == 4
    assert cfg.pca_channels == 8
    assert cfg.txt_input_size == 48


def test_denoiser_and_pipeline():
    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.diffusion.denoiser import MiniT2IFlowDenoiser
    from sdtpu.factory import create_pipeline

    d = MiniT2IFlowDenoiser()
    sig = d.get_sigmas_uniform(4) if hasattr(d, "get_sigmas_uniform") else None
    c_skip, c_out, c_in = d.get_scalings(np.float32(0.5))
    assert c_skip == 0.0 and c_out == 1.0 and c_in == 1.0
    # noise scaling starts from noise*2
    n = np.ones((2, 2), np.float32)
    np.testing.assert_allclose(d.noise_scaling(1.0, n, np.zeros_like(n)), n * 2)

    pipe = create_pipeline(SDVersion.MINIT2I, small=True, seed=0)
    res = pipe.generate(GenerationParams(
        prompt="a corgi", width=32, height=32, sample_steps=2,
        sample_method="euler", cfg_scale=1.0))
    assert res.images.shape == (1, 32, 32, 3)

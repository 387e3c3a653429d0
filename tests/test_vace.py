"""Wan VACE (video editing/control) tests."""
import numpy as np
import jax
import jax.numpy as jnp

from sdtpu.models.wan import WanConfig, detect_wan_config, init_wan_params, wan_forward

TINY = WanConfig(dim=32, ffn_dim=64, freq_dim=16, text_dim=24, in_dim=4,
                 out_dim=4, num_heads=2, num_layers=4, axes_dim=(8, 4, 4),
                 vace_layers=2, vace_in_dim=12)


def test_vace_forward_and_strength():
    """VACE control stream: spliced every num_layers/vace_layers layers,
    after_proj scaled by vace_strength; strength 0 == no VACE (reference
    wan.hpp:714-731)."""
    p = init_wan_params(TINY, seed=0)
    g = np.random.default_rng(1)
    x = jnp.asarray(g.standard_normal((1, 2, 4, 4, 4), dtype=np.float32))
    ctx = jnp.asarray(g.standard_normal((1, 7, 24), dtype=np.float32) * 0.1)
    vc = jnp.asarray(g.standard_normal((1, 2, 4, 4, 12), dtype=np.float32))
    fwd = jax.jit(lambda vcx, s: wan_forward(
        p, x, jnp.asarray([500.0]), ctx, cfg=TINY, vace_context=vcx,
        vace_strength=s))
    base = jax.jit(lambda: wan_forward(p, x, jnp.asarray([500.0]), ctx, cfg=TINY))()
    on = fwd(vc, 1.0)
    off = fwd(vc, 0.0)
    assert np.abs(np.asarray(on) - np.asarray(base)).max() > 1e-5
    np.testing.assert_allclose(np.asarray(off), np.asarray(base), atol=1e-5)


def test_detect_vace():
    p = init_wan_params(TINY, seed=0)
    shapes = {k: tuple(v.shape) for k, v in p.items()}
    cfg = detect_wan_config(p.keys(), shapes)
    assert cfg.vace_layers == 2 and cfg.vace_in_dim == 12
    assert "vace_blocks.0.before_proj.weight" in p
    assert "vace_blocks.1.before_proj.weight" not in p  # block 0 only
    assert "vace_blocks.1.after_proj.weight" in p

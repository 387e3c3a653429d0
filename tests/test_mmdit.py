"""MMDiT vs torch reference (shared weights, SD3 + SD3.5-X variants)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdtpu.models.mmdit import MMDiTConfig, init_mmdit_params, mmdit_forward

torch = pytest.importorskip("torch")

SMALL = MMDiTConfig(
    patch_size=2,
    in_channels=4,
    depth=3,  # hidden 192, heads 3
    context_size=32,
    adm_in_channels=16,
    pos_embed_max_size=16,
)
SMALL_X = MMDiTConfig(
    patch_size=2,
    in_channels=4,
    depth=3,
    context_size=32,
    adm_in_channels=16,
    pos_embed_max_size=16,
    qk_norm="rms",
    num_x_self_attn_layers=2,
)


def _params_from_torch(m):
    sd = m.state_dict()
    out = {}
    for k, v in sd.items():
        k = k.replace("adaLN_modulation.1.", "adaLN_modulation.1.")  # same naming
        out[k] = jnp.asarray(v.detach().numpy())
    return out


@pytest.mark.parametrize("cfg", [SMALL, SMALL_X], ids=["sd3", "sd35x"])
def test_mmdit_matches_torch(cfg):
    from tests.torch_ref.mmdit import TorchMMDiT

    torch.manual_seed(0)
    m = TorchMMDiT(cfg)
    m.eval()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 16, 16, 4), dtype=np.float32)
    t = np.array([999.0, 400.0], dtype=np.float32)
    ctx = rng.standard_normal((2, 10, 32), dtype=np.float32)
    y = rng.standard_normal((2, 16), dtype=np.float32)
    with torch.no_grad():
        want = (
            m(
                torch.from_numpy(x.transpose(0, 3, 1, 2)),
                torch.from_numpy(t),
                torch.from_numpy(ctx),
                torch.from_numpy(y),
            )
            .numpy()
            .transpose(0, 2, 3, 1)
        )
    p = _params_from_torch(m)
    got = np.asarray(
        jax.jit(lambda p, x, t, c, y: mmdit_forward(p, x, t, c, y, cfg=cfg))(
            p, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx), jnp.asarray(y)
        )
    )
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_mmdit_param_names_match():
    from tests.torch_ref.mmdit import TorchMMDiT

    for cfg in (SMALL, SMALL_X):
        m = TorchMMDiT(cfg)
        want = set(m.state_dict().keys())
        got = set(init_mmdit_params(cfg).keys())
        assert got == want, f"missing {sorted(want - got)[:4]} extra {sorted(got - want)[:4]}"


def test_mmdit_skip_layers_changes_output():
    cfg = SMALL
    p = init_mmdit_params(cfg)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 4), dtype=np.float32))
    t = jnp.asarray([500.0], dtype=jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 8, 32), dtype=np.float32))
    y = jnp.asarray(rng.standard_normal((1, 16), dtype=np.float32))
    full = mmdit_forward(p, x, t, ctx, y, cfg=cfg)
    skipped = mmdit_forward(p, x, t, ctx, y, cfg=cfg, skip_layers=(1,))
    assert not np.allclose(np.asarray(full), np.asarray(skipped))


def test_detect_mmdit_config():
    """SD3-medium / SD3.5-medium (MMDiT-X) / SD3.5-large fingerprinting from
    checkpoint names+shapes (factory uses it when weights are supplied)."""
    import jax.numpy as jnp

    from sdtpu.models.mmdit import (
        SD3_MEDIUM_CONFIG, SD35_LARGE_CONFIG, SD35_MEDIUM_CONFIG,
        detect_mmdit_config, init_mmdit_params,
    )
    from sdtpu.utils.device_init import param_specs

    for cfg in (SD3_MEDIUM_CONFIG, SD35_MEDIUM_CONFIG, SD35_LARGE_CONFIG):
        specs = param_specs(init_mmdit_params, cfg, dtype=jnp.bfloat16)
        det = detect_mmdit_config(
            specs.keys(), {k: tuple(v.shape) for k, v in specs.items()})
        assert det == cfg, (det, cfg)

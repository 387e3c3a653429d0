"""UNet wiring + numerics vs the test-only torch reference (shared weights)."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdtpu.models.unet import (
    SD1_UNET_CONFIG,
    SDXL_UNET_CONFIG,
    UNetConfig,
    init_unet_params,
    unet_forward,
)

torch = pytest.importorskip("torch")

# small configs: GroupNorm needs ch%32==0, so model_channels=32
SMALL_SD1 = UNetConfig(
    in_channels=4,
    out_channels=4,
    model_channels=32,
    num_res_blocks=1,
    channel_mult=(1, 2, 4, 4),
    attention_resolutions=(1, 2, 4),
    transformer_depth=(1, 1, 1, 1),
    context_dim=48,
    num_heads=2,
)
SMALL_SDXL = UNetConfig(
    in_channels=4,
    out_channels=4,
    model_channels=32,
    num_res_blocks=1,
    channel_mult=(1, 2, 4),
    attention_resolutions=(2, 4),
    transformer_depth=(0, 2, 3),
    context_dim=48,
    num_heads=None,
    num_head_channels=16,
    use_linear_in_transformer=True,
    adm_in_channels=64,
)


def _params_from_torch(m):
    return {
        k: jnp.asarray(v.detach().numpy())
        for k, v in m.state_dict().items()
        if "Identity" not in k
    }


@pytest.mark.parametrize("cfg,use_y", [(SMALL_SD1, False), (SMALL_SDXL, True)])
def test_unet_matches_torch(cfg, use_y):
    from tests.torch_ref.unet import TorchUNet

    torch.manual_seed(0)
    m = TorchUNet(cfg)
    m.eval()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 16, 16, 4), dtype=np.float32)
    t = np.array([999.0, 500.0], dtype=np.float32)
    ctx = rng.standard_normal((2, 77, cfg.context_dim), dtype=np.float32)
    y = rng.standard_normal((2, cfg.adm_in_channels), dtype=np.float32) if use_y else None

    with torch.no_grad():
        want = (
            m(
                torch.from_numpy(x.transpose(0, 3, 1, 2)),
                torch.from_numpy(t),
                torch.from_numpy(ctx),
                torch.from_numpy(y) if use_y else None,
            )
            .numpy()
            .transpose(0, 2, 3, 1)
        )

    p = _params_from_torch(m)
    fwd = jax.jit(lambda p, x, t, c, y: unet_forward(p, x, t, c, y=y, cfg=cfg))
    got = np.asarray(
        fwd(p, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx), jnp.asarray(y) if use_y else None)
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_init_params_names_match_torch():
    """Random-init param dict covers exactly the torch module's state dict."""
    from tests.torch_ref.unet import TorchUNet

    for cfg in (SMALL_SD1, SMALL_SDXL):
        m = TorchUNet(cfg)
        want = set(m.state_dict().keys())
        got = set(init_unet_params(cfg).keys())
        assert got == want, (
            f"missing: {sorted(want - got)[:5]}, extra: {sorted(got - want)[:5]}"
        )


def test_full_size_param_count():
    """SD1.5 UNet must have the canonical ~859.5M parameters."""
    from sdtpu.models.unet import unet_param_shapes

    shapes = unet_param_shapes(SD1_UNET_CONFIG)
    n = sum(int(np.prod(s)) for _, s in shapes.values())
    assert abs(n - 859_520_964) < 2_000_000, n

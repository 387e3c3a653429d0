"""VAE encode/decode vs the test-only torch reference (shared weights)."""
import dataclasses

import numpy as np
import pytest

import functools

import jax
import jax.numpy as jnp

from sdtpu.models.vae import VAEConfig, init_vae_params, vae_decode, vae_encode, vae_encode_moments

torch = pytest.importorskip("torch")

SMALL = VAEConfig(base_channels=32, channel_mult=(1, 2), num_res_blocks=1, z_channels=4)


@pytest.fixture(scope="module")
def models():
    from tests.torch_ref.vae import TorchVAE

    torch.manual_seed(0)
    m = TorchVAE(SMALL)
    m.eval()
    p = {k: jnp.asarray(v.detach().numpy()) for k, v in m.state_dict().items()}
    return m, p


def test_param_names_match(models):
    m, _ = models
    want = set(m.state_dict().keys())
    got = set(init_vae_params(SMALL).keys())
    assert got == want, f"missing {sorted(want-got)[:5]} extra {sorted(got-want)[:5]}"


def test_encode_moments(models):
    m, p = models
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 32, 32, 3), dtype=np.float32)
    with torch.no_grad():
        want = m.encode_moments(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(jax.jit(lambda p, x: vae_encode_moments(p, x, SMALL))(p, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_decode(models):
    m, p = models
    rng = np.random.default_rng(1)
    z = rng.standard_normal((2, 8, 8, 4), dtype=np.float32)
    with torch.no_grad():
        want = m.decode(torch.from_numpy(z.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(jax.jit(lambda p, z: vae_decode(p, z, SMALL))(p, jnp.asarray(z) * SMALL.scale_factor))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_encode_scaling(models):
    _, p = models
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 32, 32, 3), dtype=np.float32)
    moments = np.asarray(jax.jit(lambda p, x: vae_encode_moments(p, x, SMALL))(p, jnp.asarray(x)))
    mean = moments[..., :4]
    z = np.asarray(jax.jit(lambda p, x: vae_encode(p, x, noise=None, cfg=SMALL))(p, jnp.asarray(x)))
    np.testing.assert_allclose(z, mean * SMALL.scale_factor, rtol=1e-5, atol=1e-6)


def test_vae_tiling_matches_full_decode():
    """Tiled decode ≈ full decode away from tile seams; pipeline wiring
    (reference process_tiles_2d, ggml_extend.hpp:824)."""
    import numpy as np

    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.factory import create_pipeline
    from sdtpu.models.tiling import tiled_decode

    pipe = create_pipeline(SDVersion.SD1, small=True, seed=0)
    import jax

    jit_dec = jax.jit(lambda p, z: pipe.vae_decode_fn(p, z))
    rng = np.random.default_rng(0)
    z = rng.standard_normal((1, 24, 24, 4)).astype(np.float32)
    full = np.asarray(jit_dec(pipe.vae_params, z))
    tiled = tiled_decode(lambda t: jit_dec(pipe.vae_params, t), z,
                         tile=16, overlap=4, scale_factor=8)
    assert tiled.shape == full.shape
    # interiors agree; seams blend (convolution halo → not bit-equal)
    err = np.abs(tiled - full).mean()
    assert err < 0.12, err

    # pipeline end-to-end with tiling on
    pipe.set_vae_tiling(True, tile_size=4, overlap=2)
    gp = GenerationParams(prompt="x", width=64, height=64, sample_steps=1,
                          cfg_scale=1.0, sample_method="euler", seed=3)
    res = pipe.generate(gp)
    assert res.images.shape == (1, 64, 64, 3)
    pipe.set_vae_tiling(False)
    base = pipe.generate(gp)
    d = np.abs(res.images.astype(int) - base.images.astype(int)).mean()
    assert d < 30, d  # same content, modest seam differences

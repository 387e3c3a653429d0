"""SeFi-Image tests: dual schedule, dual timestep embedder, sefi_euler."""
import dataclasses

import jax.numpy as jnp
import numpy as np

from sdtpu.diffusion.schedule import sefi_dual_schedule
from sdtpu.models.flux import SEFI_CONFIG, flux_forward, init_flux_params

TINY = dataclasses.replace(
    SEFI_CONFIG, in_channels=32, hidden_size=64, num_heads=2, depth=2,
    depth_single=2, axes_dim=(8, 8, 8, 8), context_in_dim=48)


def test_dual_schedule():
    """Semantic channels run delta_t ahead on the quantized 1000-grid
    (reference SefiFlowDenoiser::get_sigmas, denoiser.hpp:1302-1350)."""
    sem, tex = sefi_dual_schedule(4, alpha=1.0, delta_t=0.1)
    assert len(sem) == 5 and len(tex) == 5
    assert sem[0] == tex[0] == 1.0
    assert sem[-1] == tex[-1] == 1.0 / 1000.0
    # interior: sem strictly ahead (smaller sigma) of tex
    assert all(s < t for s, t in zip(sem[1:-1], tex[1:-1]))
    # alpha shift compresses early steps
    sem_a, _ = sefi_dual_schedule(4, alpha=0.3, delta_t=0.1)
    assert sem_a[1] > sem[1]


def test_dual_timestep_embedder():
    p = init_flux_params(TINY, seed=0)
    assert "dual_time_embed.semantic_embedder.linear_1.weight" in p
    assert "time_in.in_layer.weight" not in p
    assert p["dual_time_embed.semantic_embedder.linear_1.weight"].shape == (32, 256)

    g = np.random.default_rng(1)
    x = jnp.asarray(g.standard_normal((1, 4, 4, 32), dtype=np.float32))
    ctx = jnp.asarray(g.standard_normal((1, 7, 48), dtype=np.float32) * 0.1)
    tt = jnp.asarray([[900.0, 1000.0]])
    out = flux_forward(p, x, tt, ctx, None, cfg=TINY)
    assert out.shape == (1, 4, 4, 32)
    # the two timesteps feed separate embedder halves: changing only the
    # semantic timestep must change the output
    out2 = flux_forward(p, x, jnp.asarray([[500.0, 1000.0]]), ctx, None, cfg=TINY)
    assert np.abs(np.asarray(out) - np.asarray(out2)).max() > 1e-6


def test_sefi_euler_groups_integrate_differently():
    """sefi_euler applies sem/tex sigma deltas to their channel groups
    (reference sample_sefi_euler, denoiser.hpp:1523-1555)."""
    from sdtpu.diffusion.samplers import sample

    def model_fn(x, sigma, i):
        return jnp.zeros_like(x), None  # denoised = 0 → v = x / sigma_tex

    sem, tex = sefi_dual_schedule(2)
    x = jnp.ones((1, 2, 2, 20))
    out = sample(model_fn, x, tex, method="sefi_euler")
    out = np.asarray(out)
    # with denoised==0, x' = x * (1 + (sig_next-sig)/sig_tex) per group
    xs, xt = 1.0, 1.0
    for i in range(2):
        v = xs / tex[i], xt / tex[i]
        xs = xs + v[0] * (sem[i + 1] - sem[i])
        xt = xt + v[1] * (tex[i + 1] - tex[i])
    np.testing.assert_allclose(out[..., :16], xs, rtol=1e-5)
    np.testing.assert_allclose(out[..., 16:], xt, rtol=1e-5)


def test_pipeline_e2e_forces_sefi_euler():
    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.factory import create_pipeline

    pipe = create_pipeline(SDVersion.SEFI, small=True, seed=0)
    assert pipe.force_sample_method == "sefi_euler"
    assert pipe.default_schedule == "sefi"
    res = pipe.generate(GenerationParams(
        prompt="a corgi", width=32, height=32, sample_steps=2,
        sample_method="euler", cfg_scale=1.0))
    assert res.images.shape == (1, 32, 32, 3)
    assert res.latents.shape == (1, 2, 2, 32)


def test_detect_sefi():
    from sdtpu.config import SDVersion
    from sdtpu.io.detect import detect_version

    p = init_flux_params(TINY, seed=0)
    shapes = {k: tuple(v.shape) for k, v in p.items()}
    assert detect_version(p.keys(), shapes) == SDVersion.SEFI

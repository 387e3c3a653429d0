"""APG momentum threading + Brownian-tree noise (VERDICT r1 item 7).

Reference: guidance momentum buffer (src/runtime/guidance.h:43-98, updated
once per denoise call) and BrownianTreeNoiseSampler
(src/runtime/denoiser.hpp:1884).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from sdtpu.config import GenerationParams, SDVersion
from sdtpu.diffusion.brownian import BrownianTreeNoiseSampler, brownian_step_noise
from sdtpu.diffusion.guidance import APGParams, apg_combine
from sdtpu.diffusion.samplers import StatefulModel, sample
from sdtpu.factory import create_pipeline
from sdtpu.rng import NumpyRNG


def test_stateful_model_threads_state_through_scan():
    """State advances once per model call across the whole scan."""
    x = jnp.ones((1, 4), dtype=jnp.float32)
    sigmas = np.asarray([1.0, 0.6, 0.3, 0.0], dtype=np.float32)

    def fn(xx, sigma, i, state):
        state = jnp.float32(0.0) if state is None else state
        den = xx * 0.5 + state * 0.01
        return den, den, state + 1.0

    got = np.asarray(sample(StatefulModel(fn, jnp.float32(0.0)), x, sigmas, method="euler"))

    # explicit euler loop with the same state evolution
    xs = np.ones((1, 4), dtype=np.float32)
    st = 0.0
    for i in range(3):
        den = xs * 0.5 + st * 0.01
        st += 1.0
        d = (xs - den) / sigmas[i]
        xs = xs + d * (sigmas[i + 1] - sigmas[i])
    np.testing.assert_allclose(got, xs, rtol=1e-6)

    # second-order method: two model calls per step must advance state twice
    got2 = np.asarray(sample(StatefulModel(fn, jnp.float32(0.0)), x, sigmas, method="heun"))
    xs = np.ones((1, 4), dtype=np.float32)
    st = 0.0
    for i in range(3):
        den = xs * 0.5 + st * 0.01
        st += 1.0
        d = (xs - den) / sigmas[i]
        if sigmas[i + 1] == 0:
            xs = xs + d * (sigmas[i + 1] - sigmas[i])
        else:
            x2 = xs + d * (sigmas[i + 1] - sigmas[i])
            den2 = x2 * 0.5 + st * 0.01
            st += 1.0
            d2 = (x2 - den2) / sigmas[i + 1]
            xs = xs + (d + d2) / 2.0 * (sigmas[i + 1] - sigmas[i])
    np.testing.assert_allclose(got2, xs, rtol=1e-6)


def test_apg_momentum_accumulates_reference_semantics():
    """buf_{n} = delta_n + m·buf_{n-1}; applied delta is the updated buffer
    (reference guidance.cpp momentum update)."""
    rng = np.random.default_rng(0)
    cond = [jnp.asarray(rng.standard_normal((1, 8)), dtype=jnp.float32) for _ in range(3)]
    unc = [jnp.asarray(rng.standard_normal((1, 8)), dtype=jnp.float32) for _ in range(3)]
    params = APGParams(momentum=-0.5)
    scale = 4.0

    buf = None
    outs = []
    for c, u in zip(cond, unc):
        pred, buf = apg_combine(c, u, None, scale, params, momentum_buffer=buf)
        outs.append(np.asarray(pred))

    # numpy oracle
    m = -0.5
    nbuf = np.zeros((1, 8), dtype=np.float32)
    for i, (c, u) in enumerate(zip(cond, unc)):
        delta = np.asarray(c) - np.asarray(u)
        delta = delta + m * nbuf
        nbuf = delta
        want = np.asarray(c) + (scale - 1.0) * delta
        np.testing.assert_allclose(outs[i], want, rtol=1e-5)


def test_pipeline_apg_momentum_scan_matches_stepwise():
    """Scan path and host-driven stepwise path share the carried buffer →
    identical latents; momentum≠0 differs from momentum=0."""
    pipe = create_pipeline(SDVersion.SD1, small=True, seed=0)
    gp = GenerationParams(
        prompt="cat", width=64, height=64, sample_steps=3,
        sample_method="euler", seed=5, cfg_scale=6.0,
        apg_momentum=-0.5, apg_eta=0.5,
    )
    scan = pipe.generate(gp).latents
    seen = []
    stepwise = pipe.generate(gp, progress_callback=lambda i, n, x: seen.append(i)).latents
    assert len(seen) == 3
    np.testing.assert_allclose(scan, stepwise, rtol=2e-4, atol=2e-4)

    gp0 = GenerationParams(
        prompt="cat", width=64, height=64, sample_steps=3,
        sample_method="euler", seed=5, cfg_scale=6.0,
        apg_momentum=0.0, apg_eta=0.5,
    )
    no_momentum = pipe.generate(gp0).latents
    assert np.abs(scan - no_momentum).max() > 1e-4


def test_brownian_tree_deterministic_and_consistent():
    bt1 = BrownianTreeNoiseSampler((2, 3), 0.02, 14.6, 1234)
    bt2 = BrownianTreeNoiseSampler((2, 3), 0.02, 14.6, 1234)
    np.testing.assert_array_equal(bt1(1.0, 0.5), bt2(1.0, 0.5))
    bt3 = BrownianTreeNoiseSampler((2, 3), 0.02, 14.6, 99)
    assert np.abs(bt1(1.0, 0.5) - bt3(1.0, 0.5)).max() > 1e-3

    # increment additivity: W(b)-W(a) = (W(m)-W(a)) + (W(b)-W(m)) — the
    # property that makes trajectories step-count-stable
    a, m, b = 0.5, 2.0, 6.0
    full = bt1(a, b) * np.sqrt(b - a)
    parts = bt1(a, m) * np.sqrt(m - a) + bt1(m, b) * np.sqrt(b - m)
    np.testing.assert_allclose(full, parts, rtol=1e-4, atol=1e-5)

    # unit variance scaling over many intervals
    big = BrownianTreeNoiseSampler((4096,), 0.02, 14.6, 7)
    s = big(3.0, 1.0).std()
    assert 0.9 < s < 1.1


def test_pipeline_bt_sampler_runs_and_differs_from_plain_sde():
    pipe = create_pipeline(SDVersion.SD1, small=True, seed=0)
    kw = dict(prompt="cat", width=64, height=64, sample_steps=4, seed=5,
              cfg_scale=3.0, eta=1.0)
    bt = pipe.generate(GenerationParams(sample_method="dpm++2m_sde_bt", **kw)).latents
    sde = pipe.generate(GenerationParams(sample_method="dpm++2m_sde", **kw)).latents
    assert np.isfinite(bt).all()
    assert np.abs(bt - sde).max() > 1e-4  # different noise source

    bt2 = pipe.generate(GenerationParams(sample_method="dpm++2m_sde_bt", **kw)).latents
    np.testing.assert_allclose(bt, bt2, rtol=1e-5, atol=1e-6)  # deterministic


def test_separate_sampler_rng_changes_step_noise_only():
    """--sampler-rng (reference sampler_rng_type,
    stable-diffusion.cpp:701-704): a separate sampler stream changes
    stochastic-step noise but not the initial latent noise."""
    pipe = create_pipeline(SDVersion.SD1, small=True, seed=0)
    kw = dict(prompt="cat", width=64, height=64, sample_steps=3,
              sample_method="euler_a", eta=1.0, seed=9, cfg_scale=3.0)
    shared = pipe.generate(GenerationParams(**kw)).latents

    pipe.sampler_rng_type = "std_default"
    separate = pipe.generate(GenerationParams(**kw)).latents
    assert np.abs(shared - separate).max() > 1e-4  # different step noise

    # deterministic per type
    separate2 = pipe.generate(GenerationParams(**kw)).latents
    np.testing.assert_allclose(separate, separate2, rtol=1e-5, atol=1e-6)

    pipe.sampler_rng_type = None
    back = pipe.generate(GenerationParams(**kw)).latents
    np.testing.assert_allclose(back, shared, rtol=1e-5, atol=1e-6)


def test_extra_sample_args_guidance_schedule_and_sampler_kv():
    """--extra-sample-args (reference stable-diffusion.cpp:2429-2504):
    per-step guidance schedule + sampler-specific kv args."""
    pipe = create_pipeline(SDVersion.SD1, small=True, seed=0)
    kw = dict(prompt="cat", width=64, height=64, sample_steps=4,
              sample_method="euler", seed=5)
    base = pipe.generate(GenerationParams(cfg_scale=7.0, **kw)).latents
    # constant schedule == plain scalar cfg
    same = pipe.generate(GenerationParams(
        cfg_scale=7.0, extra_sample_args="guidance_schedule=7.0x4", **kw)).latents
    np.testing.assert_allclose(same, base, rtol=1e-5, atol=1e-6)
    # varying schedule differs
    varied = pipe.generate(GenerationParams(
        cfg_scale=7.0, extra_sample_args="guidance_schedule=7.0x2+2.0x2",
        **kw)).latents
    assert np.abs(varied - base).max() > 1e-4

    # sampler kv: euler_ge gamma changes the trajectory
    g1 = pipe.generate(GenerationParams(
        cfg_scale=3.0, **{**kw, "sample_method": "euler_ge"})).latents
    g2 = pipe.generate(GenerationParams(
        cfg_scale=3.0, extra_sample_args="gamma=5.0",
        **{**kw, "sample_method": "euler_ge"})).latents
    assert np.abs(g1 - g2).max() > 1e-5


def test_apg_momentum_survives_step_cache_skips():
    """APG momentum is member state in the reference (guidance.h:43-98) that a
    cache-skipped forward leaves untouched; in step-cache mode the buffer must
    persist across skips instead of being disabled (VERDICT r2 item 7)."""
    from sdtpu.utils import set_log_callback

    pipe = create_pipeline(SDVersion.SD1, small=True, seed=0)
    kw = dict(prompt="cat", width=64, height=64, sample_steps=10,
              cfg_scale=4.0, sample_method="euler", seed=3,
              apg_momentum=-0.75, apg_eta=0.8)

    full = pipe.generate(GenerationParams(**kw)).latents

    logs = []
    set_log_callback(lambda lvl, msg: logs.append(msg))
    try:
        cached = pipe.generate(
            GenerationParams(**kw), step_cache="easycache",
            cache_options={"reuse_threshold": 0.6, "start_percent": 0.05,
                           "end_percent": 0.95},
        ).latents
    finally:
        set_log_callback(None)

    skip_lines = [m for m in logs if "step cache" in m and "skipped" in m]
    assert skip_lines, "no step-cache summary logged"
    n_skipped = int(skip_lines[-1].split("skipped ")[1].split("/")[0])
    assert n_skipped > 0, "cache never skipped; test exercises nothing"

    # the cached trajectory (with momentum threading) stays close to the
    # uncached APG reference
    rel = np.abs(cached - full).mean() / (np.abs(full).mean() + 1e-6)
    assert rel < 0.5, f"APG+easycache diverged from no-cache APG: rel={rel}"

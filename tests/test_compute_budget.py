"""--max-vram compute-budget segmentation (reference graph-cut segmenter,
include/stable-diffusion.h:224, ggml_graph_cut.h:107, docs/performance.md:60).

TPU analog: a budget-derived plan per generation decides (a) sequential
cond/uncond forwards instead of one batched 2b forward — XLA's liveness then
reuses one activation envelope — and (b) the largest VAE decode tile whose
activation estimate fits (sdtpu/parallel/autofit.py derive_compute_plan).
"""
import types

import numpy as np
import pytest

import jax.numpy as jnp

from sdtpu.parallel.autofit import (ComputePlan, derive_compute_plan,
                                    parse_max_vram)

GIB = 1 << 30


def test_parse_max_vram_forms():
    assert parse_max_vram("8") == 8 * GIB
    assert parse_max_vram("0") == 0
    assert parse_max_vram("") == 0
    # per-device spec: the tightest budget governs (reference
    # docs/backend.md:41 'cuda0=6,vulkan0=2')
    assert parse_max_vram("tpu0=6,tpu1=2") == 2 * GIB
    # negative = autodetect minus |v| GiB headroom — positive on any host
    assert parse_max_vram("-1") > 0


def _stub_pipe(hidden=4096, vae_ch=128):
    p = types.SimpleNamespace()
    p.diffusion_params = {
        "head.weight": np.zeros((1000, hidden), np.float16),
        "blocks.0.w.weight": np.zeros((hidden, hidden), np.float16),
    }
    p.vae_params = {
        "decoder.conv_out.weight": np.zeros((3, vae_ch, 3, 3), np.float16),
    }
    p.conditioner = None
    p.scale_factor = 8
    p._streamed_forward = None
    p._conditioner_freed = False
    return p


def test_plan_unbounded_budget_is_noop():
    plan = derive_compute_plan(_stub_pipe(), 512 * GIB, batch=1, lh=128, lw=128)
    assert isinstance(plan, ComputePlan)
    assert not plan.seq_guidance and plan.vae_tile is None
    assert "no segmentation" in plan.describe()


def test_plan_tight_budget_segments_cfg():
    pipe = _stub_pipe()
    # forward envelope at 1024²/ps=1: 128·128·4096·2·24 ≈ 3.0 GiB — a budget
    # leaving ~4 GiB after weights fits ONE forward but not the 2× cfg batch
    plan = derive_compute_plan(pipe, plan_weights(pipe) + 4 * GIB,
                               batch=1, lh=128, lw=128)
    assert plan.seq_guidance
    assert "cfg segmented" in plan.describe()


def test_plan_tight_budget_tiles_decode():
    pipe = _stub_pipe()
    # full-frame 1024² decode ≈ 1.5 GiB; 0.75 GiB available → tile ladder
    plan = derive_compute_plan(pipe, plan_weights(pipe) + (3 * GIB) // 4,
                               batch=1, lh=128, lw=128)
    assert plan.vae_tile is not None and plan.vae_tile < 128
    # the chosen tile's decode estimate actually fits
    from sdtpu.parallel.autofit import _decoder_bytes

    assert (_decoder_bytes(pipe.vae_params, plan.vae_tile * 8,
                           plan.vae_tile * 8)
            <= (3 * GIB) // 4)


def plan_weights(pipe) -> int:
    from sdtpu.parallel.autofit import _params_bytes

    return _params_bytes(pipe.diffusion_params) + _params_bytes(pipe.vae_params)


def test_max_vram_flag_parses():
    from sdtpu.cli import build_parser

    a = build_parser().parse_args(
        ["-p", "x", "-m", "m.safetensors", "--max-vram", "8"])
    assert a.max_vram == "8"


@pytest.mark.slow
def test_cfg_segmented_matches_batched():
    """Sequential cond/uncond forwards are numerically the same computation
    as the batched 2b forward — latents must match."""
    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.factory import create_pipeline

    pipe = create_pipeline(SDVersion.SD1, small=True, seed=0)
    gp = GenerationParams(prompt="a cat", negative_prompt="blurry",
                          width=64, height=64, sample_steps=2,
                          sample_method="euler", cfg_scale=7.0, seed=11)
    base = pipe.generate(gp)
    pipe._cfg_segment = True
    pipe._program_cache.clear()
    pipe._stepwise_step_cache.clear()
    seg = pipe.generate(gp)
    np.testing.assert_allclose(np.asarray(seg.latents),
                               np.asarray(base.latents),
                               rtol=1e-4, atol=2e-4)


@pytest.mark.slow
def test_set_compute_budget_applies_and_releases():
    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.factory import create_pipeline

    pipe = create_pipeline(SDVersion.SD1, small=True, seed=0)
    pipe.set_compute_budget(1 * GIB)
    assert pipe._compute_budget == GIB
    pipe._apply_compute_budget(1, 8, 8)  # tiny latent: no segmentation
    pipe.set_compute_budget(0)
    assert pipe._compute_budget == 0 and not pipe._cfg_segment

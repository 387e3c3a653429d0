"""Auto-fit planner + per-module placement (SURVEY.md §2.1 auto-fit /
§2.14 module placement; reference backend_fit.h:12, docs/backend.md:145)."""
import numpy as np

import jax
import jax.numpy as jnp

from sdtpu.config import GenerationParams, SDVersion
from sdtpu.factory import create_pipeline
from sdtpu.parallel.autofit import FitPlan, autofit_pipeline, derive_plan

GB = 1 << 30


def test_derive_plan_ladder():
    # everything fits dense
    p = derive_plan(4 * GB, 1 * GB, GB // 2, GB // 2, 16 * GB)
    assert p.weight_mode == "dense" and p.fits
    # 24 GB bf16 model on 16 GB → int8
    p = derive_plan(24 * GB, 1 * GB, GB // 2, GB // 2, 16 * GB)
    assert p.weight_mode == "int8" and p.fits
    # 48 GB model → q4
    p = derive_plan(48 * GB, 1 * GB, GB // 2, GB // 2, 16 * GB)
    assert p.weight_mode == "q4" and p.fits
    # quantization forbidden + block size known → streaming
    p = derive_plan(48 * GB, 1 * GB, GB // 2, GB // 2, 16 * GB,
                    allow_quantize=False, block_bytes=GB)
    assert p.weight_mode == "stream" and p.fits
    # decode bigger than the headroom → tiling planned up front
    p = derive_plan(4 * GB, 1 * GB, GB, 20 * GB, 16 * GB)
    assert p.vae_tiling


def test_autofit_quantizes_pipeline_and_still_generates():
    pipe = create_pipeline(SDVersion.SD1, small=True, seed=0)
    # force the int8 tier with a budget just under the dense estimate
    from sdtpu.parallel.autofit import _params_bytes

    from sdtpu.parallel.autofit import (_decoder_bytes, _estimate_hidden,
                                        _params_bytes)

    dense = _params_bytes(pipe.diffusion_params)
    hidden = _estimate_hidden(pipe.diffusion_params)
    lh = 64 // pipe.scale_factor
    act = lh * lh * hidden * 2 * 24
    dec = _decoder_bytes(pipe.vae_params, 64, 64)
    resident = _params_bytes(pipe.vae_params) + act + dec
    budget = resident + int(dense * 0.75)  # dense won't fit, int8 will
    plan = autofit_pipeline(pipe, budget, width=64, height=64, min_size=1024)
    assert plan.weight_mode in ("int8", "q4")
    from sdtpu.ops.quant import Q4Tensor, QuantTensor

    assert any(isinstance(v, (QuantTensor, Q4Tensor))
               for v in pipe.diffusion_params.values())
    res = pipe.generate(GenerationParams(prompt="x", width=64, height=64,
                                         sample_steps=2, sample_method="euler"))
    assert np.isfinite(res.latents).all()


def test_module_placement_cpu_devices():
    pipe = create_pipeline(SDVersion.SD1, small=True, seed=0)
    cpus = jax.devices("cpu")
    pipe.set_module_devices(diffusion=cpus[1], vae=cpus[2], conditioner=cpus[0])
    dev = {list(v.devices())[0] for v in pipe.diffusion_params.values()
           if hasattr(v, "devices")}
    assert dev == {cpus[1]}
    dev_vae = {list(v.devices())[0] for v in pipe.vae_params.values()
               if hasattr(v, "devices")}
    assert dev_vae == {cpus[2]}
    res = pipe.generate(GenerationParams(prompt="x", width=64, height=64,
                                         sample_steps=2, sample_method="euler"))
    assert np.isfinite(res.latents).all()


def test_autofit_streams_flux_pipeline():
    """A budget below the q4 tier switches a FLUX pipeline to host-RAM
    block streaming via the factory's _stream_setup hook, and generation
    still matches the resident path (VERDICT r2 missing #3 + #2)."""
    from sdtpu.parallel.autofit import _params_bytes

    gp = GenerationParams(prompt="x", width=64, height=64, sample_steps=2,
                          sample_method="euler", seed=3, cfg_scale=1.0,
                          guidance=3.5)
    base = create_pipeline(SDVersion.FLUX, small=True, seed=0)
    want = base.generate(gp).latents

    pipe = create_pipeline(SDVersion.FLUX, small=True, seed=0)
    dense = _params_bytes(pipe.diffusion_params)
    # below even the q4 estimate → ladder lands on stream
    budget = int(dense * 0.05) + _params_bytes(pipe.vae_params)
    plan = autofit_pipeline(pipe, budget, width=64, height=64,
                            allow_quantize=False)
    assert plan.weight_mode in ("stream", "disk")
    assert getattr(pipe, "_streamed_forward", None) is not None
    got = pipe.generate(gp).latents
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_cli_auto_fit_flag_parses():
    from sdtpu.cli import build_parser

    args = build_parser().parse_args(
        ["-m", "x.gguf", "-p", "hi", "--auto-fit", "14.5"])
    assert args.auto_fit == 14.5
    assert not args.no_keep_quant


def test_derive_mesh_plan_spreads_before_quantizing():
    """Mesh ladder preference (reference backend_fit.cpp:145 spreads
    residency across devices before degrading): dense TP beats int8 on one
    device; quant rungs engage only when the full mesh can't hold dense."""
    from sdtpu.parallel.autofit import derive_mesh_plan

    # 10 GB dense weights, 1 GB other+act, tiny decode, 8 GB/device budget
    p = derive_mesh_plan(10 * GB, GB // 2, GB // 2, GB // 8, 8 * GB, 8)
    assert p.weight_mode == "dense" and p.tp == 2 and p.fits
    # 100 GB dense → dense never fits even at tp=8; int8 at tp=8 does
    p = derive_mesh_plan(100 * GB, GB // 2, GB // 2, GB // 8, 8 * GB, 8)
    assert p.weight_mode == "int8" and p.tp == 8 and p.fits
    # single device reduces to the plain ladder choice
    p = derive_mesh_plan(10 * GB, GB // 2, GB // 2, GB // 8, 8 * GB, 1)
    assert p.weight_mode == "int8" and p.tp == 1 and p.fits
    # nothing fits without streaming → full-mesh streaming window
    p = derive_mesh_plan(100 * GB, GB // 2, GB // 2, GB // 8, 2 * GB, 2,
                         block_bytes=GB // 4)
    assert p.weight_mode == "stream" and p.tp == 2


def test_autofit_mesh_tp_shards_and_generates():
    """mesh + budget → plan → TP-sharded weights → one sampled image
    (VERDICT r4 next #5 'Done' criterion, CPU-mesh side)."""
    pipe = create_pipeline(SDVersion.SD1, small=True, seed=0)
    want = pipe.generate(GenerationParams(
        prompt="x", width=64, height=64, sample_steps=2,
        sample_method="euler", seed=5, cfg_scale=3.0)).latents

    pipe2 = create_pipeline(SDVersion.SD1, small=True, seed=0)
    dbytes = sum(int(getattr(v, "nbytes", 0))
                 for v in pipe2.diffusion_params.values())
    devs = jax.devices("cpu")[:4]
    # probe the planner's own dense/tp1 estimate, then budget so dense fits
    # only when the diffusion weights split over >= 2 devices
    probe = autofit_pipeline(pipe2, 1 << 60, width=64, height=64,
                             allow_quantize=False, devices=devs)
    assert probe.weight_mode == "dense" and probe.tp == 1
    budget = probe.est_bytes - dbytes // 2
    plan = autofit_pipeline(pipe2, budget, width=64, height=64,
                            allow_quantize=False, devices=devs)
    assert plan.weight_mode == "dense" and plan.tp >= 2
    assert pipe2.mesh is not None
    sharded = [k for k, v in pipe2.diffusion_params.items()
               if hasattr(v, "sharding") and not v.sharding.is_fully_replicated]
    assert sharded, "auto-fit mesh plan did not TP-shard any weight"
    got = pipe2.generate(GenerationParams(
        prompt="x", width=64, height=64, sample_steps=2,
        sample_method="euler", seed=5, cfg_scale=3.0)).latents
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)

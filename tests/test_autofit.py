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

    dense = _params_bytes(pipe.diffusion_params)
    budget = int(dense * 0.75) + _params_bytes(pipe.vae_params) + (6 << 20)
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

"""Driver benchmark: BASELINE.md north stars + the BASELINE.json configs.

North stars (the combined final line reports the weaker of the two):

1. SD1.5 512×512 20-step Euler-A txt2img end-to-end — target < 1 s.
2. FLUX.1-dev 1024×1024 denoise throughput — target ≥ 2 steps/s — measured
   through the REAL pipeline path: ``create_pipeline(SDVersion.FLUX)`` with
   ~12 GB of DISTINCT int8 weight buffers (q8_0 memory class), q4 T5-XXL,
   bf16 CLIP-L/VAE, conditioner → fused on-device sampling scan → tiled VAE
   decode (VERDICT r3 item 1: no shared-buffer shortcut).

Informational metrics (BASELINE.json configs with no published numbers, plus
kernel/memory-class diagnostics):

3. FLUX.1 1024² denoise rate with the GGUF keep-quant memory class
   (GroupQuantTensor, ggml group-32 blocks) at the full 13.4 GB footprint.
4. SDXL 1024² + TAESD decode, LCM 4-step (LCM-LoRA merges offline, so random
   weights measure the same compute).
5. SD3.5-Medium (MMDiT-X) 1024² DPM++2M 28-step.
6. Wan2.1-T2V-1.3B 480×832×33f: DiT steps/s + causal-VAE decode s/frame.
7. FLUX kernel micro-bench (shared buffers — r3 metric kept for continuity).

Weights are synthesized directly in HBM (sdtpu/utils/device_init.py): every
buffer distinct, nothing bulk crosses the host↔device link.  Prints one JSON
line per metric as it lands, then the combined line the driver records.
"""
import gc
import json
import os
import time

BUDGET_S = float(os.environ.get("SDTPU_BENCH_BUDGET_S", "3600"))
_T_START = time.time()


def _remaining() -> float:
    return BUDGET_S - (time.time() - _T_START)


def _enable_cache():
    """Persistent XLA compile cache — driver re-runs skip the cold compiles
    (VERDICT r2 weak #2)."""
    from sdtpu.utils import enable_compilation_cache

    enable_compilation_cache()


def _dtype():
    import jax
    import jax.numpy as jnp

    return jnp.bfloat16 if jax.devices()[0].platform == "tpu" else jnp.float32


def bench_sd15():
    """SD1.5 e2e: random bf16 weights — identical compute graph to real."""
    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.factory import create_pipeline

    pipe = create_pipeline(SDVersion.SD1, small=False, dtype=_dtype())

    gp = GenerationParams(
        prompt="a photograph of an astronaut riding a horse",
        negative_prompt="",
        width=512,
        height=512,
        sample_steps=20,
        cfg_scale=7.0,
        seed=42,
        sample_method="euler_a",
        schedule="discrete",
    )

    pipe.txt2img(gp)  # warmup (compile)

    times = []
    for _ in range(3):
        t0 = time.time()
        pipe.txt2img(gp)
        times.append(time.time() - t0)
    value = min(times)
    return [{
        "metric": "sd15_512_20step_euler_a_e2e",
        "value": round(value, 4),
        "unit": "s",
        "vs_baseline": round(1.0 / value, 4),
    }]


def bench_flux_pipeline():
    """North star 2 through the factory path at the real HBM footprint.

    FLUX.1-dev (11.9B) as distinct per-row int8 QuantTensors (~12 GB — the
    TPU-native q8_0 memory class, reference docs/flux.md:36-38), T5-XXL as
    packed 4-bit Q4Tensors (~2.8 GB — reference recommends t5xxl q4 on 16 GB
    cards), CLIP-L + VAE bf16.  free_params_immediately drops the 3 GB of
    text encoders after the first prompt encode (reference
    sd_ctx_params_t.free_params_immediately), and VAE tiling matches the
    BASELINE.json FLUX config ("q8_0 + flash-attn + VAE tiling")."""
    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.factory import create_pipeline
    from sdtpu.models import clip as clip_mod
    from sdtpu.models import flux as flux_mod
    from sdtpu.models import t5 as t5_mod
    from sdtpu.models import vae as vae_mod
    from sdtpu.utils.device_init import synthesize_params

    dtype = _dtype()
    params = {
        "diffusion": synthesize_params(
            flux_mod.init_flux_params, flux_mod.FLUX_DEV_CONFIG,
            quant="q8_0", seed=1, dtype=dtype),
        "t5": synthesize_params(
            t5_mod.init_t5_params, t5_mod.T5_XXL_CONFIG,
            quant="q4_0", seed=2, dtype=dtype),
        "clip_l": synthesize_params(
            clip_mod.init_clip_params, clip_mod.CLIP_L_CONFIG, 3, dtype=dtype),
        "vae": synthesize_params(
            vae_mod.init_vae_params, vae_mod.FLUX_VAE_CONFIG, seed=4,
            dtype=dtype),
    }
    pipe = create_pipeline(SDVersion.FLUX, params=params, dtype=dtype)
    del params
    pipe.free_params_immediately = True
    pipe.set_vae_tiling(True)

    steps = 20
    gp = GenerationParams(
        prompt="a photograph of an astronaut riding a horse",
        width=1024, height=1024, sample_steps=steps,
        cfg_scale=1.0, guidance=3.5, seed=42, sample_method="euler",
    )
    pipe.txt2img(gp)  # compile + warm; frees the text encoders

    samples, totals = [], []
    for _ in range(3):
        pipe.txt2img(gp)
        samples.append(pipe.last_timings["sample"])
        totals.append(pipe.last_timings["total"])
    steps_per_s = steps / min(samples)
    totals.sort()
    return [
        {
            "metric": "flux1_1024_denoise_steps_per_s",
            "value": round(steps_per_s, 4),
            "unit": "steps/s",
            "vs_baseline": round(steps_per_s / 2.0, 4),
        },
        {
            "metric": "flux1_1024_20step_e2e_p50",
            "value": round(totals[len(totals) // 2], 4),
            "unit": "s",
            "vs_baseline": None,
        },
    ]


def bench_flux_gguf_memclass():
    """FLUX.1-dev denoise rate with GroupQuantTensor weights — the ggml
    group-32 q8_0 block layout the keep-quant GGUF loader produces
    (io/gguf.py), at the full 13.4 GB footprint (11.9 GB int8 + 1.5 GB f32
    group scales).  DiT-only fori_loop: isolates the Pallas group-dequant
    matmul kernels at checkpoint-real memory pressure."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sdtpu.models.flux import FLUX_DEV_CONFIG, flux_forward, init_flux_params
    from sdtpu.utils.device_init import synthesize_params

    dtype = _dtype()
    cfg = FLUX_DEV_CONFIG
    p = synthesize_params(init_flux_params, cfg, quant="q8_0_gguf", seed=5,
                          dtype=dtype)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 128, 128, 16)), dtype=dtype)
    ctx = jnp.asarray(rng.standard_normal((1, 256, 4096)), dtype=dtype)
    y = jnp.asarray(rng.standard_normal((1, 768)), dtype=dtype)
    g = jnp.asarray([3.5], dtype=jnp.float32)
    t = jnp.asarray([0.7], dtype=jnp.float32)
    n = 8

    def run(p, x, t, c, y, g):
        def body(i, xx):
            return flux_forward(p, xx * 0.99, t, c, y, guidance=g, cfg=cfg)

        return jax.lax.fori_loop(0, n, body, x)

    runj = jax.jit(run)
    np.asarray(runj(p, x, t, ctx, y, g))  # compile + warm
    t0 = time.time()
    out = runj(p, x, t, ctx, y, g)
    np.asarray(out)
    steps_per_s = n / (time.time() - t0)
    return [{
        "metric": "flux1_1024_gguf_memclass_steps_per_s",
        "value": round(steps_per_s, 4),
        "unit": "steps/s",
        "vs_baseline": None,
    }]


def bench_sdxl_lcm_taesd():
    """BASELINE config: SDXL 1024² + TAESD decoder + LCM 4-step (the LCM-LoRA
    is merged into the UNet at load time, so random full-size weights measure
    the same per-step compute)."""
    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.factory import create_pipeline, unet_config_for
    from sdtpu.models import clip as clip_mod
    from sdtpu.models import tae as tae_mod
    from sdtpu.models import unet as unet_mod
    from sdtpu.models import vae as vae_mod
    from sdtpu.utils.device_init import synthesize_params

    dtype = _dtype()
    params = {
        "diffusion": synthesize_params(
            unet_mod.init_unet_params, unet_config_for(SDVersion.SDXL),
            seed=1, dtype=dtype),
        "clip_l": synthesize_params(
            clip_mod.init_clip_params, clip_mod.CLIP_L_CONFIG, 2, dtype=dtype),
        "clip_g": synthesize_params(
            clip_mod.init_clip_params, clip_mod.CLIP_G_CONFIG, 3, dtype=dtype),
        "vae": synthesize_params(
            vae_mod.init_vae_params, vae_mod.SDXL_VAE_CONFIG, seed=4,
            dtype=dtype),
    }
    pipe = create_pipeline(SDVersion.SDXL, params=params, dtype=dtype)
    del params
    tae_p = synthesize_params(tae_mod.init_tae_params, tae_mod.TAESD_XL_CONFIG,
                              seed=5, dtype=dtype)
    pipe.set_tae(tae_p, tae_mod.TAESD_XL_CONFIG)

    steps = 4
    gp = GenerationParams(
        prompt="a photograph of an astronaut riding a horse",
        width=1024, height=1024, sample_steps=steps,
        cfg_scale=1.0, seed=42, sample_method="lcm", schedule="discrete",
    )
    pipe.txt2img(gp)  # warm
    totals, samples = [], []
    for _ in range(3):
        pipe.txt2img(gp)
        totals.append(pipe.last_timings["total"])
        samples.append(pipe.last_timings["sample"])
    totals.sort()
    return [
        {
            "metric": "sdxl_1024_lcm4_taesd_e2e_p50",
            "value": round(totals[len(totals) // 2], 4),
            "unit": "s",
            "vs_baseline": None,
        },
        {
            "metric": "sdxl_1024_denoise_steps_per_s",
            "value": round(steps / min(samples), 4),
            "unit": "steps/s",
            "vs_baseline": None,
        },
    ]


def bench_sd35_medium():
    """BASELINE config: SD3.5-Medium (MMDiT-X, fingerprinted from the weight
    names) 1024² DPM++2M 28-step, CLIP-L/G bf16 + q4 T5-XXL."""
    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.factory import create_pipeline
    from sdtpu.models import clip as clip_mod
    from sdtpu.models import mmdit as mmdit_mod
    from sdtpu.models import t5 as t5_mod
    from sdtpu.models import vae as vae_mod
    from sdtpu.utils.device_init import synthesize_params

    import dataclasses

    dtype = _dtype()
    clip_l_cfg = dataclasses.replace(clip_mod.CLIP_L_CONFIG, projection_dim=768)
    params = {
        "diffusion": synthesize_params(
            mmdit_mod.init_mmdit_params, mmdit_mod.SD35_MEDIUM_CONFIG,
            seed=1, dtype=dtype),
        "clip_l": synthesize_params(
            clip_mod.init_clip_params, clip_l_cfg, 2, dtype=dtype),
        "clip_g": synthesize_params(
            clip_mod.init_clip_params, clip_mod.CLIP_G_CONFIG, 3, dtype=dtype),
        "t5": synthesize_params(
            t5_mod.init_t5_params, t5_mod.T5_XXL_CONFIG, quant="q4_0",
            seed=4, dtype=dtype),
        "vae": synthesize_params(
            vae_mod.init_vae_params, vae_mod.SD3_VAE_CONFIG, seed=5,
            dtype=dtype),
    }
    pipe = create_pipeline(SDVersion.SD3, params=params, dtype=dtype)
    del params
    pipe.free_params_immediately = True

    steps = 28
    gp = GenerationParams(
        prompt="a photograph of an astronaut riding a horse",
        negative_prompt="blurry", width=1024, height=1024,
        sample_steps=steps, cfg_scale=4.5, seed=42, sample_method="dpm++2m",
    )
    pipe.txt2img(gp)  # warm
    totals, samples = [], []
    for _ in range(3):
        pipe.txt2img(gp)
        totals.append(pipe.last_timings["total"])
        samples.append(pipe.last_timings["sample"])
    totals.sort()
    return [
        {
            "metric": "sd35_medium_1024_dpmpp2m_steps_per_s",
            "value": round(steps / min(samples), 4),
            "unit": "steps/s",
            "vs_baseline": None,
        },
        {
            "metric": "sd35_medium_1024_28step_e2e_p50",
            "value": round(totals[len(totals) // 2], 4),
            "unit": "s",
            "vs_baseline": None,
        },
    ]


def bench_wan21_t2v():
    """BASELINE config: Wan2.1-T2V-1.3B, 480×832, 33 frames (9 latent
    frames through the 3-D causal VAE), cfg 6.0 — reports temporal-DiT
    denoise rate and VAE decode seconds/frame."""
    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.factory import create_pipeline
    from sdtpu.models import t5 as t5_mod
    from sdtpu.models import wan as wan_mod
    from sdtpu.models import wan_vae as wan_vae_mod
    from sdtpu.utils.device_init import synthesize_params

    dtype = _dtype()
    params = {
        "diffusion": synthesize_params(
            wan_mod.init_wan_params, wan_mod.WAN21_T2V_1_3B_CONFIG,
            seed=1, dtype=dtype),
        "t5": synthesize_params(
            t5_mod.init_t5_params, t5_mod.UMT5_XXL_CONFIG, quant="q4_0",
            seed=2, dtype=dtype),
        "vae": synthesize_params(
            wan_vae_mod.init_wan_vae_params, wan_vae_mod.WAN21_VAE_CONFIG,
            seed=3, dtype=dtype),
    }
    pipe = create_pipeline(SDVersion.WAN2, params=params, dtype=dtype)
    del params
    pipe.free_params_immediately = True
    # full-frame 480p×33f causal decode needs ~19 GB of temps — tile
    # spatially + temporally like any real 16 GB run (reference wan docs
    # recommend --vae-tiling; decode s/frame is reported WITH tiling).
    # Measured on v5e: 60×32-latent tile decodes the whole 9-frame clip in
    # 0.71 s warm; 64 fits alone but not beside the resident 2.7 GB DiT.
    pipe.set_vae_tiling(True, tile_size=32, temporal=True,
                        extra_tiling_args="temporal_tile_frames=5,"
                                          "temporal_tile_overlap=1")

    steps, frames = 8, 33
    gp = GenerationParams(
        prompt="a corgi running on a beach",
        negative_prompt="static", width=832, height=480,
        sample_steps=steps, cfg_scale=6.0, seed=42, sample_method="euler",
    )
    pipe.generate_video(gp, frames=frames)  # warm
    samples, decodes = [], []
    for _ in range(2):
        pipe.generate_video(gp, frames=frames)
        samples.append(pipe.last_timings["sample"])
        decodes.append(pipe.last_timings["decode"])
    return [
        {
            "metric": "wan21_t2v_1_3b_480p_dit_steps_per_s",
            "value": round(steps / min(samples), 4),
            "unit": "steps/s",
            "vs_baseline": None,
        },
        {
            "metric": "wan21_t2v_vae_decode_s_per_frame",
            "value": round(min(decodes) / frames, 4),
            "unit": "s/frame",
            "vs_baseline": None,
        },
    ]


def bench_flux_kernel():
    """FLUX.1-dev 1024² denoise step rate, kernel micro-bench: int8 weights
    with buffers SHARED per unique shape (initializes in seconds; per-step
    compute and HBM traffic per matmul match the real model, total-footprint
    pressure does not — kept as the r3-continuity secondary metric; the
    north star above uses distinct buffers through the pipeline)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sdtpu.models.flux import FLUX_DEV_CONFIG, _flux_param_walk, flux_forward
    from sdtpu.ops.quant import QuantTensor

    cfg = FLUX_DEV_CONFIG
    g = np.random.default_rng(0)
    p = {}
    shared = {}
    d_head = cfg.hidden_size // cfg.num_heads

    def lin(name, o, i, bias=True):
        key = (o, i)
        if o * i >= (1 << 16):
            if key not in shared:
                q = g.integers(-127, 128, size=(o, i), dtype=np.int8)
                s = np.full((o,), 0.02 / 127, dtype=np.float32)
                shared[key] = QuantTensor(q=jnp.asarray(q), scale=jnp.asarray(s))
            p[f"{name}.weight"] = shared[key]
        else:
            if ("dense", key) not in shared:
                shared[("dense", key)] = jnp.asarray(
                    g.standard_normal((o, i), dtype=np.float32) * 0.02, dtype=jnp.bfloat16
                )
            p[f"{name}.weight"] = shared[("dense", key)]
        if bias:
            if ("b", o) not in shared:
                shared[("b", o)] = jnp.zeros((o,), dtype=jnp.bfloat16)
            p[f"{name}.bias"] = shared[("b", o)]

    def scale(name, dim=None):
        key = ("scale", dim or d_head)
        if key not in shared:
            shared[key] = jnp.ones((dim or d_head,), dtype=jnp.bfloat16)
        p[name] = shared[key]

    _flux_param_walk(cfg, lin, scale)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 128, 128, 16)), dtype=jnp.bfloat16)
    ctx = jnp.asarray(rng.standard_normal((1, 256, 4096)), dtype=jnp.bfloat16)
    y = jnp.asarray(rng.standard_normal((1, 768)), dtype=jnp.bfloat16)
    gg = jnp.asarray([3.5], dtype=jnp.float32)
    t = jnp.asarray([0.7], dtype=jnp.float32)
    # on-device loop: one dispatch for n steps (a per-call Python loop
    # measures host/tunnel dispatch latency, not the model)
    n = 8

    def run(p, x, t, c, y, g):
        def body(i, xx):
            return flux_forward(p, xx * 0.99, t, c, y, guidance=g, cfg=cfg)

        return jax.lax.fori_loop(0, n, body, x)

    runj = jax.jit(run)
    np.asarray(runj(p, x, t, ctx, y, gg))  # compile + warm

    t0 = time.time()
    out = runj(p, x, t, ctx, y, gg)
    np.asarray(out)  # force completion (block_until_ready is async under axon)
    dt = (time.time() - t0) / n
    return [{
        "metric": "flux1_1024_denoise_steps_per_s_microkernel",
        "value": round(1.0 / dt, 4),
        "unit": "steps/s",
        "vs_baseline": None,
    }]


def main():
    _enable_cache()
    results = []

    def run(fn, min_budget_s=0.0):
        if _remaining() < min_budget_s:
            r = [{"metric": fn.__name__, "skipped":
                  f"bench budget exhausted ({_remaining():.0f}s left)"}]
        else:
            try:
                r = fn()
            except Exception as e:  # informational benches must not kill the run
                r = [{"metric": fn.__name__, "error": f"{type(e).__name__}: {e}"}]
        for m in r:
            print(json.dumps(m), flush=True)
        results.extend(r)
        gc.collect()

    # north stars first — always run
    run(bench_sd15)
    run(bench_flux_pipeline)
    # informational tier, budget-gated (each prints or reports skipped)
    run(bench_flux_gguf_memclass, min_budget_s=420)
    run(bench_sdxl_lcm_taesd, min_budget_s=420)
    run(bench_sd35_medium, min_budget_s=420)
    run(bench_wan21_t2v, min_budget_s=600)
    run(bench_flux_kernel, min_budget_s=240)

    north = [r for r in results
             if r.get("metric") in ("sd15_512_20step_euler_a_e2e",
                                    "flux1_1024_denoise_steps_per_s")
             and "value" in r]
    worst = min(north, key=lambda r: r["vs_baseline"])
    print(
        json.dumps(
            {
                "metric": "sd15_e2e+flux_steps_per_s",
                "value": worst["value"],
                "unit": worst["unit"],
                "vs_baseline": worst["vs_baseline"],
                "metrics": results,
            }
        )
    )


if __name__ == "__main__":
    main()

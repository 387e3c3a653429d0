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

3. FLUX time-to-first-image from a 13.4 GB on-disk q8_0 GGUF (parse /
   stage+upload / first-image breakdown; cold page cache when permitted).
4. FLUX cold-prompt e2e (fresh prompt each run: T5-XXL encode counted).
5. FLUX.1 1024² denoise rate with the GGUF keep-quant memory class
   (GroupQuantTensor, ggml group-32 blocks) at the full 13.4 GB footprint.
6. SDXL 1024² + TAESD decode, LCM 4-step (LCM-LoRA merges offline, so random
   weights measure the same compute) — cached + cold-prompt e2e.
7. SD3.5-Medium (MMDiT-X) 1024² DPM++2M 28-step — cached + cold-prompt e2e.
8. Wan2.1-T2V-1.3B 480×832×33f: DiT steps/s + causal-VAE decode s/frame.
9. FLUX kernel micro-bench (shared buffers — r3 metric kept for continuity).

steps/s entries carry achieved_tflops + mfu_bf16_pct from analytic FLOP
counts (docs/performance.md "Roofline").  "e2e_p50_cached_prompt" metrics
serve cached conditioning (steady state); "cold_prompt" ones re-encode.

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


# v5e peak rates (per chip): 197 bf16 TFLOP/s, 394 int8 TOP/s.  MFU below is
# reported against the bf16 peak — the W8A8/int8 paths have 2× headroom on
# top, so 100% is not the int8 ceiling.
PEAK_BF16_TFLOPS = 197.0


def _mfu(flops_per_step: float, step_s: float) -> dict:
    """→ {achieved_tflops, mfu_bf16_pct} from an analytic per-step FLOP
    count (VERDICT r4 next #4: roofline context for every config)."""
    tflops = flops_per_step / step_s / 1e12
    return {
        "achieved_tflops": round(tflops, 2),
        "mfu_bf16_pct": round(100.0 * tflops / PEAK_BF16_TFLOPS, 1),
    }


def flux_step_flops(width=1024, height=1024, txt_tokens=256, cfg_forwards=1):
    """Analytic FLOPs of one FLUX.1-dev denoise step (matmuls + attention;
    modulation/embedding terms are per-sample and negligible)."""
    h = 3072
    t_img = (height // 16) * (width // 16)  # 2×2 latent patches
    t = t_img + txt_tokens
    # double blocks (19): per-stream qkv(3h²)+proj(h²)+mlp(8h²) = 12h²/token
    dbl = 19 * 2 * 12 * h * h * (t_img + txt_tokens)
    # single blocks (38): linear1 h→(3h+4h), linear2 5h→h = 12h²/token
    sgl = 38 * 2 * 12 * h * h * t
    # joint attention: QK^T + AV = 4·T²·h per block (57 blocks)
    attn = 57 * 4 * t * t * h
    return cfg_forwards * float(dbl + sgl + attn)


def sdxl_step_flops(width=1024, height=1024, cfg_forwards=1):
    """SDXL UNet ≈ 2.6B params with ~0.69 of them in attention/res blocks
    running on multi-resolution token grids; use the standard estimate
    2·P_eff·tokens with per-level token counts."""
    # level dims (model_channels 320): 320@128², 640@64², 1280@32²
    lx, ly = width // 8, height // 8
    fl = 0.0
    # resnets+attention per level — coarse but within ~15%: count linears
    # via params at each resolution
    # level params (approx split of 2.6B): 0.08B@full, 0.66B@/2, 1.86B@/4
    for p, scale in ((0.08e9, 1), (0.66e9, 2), (1.86e9, 4)):
        toks = (lx // scale) * (ly // scale)
        fl += 2 * p * toks
    # transformer self-attention terms at /2 (2 layers×...) and /4 (10 ish)
    d = 640
    fl += 4 * ((lx // 2) * (ly // 2)) ** 2 * d * 4
    d = 1280
    fl += 4 * ((lx // 4) * (ly // 4)) ** 2 * d * 20
    return cfg_forwards * float(fl)


def sd15_step_flops(width=512, height=512, cfg_forwards=2):
    lx, ly = width // 8, height // 8
    fl = 0.0
    for p, scale in ((0.12e9, 1), (0.2e9, 2), (0.3e9, 4), (0.24e9, 8)):
        toks = (lx // scale) * (ly // scale)
        fl += 2 * p * toks
    for d, scale, layers in ((320, 1, 2), (640, 2, 2), (1280, 4, 2), (1280, 8, 3)):
        fl += 4 * ((lx // scale) * (ly // scale)) ** 2 * d * layers
    return cfg_forwards * float(fl)


def sd35m_step_flops(width=1024, height=1024, cfg_forwards=2):
    """SD3.5-Medium MMDiT-X: 24 blocks (first 13 dual-stream x-blocks),
    hidden 1536, patch 2 → 4096 img tokens + 154+77 ctx, per-block
    12h²/token + attention."""
    h, blocks = 1536, 24
    t_img = (height // 16) * (width // 16)
    t_ctx = 154
    t = t_img + t_ctx
    lin = blocks * 2 * 12 * h * h * t
    attn = blocks * 4 * t * t * h
    return cfg_forwards * float(lin + attn)


def wan13b_step_flops(width=832, height=480, latent_frames=9, cfg_forwards=2):
    """Wan2.1-1.3B: 30 blocks, dim 1536, ffn 8960, patch (1,2,2) on the
    8×-downscaled latent; self-attn over all tokens + 512-token cross."""
    h, ffn, blocks, t_ctx = 1536, 8960, 30, 512
    t = latent_frames * (height // 16) * (width // 16)
    # per token: self-attn qkv+proj (4h²) + cross-attn q+o (2h²) + ffn (4·h·ffn
    # counting both linears at 2 FLOPs/MAC); cross k/v run on the 512 ctx tokens
    lin = blocks * (2 * t * (4 * h * h + 2 * h * h + 2 * h * ffn)
                    + 2 * t_ctx * 2 * h * h)
    attn = blocks * (4 * t * t * h + 4 * t * t_ctx * h)
    return cfg_forwards * float(lin + attn)


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
        **_mfu(sd15_step_flops(), pipe.last_timings["sample"] / 20),
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
    pipe.set_vae_tiling(True)

    steps = 20
    gp = GenerationParams(
        prompt="a photograph of an astronaut riding a horse",
        width=1024, height=1024, sample_steps=steps,
        cfg_scale=1.0, guidance=3.5, seed=42, sample_method="euler",
    )
    results = []
    # steady-state: cached conditioning, text encoders freed after encode
    # (reference sd_ctx_params_t.free_params_immediately); the fresh-prompt
    # variant lives in bench_flux_cold_prompt
    pipe.free_params_immediately = True
    pipe.txt2img(gp)  # compile + warm; frees the text encoders
    samples, totals = [], []
    for _ in range(3):
        pipe.txt2img(gp)
        samples.append(pipe.last_timings["sample"])
        totals.append(pipe.last_timings["total"])
    steps_per_s = steps / min(samples)
    totals.sort()
    results += [
        {
            "metric": "flux1_1024_denoise_steps_per_s",
            "value": round(steps_per_s, 4),
            "unit": "steps/s",
            "vs_baseline": round(steps_per_s / 2.0, 4),
            **_mfu(flux_step_flops(), min(samples) / steps),
        },
        {
            "metric": "flux1_1024_20step_e2e_p50_cached_prompt",
            "value": round(totals[len(totals) // 2], 4),
            "unit": "s",
            "vs_baseline": None,
        },
    ]
    return results


def bench_flux_cold_prompt():
    """Fresh-prompt FLUX e2e (VERDICT r4 weak #2: the steady-state p50 serves
    cached conditioning, so T5-XXL encode never lands in the timed window).
    Text encoders stay RESIDENT (free_params_immediately off) and every timed
    run uses a new prompt, so conditioning → sampling → tiled decode all
    count.  Separate pipeline from the north star so a tight-fit OOM here
    cannot take the headline metric down."""
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
    pipe.set_vae_tiling(True)

    steps = 20
    base = "a photograph of an astronaut riding a horse"
    gp = GenerationParams(prompt=base, width=1024, height=1024,
                          sample_steps=steps, cfg_scale=1.0, guidance=3.5,
                          seed=42, sample_method="euler")
    pipe.txt2img(gp)  # compile + warm (TEs resident)
    colds = []
    for i in range(3):
        gpc = GenerationParams(**{**gp.__dict__, "prompt": f"{base}, take {i}"})
        pipe.txt2img(gpc)
        colds.append(pipe.last_timings["total"])
    colds.sort()
    return [{
        "metric": "flux1_1024_20step_e2e_cold_prompt_p50",
        "value": round(colds[len(colds) // 2], 4),
        "unit": "s",
        "vs_baseline": None,
    }]


def bench_flux_load_to_first_image():
    """Time-to-first-image from a CHECKPOINT FILE (VERDICT r4 missing #1: no
    number anywhere measured loading from disk).  A full-size synthetic
    FLUX.1-dev q8_0 GGUF (~13.4 GB, written once and cached at
    /tmp/sdtpu_bench_flux_q8.gguf) goes through the real
    load_model_bundle(keep_quant) → host_params_to_device (default per-row
    q8_0 promotion) → HBM upload → create_pipeline → 4-step 1024² image.
    T5/CLIP/VAE are synthesized in HBM — the 13.4 GB diffusion file dominates
    the byte traffic.  OS page cache is dropped first when permitted, so the
    parse leg includes real disk reads."""
    import jax
    import numpy as np

    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.factory import create_pipeline
    from sdtpu.io.model_loader import load_model_bundle
    from sdtpu.models import clip as clip_mod
    from sdtpu.models import flux as flux_mod
    from sdtpu.models import t5 as t5_mod
    from sdtpu.models import vae as vae_mod
    from sdtpu.ops.quant import host_params_to_device
    from sdtpu.utils.device_init import param_specs, synthesize_params, \
        write_synthetic_gguf

    path = os.environ.get("SDTPU_BENCH_GGUF", "/tmp/sdtpu_bench_flux_q8.gguf")
    if not os.path.exists(path):
        t0 = time.time()
        specs = param_specs(flux_mod.init_flux_params, flux_mod.FLUX_DEV_CONFIG)
        nbytes = write_synthetic_gguf(path, specs)
        print(json.dumps({"note": "synthetic FLUX q8_0 GGUF written",
                          "bytes": nbytes,
                          "write_s": round(time.time() - t0, 1)}), flush=True)
    try:  # cold page cache → parse includes disk reads
        with open("/proc/sys/vm/drop_caches", "w") as f:
            f.write("3\n")
    except OSError:
        pass

    t0 = time.time()
    bundle = load_model_bundle(diffusion_model_path=path, keep_quant=True)
    t_parse = time.time() - t0

    # per-row W8A8 promotion (the CLI default for q8_0 GGUFs, cli.py:688) —
    # also ~1.5 GB lighter than keep-quant blocks (no f32 group scales)
    d = host_params_to_device(bundle.diffusion, rowwise=True)
    leaves = [x for x in jax.tree.leaves(d) if hasattr(x, "block_until_ready")]
    for x in leaves:
        x.block_until_ready()
    t_stage = time.time() - t0 - t_parse

    dtype = _dtype()
    params = {
        "diffusion": d,
        "t5": synthesize_params(t5_mod.init_t5_params, t5_mod.T5_XXL_CONFIG,
                                quant="q4_0", seed=2, dtype=dtype),
        "clip_l": synthesize_params(clip_mod.init_clip_params,
                                    clip_mod.CLIP_L_CONFIG, 3, dtype=dtype),
        "vae": synthesize_params(vae_mod.init_vae_params,
                                 vae_mod.FLUX_VAE_CONFIG, seed=4, dtype=dtype),
    }
    pipe = create_pipeline(SDVersion.FLUX, params=params, dtype=dtype)
    del params, d, bundle
    pipe.free_params_immediately = True
    pipe.set_vae_tiling(True)
    gp = GenerationParams(prompt="a cat", width=1024, height=1024,
                          sample_steps=4, cfg_scale=1.0, guidance=3.5,
                          seed=42, sample_method="euler")
    res = pipe.txt2img(gp)
    assert np.isfinite(np.asarray(res.latents, dtype=np.float32)).all()
    total = time.time() - t0
    return [{
        "metric": "flux_load_to_first_image_s",
        "value": round(total, 2),
        "unit": "s",
        "vs_baseline": None,
        "parse_s": round(t_parse, 2),
        "stage_upload_s": round(t_stage, 2),
        "first_image_s": round(total - t_parse - t_stage, 2),
        "load_threads": os.environ.get("SDTPU_LOAD_THREADS", "auto"),
    }]


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
        **_mfu(flux_step_flops(), 1.0 / steps_per_s),
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
    colds = []
    for i in range(3):  # fresh prompts: CLIP-L/G encode inside the window
        gpc = GenerationParams(**{**gp.__dict__,
                                  "prompt": f"{gp.prompt}, take {i}"})
        pipe.txt2img(gpc)
        colds.append(pipe.last_timings["total"])
    colds.sort()
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
            "metric": "sdxl_1024_lcm4_taesd_e2e_cold_prompt_p50",
            "value": round(colds[len(colds) // 2], 4),
            "unit": "s",
            "vs_baseline": None,
        },
        {
            "metric": "sdxl_1024_denoise_steps_per_s",
            "value": round(steps / min(samples), 4),
            "unit": "steps/s",
            "vs_baseline": None,
            **_mfu(sdxl_step_flops(), min(samples) / steps),
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

    steps = 28
    gp = GenerationParams(
        prompt="a photograph of an astronaut riding a horse",
        negative_prompt="blurry", width=1024, height=1024,
        sample_steps=steps, cfg_scale=4.5, seed=42, sample_method="dpm++2m",
    )
    pipe.txt2img(gp)  # warm (TEs resident for the cold-prompt phase)
    colds = []
    for i in range(3):  # fresh prompts: CLIP-L/G + q4 T5-XXL encode counted
        gpc = GenerationParams(**{**gp.__dict__,
                                  "prompt": f"{gp.prompt}, take {i}"})
        pipe.txt2img(gpc)
        colds.append(pipe.last_timings["total"])
    colds.sort()
    pipe.free_params_immediately = True
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
            **_mfu(sd35m_step_flops(), min(samples) / steps),
        },
        {
            "metric": "sd35_medium_1024_28step_e2e_p50",
            "value": round(totals[len(totals) // 2], 4),
            "unit": "s",
            "vs_baseline": None,
        },
        {
            "metric": "sd35_medium_1024_28step_e2e_cold_prompt_p50",
            "value": round(colds[len(colds) // 2], 4),
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
            **_mfu(wan13b_step_flops(), min(samples) / steps),
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


def _reset_device():
    """Hermetic section boundary: drop every HBM buffer and the in-memory jit
    executable cache (compiled executables pin their captured device
    constants).  Without this, a 12 GB section leaves the next one with a
    poisoned HBM — one OOM then cascades through every later section.  The
    persistent on-disk compile cache survives, so retraces re-land in
    seconds."""
    import jax

    gc.collect()
    for buf in jax.live_arrays():
        buf.delete()
    jax.clear_caches()
    gc.collect()


def main():
    _enable_cache()
    results = []
    only = os.environ.get("SDTPU_BENCH_ONLY", "")
    only_set = {s.strip() for s in only.split(",") if s.strip()}

    def run(fn, min_budget_s=0.0):
        if only_set and fn.__name__ not in only_set:
            return
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
        _reset_device()

    # north stars first — always run
    run(bench_sd15)
    run(bench_flux_pipeline)
    # informational tier, budget-gated (each prints or reports skipped)
    run(bench_flux_load_to_first_image, min_budget_s=900)
    run(bench_flux_cold_prompt, min_budget_s=420)
    run(bench_flux_gguf_memclass, min_budget_s=420)
    run(bench_sdxl_lcm_taesd, min_budget_s=420)
    run(bench_sd35_medium, min_budget_s=420)
    run(bench_wan21_t2v, min_budget_s=600)
    run(bench_flux_kernel, min_budget_s=240)

    north = [r for r in results
             if r.get("metric") in ("sd15_512_20step_euler_a_e2e",
                                    "flux1_1024_denoise_steps_per_s")
             and "value" in r]
    if not north:  # SDTPU_BENCH_ONLY filtered the north stars out
        print(json.dumps({"metric": "partial_bench", "value": len(results),
                          "unit": "metrics", "vs_baseline": None,
                          "metrics": results}))
        return
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

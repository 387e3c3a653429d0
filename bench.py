"""Driver benchmark: both BASELINE.md north-star metrics on one chip.

1. SD1.5 512×512 20-step Euler-A txt2img end-to-end — target < 1 s.
2. FLUX.1 1024×1024 denoise throughput (int8-in-HBM weights, Pallas
   dequant-matmul) — target ≥ 2 denoise steps/s.

Prints one JSON line per metric, then a combined line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "metrics": [...]}
vs_baseline ≥ 1 means meeting/beating the target; the combined line reports
the weaker (min) of the two so a regression in either shows up.
"""
import json
import time


def _enable_cache():
    """Persistent XLA compile cache — driver re-runs skip the ~2 min FLUX
    compile (VERDICT r2 weak #2)."""
    from sdtpu.utils import enable_compilation_cache

    enable_compilation_cache()


def bench_sd15():
    """SD1.5 e2e: random bf16 weights — identical compute graph to real."""
    import jax
    import jax.numpy as jnp

    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.factory import create_pipeline

    dtype = jnp.bfloat16 if jax.devices()[0].platform == "tpu" else jnp.float32
    pipe = create_pipeline(SDVersion.SD1, small=False, dtype=dtype)

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
    return {
        "metric": "sd15_512_20step_euler_a_e2e",
        "value": round(value, 4),
        "unit": "s",
        "vs_baseline": round(1.0 / value, 4),
    }


def bench_flux():
    """FLUX.1-dev 1024² denoise step rate.  Weights are int8 in HBM (Pallas
    dequant-matmul, sdtpu/ops/quant.py) — the TPU-native analog of the
    reference's q8_0 GGUF path (docs/flux.md:36-38) that fits the 11.9B-param
    model in a 16 GB v5e.  Weight buffers are shared per unique shape so the
    benchmark initializes in seconds; per-step compute and HBM traffic match
    the real model."""
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
    # The pipeline samples inside an on-device lax.scan (pipeline.py), so the
    # denoise loop here must too: one dispatch for n steps.  A per-call Python
    # loop measures host/tunnel dispatch latency (~1.3 s/call under axon),
    # not the model — that was the r2 0.59-vs-2.07 steps/s discrepancy.
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
    steps_per_s = 1.0 / dt
    return {
        "metric": "flux1_1024_denoise_steps_per_s",
        "value": round(steps_per_s, 4),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_s / 2.0, 4),
    }


def main():
    _enable_cache()
    results = []
    for fn in (bench_sd15, bench_flux):
        r = fn()
        print(json.dumps(r), flush=True)
        results.append(r)
    worst = min(results, key=lambda r: r["vs_baseline"])
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

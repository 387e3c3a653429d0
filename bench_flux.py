"""FLUX.1 1024×1024 denoise throughput on one chip (int8 weights in HBM,
Pallas dequant-matmul). Target: ≥2 denoise steps/s (BASELINE.md)."""
import json
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sdtpu.models.flux import FLUX_DEV_CONFIG, flux_forward, init_flux_params_quantized

    cfg = FLUX_DEV_CONFIG
    print("building int8 FLUX.1-dev params…", flush=True)
    params = init_flux_params_quantized(cfg, seed=0)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 128, 128, 16)), dtype=jnp.bfloat16)
    ctx = jnp.asarray(rng.standard_normal((1, 256, 4096)), dtype=jnp.bfloat16)
    y = jnp.asarray(rng.standard_normal((1, 768)), dtype=jnp.bfloat16)
    g = jnp.asarray([3.5], dtype=jnp.float32)
    t = jnp.asarray([0.7], dtype=jnp.float32)

    fwd = jax.jit(lambda p, x, t, c, y, g: flux_forward(p, x, t, c, y, guidance=g, cfg=cfg))
    print("compiling…", flush=True)
    fwd(params, x, t, ctx, y, g).block_until_ready()
    n = 6
    t0 = time.time()
    out = x
    for _ in range(n):
        out = fwd(params, out, t, ctx, y, g)
    out.block_until_ready()
    dt = (time.time() - t0) / n
    steps_per_s = 1.0 / dt
    print(
        json.dumps(
            {
                "metric": "flux1_1024_denoise_steps_per_s",
                "value": round(steps_per_s, 4),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_s / 2.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()

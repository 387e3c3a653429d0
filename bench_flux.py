"""FLUX.1 1024×1024 denoise throughput on one chip.

Weights are int8 in HBM (Pallas dequant-matmul, sdtpu/ops/quant.py) — the
TPU-native analog of the reference's q8_0 GGUF path that makes an 11.9B-param
model fit a 16 GB v5e.  Weight buffers are shared per unique shape so the
benchmark initializes in seconds; per-step compute and HBM traffic match the
real model.  Target: ≥2 denoise steps/s (BASELINE.md).
"""
import json
import time


def main():
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
    fwd = jax.jit(lambda p, x, t, c, y, g: flux_forward(p, x, t, c, y, guidance=g, cfg=cfg))
    np.asarray(fwd(p, x, t, ctx, y, gg))  # compile + warm

    n = 8
    t0 = time.time()
    out = x
    for _ in range(n):
        out = fwd(p, out * 0.99, t, ctx, y, gg)
    np.asarray(out)  # force completion (block_until_ready is async under axon)
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

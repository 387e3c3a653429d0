"""Benchmark: SD1.5 512×512 20-step Euler-A txt2img end-to-end on one chip.

Target (BASELINE.md): < 1 s e2e on 1× TPU v5e.  Random bf16 weights (identical
compute graph to real weights).  Prints ONE JSON line:
  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": target/value}
vs_baseline ≥ 1 means meeting/beating the 1 s target.
"""
import json
import sys
import time


def main():
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

    # warmup (compile)
    pipe.txt2img(gp)

    times = []
    for _ in range(3):
        t0 = time.time()
        pipe.txt2img(gp)
        times.append(time.time() - t0)
    value = min(times)

    target = 1.0
    print(
        json.dumps(
            {
                "metric": "sd15_512_20step_euler_a_e2e",
                "value": round(value, 4),
                "unit": "s",
                "vs_baseline": round(target / value, 4),
            }
        )
    )


if __name__ == "__main__":
    main()

import time, numpy as np, jax, jax.numpy as jnp
from sdtpu.models.flux import FLUX_DEV_CONFIG, flux_forward, init_flux_params_quantized
cfg = FLUX_DEV_CONFIG
t0=time.time()
params = init_flux_params_quantized(cfg, seed=0)
print("init:", time.time()-t0, flush=True)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((1, 128, 128, 16)), dtype=jnp.bfloat16)
ctx = jnp.asarray(rng.standard_normal((1, 256, 4096)), dtype=jnp.bfloat16)
y = jnp.asarray(rng.standard_normal((1, 768)), dtype=jnp.bfloat16)
g = jnp.asarray([3.5], dtype=jnp.float32)
t = jnp.asarray([0.7], dtype=jnp.float32)
fwd = jax.jit(lambda p, x, t, c, y, g: flux_forward(p, x, t, c, y, guidance=g, cfg=cfg))
t0=time.time()
r = fwd(params, x, t, ctx, y, g)
r.block_until_ready()
print("compile+first:", time.time()-t0, flush=True)
print("out sample:", np.asarray(r[0, :2, 0, 0]), "finite:", bool(jnp.isfinite(r).all()), flush=True)
for trial in range(3):
    t0 = time.time()
    r2 = fwd(params, x, t, ctx, y, g)
    r2.block_until_ready()
    print(f"single fwd: {time.time()-t0:.4f}s", flush=True)
print("DONE", flush=True)

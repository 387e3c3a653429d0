import time, numpy as np, jax, jax.numpy as jnp
from sdtpu.ops.quant import QuantTensor
from sdtpu.models.flux import FLUX_DEV_CONFIG, _flux_param_walk, flux_forward
cfg = FLUX_DEV_CONFIG
g = np.random.default_rng(0)
p = {}
count = [0]
t_start = time.time()
d_head = cfg.hidden_size // cfg.num_heads
def lin(name, o, i, bias=True):
    t0 = time.time()
    if o * i >= (1 << 16):
        q = g.integers(-127, 128, size=(o, i), dtype=np.int8)
        s = np.full((o,), 0.02 / 127, dtype=np.float32)
        p[f"{name}.weight"] = QuantTensor(q=jnp.asarray(q), scale=jnp.asarray(s))
    else:
        p[f"{name}.weight"] = jnp.asarray(g.standard_normal((o, i), dtype=np.float32) * 0.02, dtype=jnp.bfloat16)
    if bias:
        p[f"{name}.bias"] = jnp.zeros((o,), dtype=jnp.bfloat16)
    count[0] += 1
    if count[0] % 20 == 0:
        print(f"{count[0]} tensors, {time.time()-t_start:.1f}s (last {name}: {time.time()-t0:.2f}s)", flush=True)
def scale(name):
    p[name] = jnp.ones((d_head,), dtype=jnp.bfloat16)
_flux_param_walk(cfg, lin, scale)
print("init done:", time.time()-t_start, flush=True)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((1, 128, 128, 16)), dtype=jnp.bfloat16)
ctx = jnp.asarray(rng.standard_normal((1, 256, 4096)), dtype=jnp.bfloat16)
y = jnp.asarray(rng.standard_normal((1, 768)), dtype=jnp.bfloat16)
gg = jnp.asarray([3.5], dtype=jnp.float32)
t = jnp.asarray([0.7], dtype=jnp.float32)
fwd = jax.jit(lambda p, x, t, c, y, g: flux_forward(p, x, t, c, y, guidance=g, cfg=cfg))
t0=time.time()
r = fwd(p, x, t, ctx, y, gg); r.block_until_ready()
print("compile+first:", time.time()-t0, flush=True)
print("sample:", np.asarray(r[0, :1, 0, :2]), flush=True)
for _ in range(3):
    t0=time.time(); r2 = fwd(p, x, t, ctx, y, gg); r2.block_until_ready()
    print(f"fwd: {time.time()-t0:.3f}s", flush=True)
print("DONE", flush=True)

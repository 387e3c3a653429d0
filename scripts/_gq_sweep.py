"""Block-size sweep for group_quant_matmul at FLUX shapes (GGUF memory
class perf): dequant work per weight tile is re-done for every m-tile, so
larger block_m amortizes the VPU dequant against more MXU output rows."""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

import jax
import jax.numpy as jnp

from sdtpu.ops.quant import group_quant_matmul, quant_matmul, quantize_group, quantize_per_channel

M, K, N = 4608, 3072, 3072  # FLUX double-block qkv-ish shape at 1024²
rng = np.random.default_rng(0)
w = (rng.standard_normal((N, K)) * 0.02).astype(np.float32)
x = jnp.asarray(rng.standard_normal((M, K)), dtype=jnp.bfloat16)

gq = quantize_group(w, group=32)
gq = type(gq)(q=jnp.asarray(gq.q), scale=jnp.asarray(gq.scale),
              zero=None, k=gq.k, group=gq.group)
pc = quantize_per_channel(w)
pc = type(pc)(q=jnp.asarray(pc.q), scale=jnp.asarray(pc.scale))


def timeit(f, n=10):
    jax.block_until_ready(f())  # compile
    t0 = time.time()
    for _ in range(n):
        o = f()
    np.asarray(o[0, 0])
    return (time.time() - t0) / n


base = timeit(jax.jit(lambda: quant_matmul(x, pc)))
print(f"per-row int8 quant_matmul: {base*1e3:.3f} ms "
      f"({2*M*K*N/base/1e12:.1f} TFLOP/s)", flush=True)

for bm, bn, bk in [(256, 512, 512), (512, 512, 512), (1024, 512, 512),
                   (2304, 512, 512), (4608, 512, 512),
                   (1024, 512, 1024), (2304, 512, 1024), (1024, 1024, 512)]:
    try:
        f = jax.jit(lambda bm=bm, bn=bn, bk=bk: group_quant_matmul(
            x, gq, block_m=bm, block_n=bn, block_k=bk))
        dt = timeit(f)
        print(f"gq bm={bm:5d} bn={bn:4d} bk={bk:4d}: {dt*1e3:.3f} ms "
              f"({2*M*K*N/dt/1e12:.1f} TFLOP/s, {dt/base:.2f}x per-row)", flush=True)
    except Exception as e:
        print(f"gq bm={bm} bn={bn} bk={bk}: FAIL {type(e).__name__}: {str(e)[:120]}",
              flush=True)

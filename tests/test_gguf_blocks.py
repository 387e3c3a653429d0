"""Direct GGUF quant-block loading: the checkpoint's own (q, scale, zero)
grid reaches the device with no f32 round-trip (VERDICT r2 missing #1;
reference keeps ggml block types end-to-end, src/model_io/tensor_storage.h:16).

Covers: per-type extract == ggml dequant exactly, host→device mapping
(GroupQuantTensor / packed Q4Tensor), matmul numerics on the checkpoint
grid, and end-to-end save→load(keep_quant)→linear.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from sdtpu.io import gguf
from sdtpu.io.gguf import (
    BLOCK_INFO,
    DEQUANT_FNS,
    EXTRACT_FNS,
    GGML_Q2_K,
    GGML_Q3_K,
    GGML_Q4_K,
    GGML_Q5_K,
    GGML_Q6_K,
    GGML_Q4_0,
    GGML_Q4_1,
    GGML_Q5_0,
    GGML_Q5_1,
    GGML_Q8_0,
    HostQuant,
    extract_blocks,
)
from sdtpu.ops.quant import (
    GroupQuantTensor,
    Q4Tensor,
    dequantize_group,
    dequantize_q4,
    from_host_quant,
    group_quant_matmul,
    host_params_to_device,
)

# byte spans holding f16 floats inside one block, per type (everything else
# is integer payload, so random bytes are structurally valid)
F16_SPANS = {
    GGML_Q4_0: [(0, 2)],
    GGML_Q4_1: [(0, 2), (2, 4)],
    GGML_Q5_0: [(0, 2)],
    GGML_Q5_1: [(0, 2), (2, 4)],
    GGML_Q8_0: [(0, 2)],
    GGML_Q2_K: [(80, 82), (82, 84)],
    GGML_Q3_K: [(108, 110)],
    GGML_Q4_K: [(0, 2), (2, 4)],
    GGML_Q5_K: [(0, 2), (2, 4)],
    GGML_Q6_K: [(208, 210)],
}


def _random_blocks(ggml_type: int, nb: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    _, block_bytes = BLOCK_INFO[ggml_type]
    raw = rng.integers(0, 256, size=(nb, block_bytes), dtype=np.uint8)
    for lo, hi in F16_SPANS[ggml_type]:
        d = (rng.standard_normal(nb) * 0.05).astype(np.float16)
        raw[:, lo:hi] = d.view(np.uint8).reshape(nb, 2)
    return raw.reshape(-1)


@pytest.mark.parametrize("ggml_type", sorted(EXTRACT_FNS))
def test_extract_matches_ggml_dequant(ggml_type):
    """extract_blocks reproduces ggml dequant bit-for-bit from raw blocks."""
    block_elems, _ = BLOCK_INFO[ggml_type]
    nb = 8
    raw = _random_blocks(ggml_type, nb, seed=ggml_type)
    want = DEQUANT_FNS[ggml_type](raw, nb).reshape(nb * block_elems)
    hq = extract_blocks(raw, ggml_type, nb * block_elems, (nb * block_elems,))
    assert hq is not None
    got = hq.dequantize()
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("ggml_type", sorted(EXTRACT_FNS))
def test_host_to_device_roundtrip(ggml_type):
    """from_host_quant: device dequant equals host dequant (same blocks)."""
    block_elems, _ = BLOCK_INFO[ggml_type]
    n, k = 4, block_elems * 4  # 2-D weight [4, 4 blocks per row]
    raw = _random_blocks(ggml_type, (n * k) // block_elems, seed=ggml_type + 100)
    hq = extract_blocks(raw, ggml_type, n * k, (n, k))
    dev = from_host_quant(hq, block_k=128)
    if isinstance(dev, Q4Tensor):
        got = np.asarray(dequantize_q4(dev, jnp.float32))
    else:
        assert isinstance(dev, GroupQuantTensor)
        got = np.asarray(dequantize_group(dev, jnp.float32))
    np.testing.assert_allclose(got, hq.dequantize(), rtol=0, atol=1e-6)


def test_q4_0_stays_packed_on_host():
    n, k = 4, 256
    raw = _random_blocks(GGML_Q4_0, (n * k) // 32, seed=7)
    hq = extract_blocks(raw, GGML_Q4_0, n * k, (n, k))
    assert hq.qbits == 4
    assert hq.q.nbytes == n * k // 2  # nibble-packed, ~file-size RSS
    dev = from_host_quant(hq, block_k=128)
    assert isinstance(dev, Q4Tensor)  # stays 4-bit in HBM too


def test_rowwise_promote_w8a8_path():
    """host_params_to_device(rowwise=True): int8-class blocks re-quantize to
    per-row QuantTensors (the W8A8 MXU path the CLI's --type q8_0 selects on
    quantized GGUFs); 4-bit blocks keep their exact checkpoint form."""
    from sdtpu.ops.quant import QuantTensor, dequantize

    n, k = 8, 512  # k >= block_k so the q4_0 tensor packs to Q4Tensor
    raw8 = _random_blocks(GGML_Q8_0, (n * k) // 32, seed=11)
    hq8 = extract_blocks(raw8, GGML_Q8_0, n * k, (n, k))
    raw4 = _random_blocks(GGML_Q4_0, (n * k) // 32, seed=12)
    hq4 = extract_blocks(raw4, GGML_Q4_0, n * k, (n, k))
    dev = host_params_to_device(
        {"a.weight": hq8, "b.weight": hq4}, min_size=1, rowwise=True)
    assert isinstance(dev["a.weight"], QuantTensor)
    assert isinstance(dev["b.weight"], Q4Tensor)
    want = hq8.dequantize().reshape(n, k)
    got = np.asarray(dequantize(dev["a.weight"], jnp.float32))
    # per-row step is at most the row amax/127; allow one step of error
    step = np.abs(want).max(axis=1, keepdims=True) / 127.0
    assert np.all(np.abs(got - want) <= step + 1e-7)


def test_rowwise_promote_skips_kquants():
    """k-quants store int8 arrays on the host (qbits=8) but are NOT
    int8-class checkpoint types: collapsing q4_K's per-group scales+mins
    into one symmetric row scale would be a silent precision cliff, so
    rowwise promotion must gate on type_name, not storage width."""
    from sdtpu.io.gguf import GGML_Q4_K, GGML_Q6_K
    from sdtpu.ops.quant import GroupQuantTensor, QuantTensor

    n, k = 8, 512
    params = {}
    for name, t in (("kq4.weight", GGML_Q4_K), ("kq6.weight", GGML_Q6_K)):
        raw = _random_blocks(t, (n * k) // 256, seed=13)
        params[name] = extract_blocks(raw, t, n * k, (n, k))
    dev = host_params_to_device(params, min_size=1, rowwise=True)
    for name in params:
        assert isinstance(dev[name], GroupQuantTensor), name
        assert not isinstance(dev[name], QuantTensor), name


def test_group_quant_matmul_matches_dense():
    rng = np.random.default_rng(3)
    n, k = 96, 256
    raw = _random_blocks(GGML_Q8_0, (n * k) // 32, seed=11)
    hq = extract_blocks(raw, GGML_Q8_0, n * k, (n, k))
    dev = from_host_quant(hq)
    assert isinstance(dev, GroupQuantTensor)
    x = jnp.asarray(rng.standard_normal((8, k)).astype(np.float32))
    got = np.asarray(group_quant_matmul(x, dev))
    want = np.asarray(x) @ hq.dequantize().T
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_group_quant_matmul_affine_zero():
    """q4_1-class affine weights: the zero term factors through group sums."""
    rng = np.random.default_rng(4)
    n, k = 64, 128
    raw = _random_blocks(GGML_Q4_1, (n * k) // 32, seed=12)
    hq = extract_blocks(raw, GGML_Q4_1, n * k, (n, k))
    dev = from_host_quant(hq)
    assert isinstance(dev, GroupQuantTensor) and dev.zero is not None
    x = jnp.asarray(rng.standard_normal((8, k)).astype(np.float32))
    got = np.asarray(group_quant_matmul(x, dev))
    want = np.asarray(x) @ hq.dequantize().T
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_load_gguf_keep_quant_end_to_end(tmp_path):
    """save q8_0/q4_0 GGUF → load(keep_quant) → HostQuant → device → linear
    numerics equal the f32 load path's dequant of the same file."""
    from sdtpu.io.gguf import load_gguf, save_gguf
    from sdtpu.ops import linear

    rng = np.random.default_rng(5)
    tensors = {
        "blk.w8.weight": rng.standard_normal((64, 128)).astype(np.float32),
        "blk.w4.weight": rng.standard_normal((64, 512)).astype(np.float32),
        "blk.norm.weight": rng.standard_normal(64).astype(np.float32),
    }
    p = str(tmp_path / "m.gguf")
    save_gguf(p, tensors, out_type="q8_0")
    f32 = load_gguf(p)
    kept = load_gguf(p, keep_quant=True)
    assert isinstance(kept["blk.w8.weight"], HostQuant)
    assert isinstance(kept["blk.norm.weight"], np.ndarray)  # 1-D stays dense
    # host blocks == f32 path (same file, same grid)
    np.testing.assert_array_equal(kept["blk.w8.weight"].dequantize(),
                                  f32["blk.w8.weight"])
    dev = host_params_to_device(kept, min_size=1)
    assert isinstance(dev["blk.w8.weight"], GroupQuantTensor)
    x = jnp.asarray(rng.standard_normal((4, 128)).astype(np.float32))
    got = np.asarray(linear(x, dev["blk.w8.weight"]))
    want = np.asarray(x) @ f32["blk.w8.weight"].T
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_load_gguf_keep_quant_q4_0(tmp_path):
    from sdtpu.io.gguf import load_gguf, save_gguf
    from sdtpu.ops import linear

    rng = np.random.default_rng(6)
    tensors = {"blk.w.weight": rng.standard_normal((32, 512)).astype(np.float32)}
    p = str(tmp_path / "m4.gguf")
    save_gguf(p, tensors, out_type="q4_0")
    f32 = load_gguf(p)
    kept = load_gguf(p, keep_quant=True)
    hq = kept["blk.w.weight"]
    assert isinstance(hq, HostQuant) and hq.qbits == 4
    np.testing.assert_allclose(hq.dequantize(), f32["blk.w.weight"],
                               rtol=0, atol=1e-6)
    dev = host_params_to_device(kept, min_size=1)
    assert isinstance(dev["blk.w.weight"], Q4Tensor)
    x = jnp.asarray(rng.standard_normal((4, 512)).astype(np.float32))
    got = np.asarray(linear(x, dev["blk.w.weight"]))
    want = np.asarray(x) @ f32["blk.w.weight"].T
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_host_quant_array_fallback():
    """Paths that do math on a HostQuant transparently get f32."""
    raw = _random_blocks(GGML_Q8_0, 8, seed=13)
    hq = extract_blocks(raw, GGML_Q8_0, 256, (8, 32))
    a = np.asarray(hq)
    assert a.shape == (8, 32) and a.dtype == np.float32
    np.testing.assert_array_equal(hq.T, a.T)
    np.testing.assert_array_equal(np.concatenate([hq, a], axis=0)[:8], a)


def test_load_bundle_keep_quant(tmp_path):
    """A quantized diffusion GGUF flows through name conversion + module
    split with its blocks intact; conv/1-D tensors come through dense."""
    from sdtpu.io.gguf import save_gguf
    from sdtpu.io.model_loader import load_model_bundle

    rng = np.random.default_rng(8)
    unet = {
        "output_blocks.3.1.proj_in.weight": rng.standard_normal(
            (320, 320)).astype(np.float32),
        "input_blocks.0.0.weight": rng.standard_normal(
            (320, 4, 3, 3)).astype(np.float32),
    }
    p = str(tmp_path / "unet.gguf")
    save_gguf(p, unet, out_type="q8_0")
    bundle = load_model_bundle(diffusion_model_path=p, keep_quant=True)
    w = bundle.diffusion["output_blocks.3.1.proj_in.weight"]
    assert isinstance(w, HostQuant) and w.shape == (320, 320)
    conv = bundle.diffusion["input_blocks.0.0.weight"]
    assert isinstance(conv, np.ndarray) and conv.shape == (320, 4, 3, 3)


@pytest.mark.parametrize("ggml_type", [GGML_Q8_0, GGML_Q4_0])
def test_native_extract_split_matches_numpy(ggml_type, monkeypatch):
    """The threaded C extract_split (native/dequant.c) must produce the same
    payload bytes and f32 scales as the numpy strided extract."""
    import sdtpu.native as native_mod

    nb = 1024
    n_elems = nb * 32
    raw = _random_blocks(ggml_type, nb, seed=99)

    def run():
        native_mod._mod = None
        native_mod._tried = False
        fn = gguf.EXTRACT_FNS[ggml_type]
        return fn(raw, nb)

    got_native = run()
    if native_mod.get_native() is None:
        pytest.skip("native toolchain unavailable")
    monkeypatch.setenv("SDTPU_DISABLE_NATIVE", "1")
    got_numpy = run()
    monkeypatch.delenv("SDTPU_DISABLE_NATIVE")
    native_mod._mod = None
    native_mod._tried = False

    q_n, d_n = got_native[0], got_native[1]
    q_p, d_p = got_numpy[0], got_numpy[1]
    np.testing.assert_array_equal(
        np.asarray(q_n).reshape(-1).view(np.uint8),
        np.asarray(q_p).reshape(-1).view(np.uint8))
    np.testing.assert_array_equal(np.asarray(d_n).reshape(-1),
                                  np.asarray(d_p).reshape(-1))

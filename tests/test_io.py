"""Checkpoint IO tests: safetensors roundtrip, GGUF container + quant decode."""
import json
import struct

import numpy as np
import pytest

from sdtpu.io.gguf import (
    BLOCK_INFO,
    GGML_F16,
    GGML_F32,
    GGML_Q4_0,
    GGML_Q4_K,
    GGML_Q6_K,
    GGML_Q8_0,
    GGUFFile,
    dequantize,
)
from sdtpu.io.safetensors import SafetensorsFile, load_safetensors, save_safetensors


def test_safetensors_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    tensors = {
        "a.weight": rng.standard_normal((4, 8)).astype(np.float32),
        "b.bias": rng.standard_normal(16).astype(np.float16),
        "c": np.arange(6, dtype=np.int64).reshape(2, 3),
    }
    p = str(tmp_path / "x.safetensors")
    save_safetensors(p, tensors, metadata={"format": "pt"})
    f = SafetensorsFile(p)
    assert set(f.names()) == set(tensors)
    np.testing.assert_array_equal(f.tensor("a.weight"), tensors["a.weight"])
    np.testing.assert_allclose(f.tensor("b.bias"), tensors["b.bias"].astype(np.float32))
    loaded = load_safetensors(p)
    assert loaded["a.weight"].shape == (4, 8)


def test_safetensors_bf16(tmp_path):
    # craft a bf16 file manually
    vals = np.array([1.0, -2.5, 0.015625, 3.1415], dtype=np.float32)
    bf16 = (vals.view(np.uint32) >> 16).astype(np.uint16)
    header = {
        "t": {"dtype": "BF16", "shape": [4], "data_offsets": [0, 8]},
    }
    hjson = json.dumps(header).encode()
    p = tmp_path / "bf.safetensors"
    with open(p, "wb") as f:
        f.write(len(hjson).to_bytes(8, "little"))
        f.write(hjson)
        f.write(bf16.tobytes())
    out = SafetensorsFile(str(p)).tensor("t")
    # bf16 truncation error ≤ 2^-8 relative
    np.testing.assert_allclose(out, vals, rtol=1 / 256)


def test_q8_0_handcrafted():
    # one block: d = 0.5, qs = [-128..] pattern
    d = np.float16(0.5)
    qs = np.arange(-16, 16, dtype=np.int8)
    raw = np.frombuffer(d.tobytes() + qs.tobytes(), dtype=np.uint8)
    out = dequantize(raw, GGML_Q8_0, 32)
    np.testing.assert_allclose(out, qs.astype(np.float32) * 0.5)


def test_q4_0_handcrafted():
    d = np.float16(2.0)
    # low nibbles = elems 0..15, high nibbles = elems 16..31; q - 8 scaling
    lo = np.arange(16, dtype=np.uint8)
    hi = np.arange(16, dtype=np.uint8)[::-1]
    qs = (lo | (hi << 4)).astype(np.uint8)
    raw = np.frombuffer(d.tobytes() + qs.tobytes(), dtype=np.uint8)
    out = dequantize(raw, GGML_Q4_0, 32)
    want = np.concatenate([(lo.astype(np.int32) - 8), (hi.astype(np.int32) - 8)]) * 2.0
    np.testing.assert_allclose(out, want)


def _quantize_q8_0(x: np.ndarray) -> bytes:
    """ggml-style q8_0 quantizer (amax scaling, round-to-nearest)."""
    out = b""
    for blk in x.reshape(-1, 32):
        amax = np.abs(blk).max()
        d = amax / 127.0 if amax > 0 else 0.0
        q = np.round(blk / d).astype(np.int8) if d else np.zeros(32, np.int8)
        out += np.float16(d).tobytes() + q.tobytes()
    return out


def test_q8_0_roundtrip_error():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(256).astype(np.float32)
    raw = np.frombuffer(_quantize_q8_0(x), dtype=np.uint8)
    out = dequantize(raw, GGML_Q8_0, 256)
    # max error ~ d/2 per block
    assert np.abs(out - x).max() < np.abs(x).max() / 127


def _write_tiny_gguf(path, tensors, ttype=GGML_F32):
    """Minimal GGUF v3 writer for tests."""

    def s(txt):
        b = txt.encode()
        return struct.pack("<Q", len(b)) + b

    blob = b"GGUF" + struct.pack("<I", 3)
    blob += struct.pack("<Q", len(tensors))
    meta = {"general.alignment": 32}
    blob += struct.pack("<Q", len(meta))
    blob += s("general.alignment") + struct.pack("<I", 4) + struct.pack("<I", 32)
    data = b""
    offs = []
    for name, arr in tensors.items():
        offs.append(len(data))
        data += arr.astype(np.float32).tobytes()
        pad = (32 - len(data) % 32) % 32
        data += b"\0" * pad
    for (name, arr), off in zip(tensors.items(), offs):
        dims = list(reversed(arr.shape))  # gguf dims innermost-first
        blob += s(name) + struct.pack("<I", len(dims))
        for dM in dims:
            blob += struct.pack("<Q", dM)
        blob += struct.pack("<I", ttype) + struct.pack("<Q", off)
    pad = (32 - len(blob) % 32) % 32
    blob += b"\0" * pad
    with open(path, "wb") as f:
        f.write(blob + data)


def test_gguf_container_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    tensors = {
        "model.diffusion_model.x.weight": rng.standard_normal((3, 5)).astype(np.float32),
        "y": rng.standard_normal(7).astype(np.float32),
    }
    p = str(tmp_path / "t.gguf")
    _write_tiny_gguf(p, tensors)
    f = GGUFFile(p)
    assert f.version == 3
    assert set(f.names()) == set(tensors)
    for k, v in tensors.items():
        np.testing.assert_array_equal(f.tensor(k), v)
    assert f.tensor_type("y") == "f32"


@pytest.mark.parametrize(
    "gtype,d_offsets", [(GGML_Q4_0, [0]), (GGML_Q8_0, [0]), (GGML_Q4_K, [0, 2]), (GGML_Q6_K, [208])]
)
def test_quant_block_sizes(gtype, d_offsets):
    be, bb = BLOCK_INFO[gtype]
    rng = np.random.default_rng(2)
    raw = rng.integers(0, 255, size=(4, bb)).astype(np.uint8)
    # overwrite scale halves with a valid f16 so outputs are finite
    for off in d_offsets:
        raw[:, off : off + 2] = np.frombuffer(np.float16(0.25).tobytes(), dtype=np.uint8)
    out = dequantize(raw.reshape(-1), gtype, 4 * be)
    assert out.shape == (4 * be,)
    assert np.isfinite(out).all()


def test_native_dequant_matches_numpy():
    """The threaded C kernels (sdtpu/native/dequant.c) must agree with the
    numpy reference for every quant type, f16, and bf16."""
    import numpy as np

    import sdtpu.io.gguf as gg
    from sdtpu.native import get_native

    nat = get_native()
    if nat is None:
        pytest.skip("native extension unavailable (no compiler)")

    rng = np.random.default_rng(0)
    for t in (gg.GGML_Q4_0, gg.GGML_Q4_1, gg.GGML_Q5_0, gg.GGML_Q5_1,
              gg.GGML_Q8_0, gg.GGML_Q2_K, gg.GGML_Q3_K, gg.GGML_Q4_K,
              gg.GGML_Q5_K, gg.GGML_Q6_K):
        be, bb = gg.BLOCK_INFO[t]
        nblk = 32
        raw = rng.integers(0, 256, size=(nblk * bb,), dtype=np.uint8)
        n = nblk * be
        with np.errstate(invalid="ignore", over="ignore"):
            ref = gg.DEQUANT_FNS[t](raw[: nblk * bb], nblk)[:n]
        out = np.empty(n, dtype=np.float32)
        nat.dequant(int(t), np.ascontiguousarray(raw), out, int(n), 4)
        nan = np.isnan(ref) & np.isnan(out)
        np.testing.assert_allclose(
            np.where(nan, 0, ref), np.where(nan, 0, out), rtol=1e-5, atol=1e-5,
            err_msg=gg.TYPE_NAMES[t],
        )
    # f16 / bf16 conversion paths
    h = rng.integers(0, 0x7C00, size=1024, dtype=np.uint16)
    out = np.empty(1024, dtype=np.float32)
    nat.dequant(int(gg.GGML_F16), h.view(np.uint8).copy(), out, 1024, 2)
    np.testing.assert_allclose(out, h.view(np.float16).astype(np.float32))
    nat.dequant(int(gg.GGML_BF16), h.view(np.uint8).copy(), out, 1024, 2)
    np.testing.assert_allclose(
        out, (h.astype(np.uint32) << 16).view(np.float32)
    )


def test_native_dequant_bad_inputs():
    import numpy as np

    import sdtpu.io.gguf as gg
    from sdtpu.native import get_native

    nat = get_native()
    if nat is None:
        pytest.skip("native extension unavailable")
    out = np.empty(32, dtype=np.float32)
    with pytest.raises(ValueError):
        nat.dequant(99, b"\x00" * 64, out, 32, 2)  # unknown type
    with pytest.raises(ValueError):
        nat.dequant(int(gg.GGML_Q8_0), b"\x00" * 8, out, 32, 2)  # src too small


def test_gguf_writer_roundtrip(tmp_path):
    """save_gguf → load_gguf roundtrip at every output type (reference
    convert.cpp + gguf_io.cpp writer)."""
    import numpy as np

    from sdtpu.io.gguf import load_gguf, save_gguf

    rng = np.random.default_rng(0)
    tensors = {
        "w.weight": rng.standard_normal((64, 64)).astype(np.float32),
        "b.bias": rng.standard_normal((64,)).astype(np.float32),
        "small": rng.standard_normal((4, 4)).astype(np.float32),
    }
    for out_type, tol in [("f32", 0), ("f16", 1e-3), ("bf16", 1e-2),
                          ("q8_0", 2e-2), ("q4_0", 0.2), ("q4_1", 0.1)]:
        path = str(tmp_path / f"m_{out_type}.gguf")
        save_gguf(path, tensors, out_type=out_type, min_quant_size=256)
        back = load_gguf(path)
        assert set(back) == set(tensors)
        for k, v in tensors.items():
            ref = v
            scale = np.abs(ref).mean() + 1e-6
            err = np.abs(back[k] - ref).mean() / scale
            limit = tol if (k == "w.weight" or out_type in ("f32", "f16", "bf16")) else 1e-3
            assert err <= max(limit, 1e-6) or np.allclose(back[k], ref, atol=0.3), (
                out_type, k, err
            )
        assert back["w.weight"].shape == (64, 64)


def test_gguf_quantize_matches_dequant_identity():
    """quantize_q8_0 → dequant recovers values within q8 precision."""
    import numpy as np

    from sdtpu.io.gguf import GGML_Q8_0, dequantize, quantize_q8_0

    x = np.random.default_rng(1).standard_normal(1024).astype(np.float32)
    blob = quantize_q8_0(x)
    back = dequantize(np.frombuffer(blob.tobytes(), np.uint8), GGML_Q8_0, 1024)
    rel = np.abs(back - x).mean() / np.abs(x).mean()
    assert rel < 0.01, rel


def test_gguf_tensor_type_rules(tmp_path):
    """Per-tensor regex=type overrides (reference tensor_type_rules,
    model_loader.cpp:766-820): first matching pattern wins."""
    import numpy as np

    from sdtpu.io.gguf import GGUFFile, save_gguf

    rng = np.random.default_rng(1)
    tensors = {
        "attn.q.weight": rng.standard_normal((64, 64)).astype(np.float32),
        "mlp.fc1.weight": rng.standard_normal((64, 64)).astype(np.float32),
        "norm.weight": rng.standard_normal((64,)).astype(np.float32),
    }
    path = str(tmp_path / "rules.gguf")
    save_gguf(path, tensors, out_type="q8_0", min_quant_size=256,
              type_rules=[("attn", "f32"), ("^mlp", "q4_0")])
    f = GGUFFile(path)
    assert f.tensor_type("attn.q.weight") == "f32"
    assert f.tensor_type("mlp.fc1.weight") == "q4_0"
    assert f.tensor_type("norm.weight") == "f16"  # 1-D falls back from q8_0
    np.testing.assert_allclose(f.tensor("attn.q.weight"),
                               tensors["attn.q.weight"], atol=0)
    f.close()


def test_cli_convert_tensor_type_rules(tmp_path):
    """sdtpu.cli convert honors --tensor-type-rules for both gguf and
    safetensors outputs."""
    import numpy as np

    from sdtpu.cli import main as cli_main
    from sdtpu.io.gguf import GGUFFile
    from sdtpu.io.safetensors import load_safetensors, save_safetensors

    src = str(tmp_path / "in.safetensors")
    rng = np.random.default_rng(2)
    save_safetensors(src, {
        "attn.weight": rng.standard_normal((64, 64)).astype(np.float32),
        "other.weight": rng.standard_normal((64, 64)).astype(np.float32),
    })
    out = str(tmp_path / "out.gguf")
    rc = cli_main(["convert", "-m", src, "-o", out, "--output-type", "q8_0",
                   "--tensor-type-rules", "attn=f16"])
    assert rc == 0
    f = GGUFFile(out)
    assert f.tensor_type("attn.weight") == "f16"
    assert f.tensor_type("other.weight") == "q8_0"
    f.close()

    out2 = str(tmp_path / "out.safetensors")
    rc = cli_main(["convert", "-m", src, "-o", out2, "--output-type", "f16",
                   "--tensor-type-rules", "attn=f32"])
    assert rc == 0
    back = load_safetensors(out2, as_float32=False)
    assert back["attn.weight"].dtype == np.float32
    assert back["other.weight"].dtype == np.float16

"""safetensors read/write — pure python + numpy (reference:
src/model_io/safetensors_io.cpp; HF sharded index.json supported like
model_loader.h:46-47).

Format: u64-LE header length, JSON header {name: {dtype, shape, data_offsets}},
raw tensor bytes. Reading uses mmap so weights stage lazily.
"""
from __future__ import annotations

import json
import mmap
import os
from typing import Callable, Dict, Iterable, Optional, Tuple

import numpy as np

_DTYPES: Dict[str, np.dtype] = {
    "F64": np.dtype("<f8"),
    "F32": np.dtype("<f4"),
    "F16": np.dtype("<f2"),
    "BF16": np.dtype("<u2"),  # decoded below
    "I64": np.dtype("<i8"),
    "I32": np.dtype("<i4"),
    "I16": np.dtype("<i2"),
    "I8": np.dtype("i1"),
    "U8": np.dtype("u1"),
    "BOOL": np.dtype("?"),
    "F8_E4M3": np.dtype("u1"),
    "F8_E5M2": np.dtype("u1"),
}


def _bf16_to_f32(raw: np.ndarray) -> np.ndarray:
    return (raw.astype(np.uint32) << 16).view(np.float32)


def _f8_e4m3_to_f32(raw: np.ndarray) -> np.ndarray:
    """OCP FP8 E4M3 (no inf, 448 max) → f32."""
    r = raw.astype(np.uint32)
    sign = (r >> 7) & 1
    exp = (r >> 3) & 0xF
    mant = r & 0x7
    out = np.empty(raw.shape, dtype=np.float32)
    # normal: exp>0 → value = 2^(exp-7) * (1 + mant/8)
    normal = (2.0 ** (exp.astype(np.float32) - 7)) * (1 + mant.astype(np.float32) / 8)
    subnormal = (2.0**-6) * (mant.astype(np.float32) / 8)
    out = np.where(exp > 0, normal, subnormal)
    # E4M3FN: exp=15,mant=7 is NaN
    out = np.where((exp == 15) & (mant == 7), np.float32(np.nan), out)
    return np.where(sign == 1, -out, out).astype(np.float32)


def _f8_e5m2_to_f32(raw: np.ndarray) -> np.ndarray:
    # E5M2 is a truncated f16: widen to 16 bits
    return (raw.astype(np.uint16) << 8).view(np.float16).astype(np.float32)


class SafetensorsFile:
    """Lazily-readable safetensors file (mmap-backed)."""

    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "rb")
        self._mm = mmap.mmap(self._f.fileno(), 0, access=mmap.ACCESS_READ)
        header_len = int.from_bytes(self._mm[:8], "little")
        header = json.loads(self._mm[8 : 8 + header_len].decode("utf-8"))
        self.metadata = header.pop("__metadata__", {})
        self.entries = header
        self._data_start = 8 + header_len

    def names(self):
        return list(self.entries.keys())

    def info(self, name: str) -> Tuple[str, Tuple[int, ...]]:
        e = self.entries[name]
        return e["dtype"], tuple(e["shape"])

    def tensor(self, name: str, as_float32: bool = True) -> np.ndarray:
        e = self.entries[name]
        dtype, shape = e["dtype"], tuple(e["shape"])
        begin, end = e["data_offsets"]
        raw = np.frombuffer(
            self._mm, dtype=_DTYPES[dtype], count=max(1, int(np.prod(shape))) if shape else 1,
            offset=self._data_start + begin,
        )
        if dtype == "BF16":
            arr = _bf16_to_f32(raw) if as_float32 else raw.view(np.uint16)
        elif dtype == "F8_E4M3":
            arr = _f8_e4m3_to_f32(raw)
        elif dtype == "F8_E5M2":
            arr = _f8_e5m2_to_f32(raw)
        elif as_float32 and dtype in ("F64", "F16"):
            arr = raw.astype(np.float32)
        elif dtype == "I64" and as_float32 is False:
            arr = raw
        else:
            arr = raw
        return arr.reshape(shape)

    def close(self):
        self._mm.close()
        self._f.close()


def load_safetensors(
    path: str,
    filter_fn: Optional[Callable[[str], bool]] = None,
    as_float32: bool = True,
) -> Dict[str, np.ndarray]:
    """Load one .safetensors file, or an HF index.json shard set."""
    if path.endswith(".index.json") or path.endswith("index.json"):
        with open(path) as f:
            index = json.load(f)
        base = os.path.dirname(path)
        out: Dict[str, np.ndarray] = {}
        shards = sorted(set(index["weight_map"].values()))
        for shard in shards:
            sub = load_safetensors(os.path.join(base, shard), filter_fn, as_float32)
            out.update(sub)
        return out
    f = SafetensorsFile(path)
    names = [n for n in f.names() if filter_fn is None or filter_fn(n)]
    # multi-threaded tensor reading (reference model_loader.cpp:1440-1537
    # reads with a thread pool): page-in + dtype widening release the GIL
    from sdtpu.io.gguf import _parallel_map

    return dict(_parallel_map(
        lambda n: (n, f.tensor(n, as_float32=as_float32)), names))


def save_safetensors(path: str, tensors: Dict[str, np.ndarray], metadata: Optional[dict] = None):
    """Streaming-style writer (reference: src/model_io/streaming_writer.h)."""
    header: Dict[str, dict] = {}
    if metadata:
        header["__metadata__"] = {k: str(v) for k, v in metadata.items()}
    offset = 0
    blobs = []
    inv_dtypes = {
        np.dtype("float32"): "F32",
        np.dtype("float16"): "F16",
        np.dtype("float64"): "F64",
        np.dtype("int64"): "I64",
        np.dtype("int32"): "I32",
        np.dtype("int8"): "I8",
        np.dtype("uint8"): "U8",
        np.dtype("bool"): "BOOL",
    }
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr)
        if arr.dtype == np.dtype("V2"):  # ml_dtypes bfloat16 comes through as void
            dt = "BF16"
            raw = arr.tobytes()
        elif str(arr.dtype) == "bfloat16":
            dt = "BF16"
            raw = arr.tobytes()
        else:
            dt = inv_dtypes[arr.dtype]
            raw = arr.tobytes()
        header[name] = {
            "dtype": dt,
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + len(raw)],
        }
        offset += len(raw)
        blobs.append(raw)
    hjson = json.dumps(header, separators=(",", ":")).encode("utf-8")
    # pad header to 8-byte alignment (spec recommendation)
    pad = (8 - (len(hjson) % 8)) % 8
    hjson += b" " * pad
    with open(path, "wb") as f:
        f.write(len(hjson).to_bytes(8, "little"))
        f.write(hjson)
        for b in blobs:
            f.write(b)

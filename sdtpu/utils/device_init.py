"""On-device synthesis of full-scale random parameter trees.

Benchmarking at the reference's headline scale (FLUX.1-dev q8_0 = 12 GB of
weights, docs/flux.md:36-38) needs every weight to be a *distinct* HBM buffer
— shared per-shape buffers understate memory pressure and let XLA keep the
whole model in a few hundred MB.  But materializing 12 GB on the host and
`device_put`-ing it is not viable on every stack (under the axon TPU tunnel
host→device copies run at single-digit MB/s, i.e. ~45 min for 12 GB).

This module instead derives the parameter tree's *shapes* on the host (cheap:
a zero-filled dry run of the model's ``init_*_params``) and then synthesizes
all buffers directly in device memory with a handful of jitted programs —
nothing but PRNG keys crosses the host↔device link.

Quantized layouts mirror ``sdtpu.ops.quant``: large 2-D weights become int8
``QuantTensor`` (q8_0 memory class) or packed 4-bit ``Q4Tensor`` (q4_0 memory
class), with constant scales sized so dequantized weights have the same
~N(0, 0.02) statistics as the dense random init (keeps activations finite
through deep stacks — values are irrelevant for throughput, finiteness is
not).
"""
import contextlib
from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sdtpu.ops.quant import GroupQuantTensor, Q4Tensor, QuantTensor

WEIGHT_STD = 0.02
# rms of uniform int8 in [-127,127] is ~73.3; of centered nibbles ~4.6
_Q8_SCALE = WEIGHT_STD / 73.3
_Q4_SCALE = WEIGHT_STD / 4.6

# name fragments that must stay dense (gathered, not matmul'd)
EMBEDDING_HINTS = (
    "shared.weight", "embed", "wte", "token_embedding", "pos_emb", "position",
)


class _FakeArray:
    """Shape/dtype-only array stand-in: survives the scale-and-cast arithmetic
    init functions apply to fresh draws without materializing anything."""

    __slots__ = ("shape", "dtype")

    def __init__(self, shape, dtype):
        self.shape = (shape,) if isinstance(shape, int) else tuple(shape or ())
        self.dtype = np.dtype(dtype)

    def _same(self, *_a, **_k):
        return self

    __mul__ = __rmul__ = __add__ = __radd__ = _same
    __sub__ = __rsub__ = __truediv__ = __rtruediv__ = __neg__ = _same

    def astype(self, dtype):
        return _FakeArray(self.shape, dtype)

    def reshape(self, *shape):
        if len(shape) == 1 and not isinstance(shape[0], int):
            shape = tuple(shape[0])
        n = int(np.prod(self.shape, dtype=np.int64))
        if -1 in shape:
            rest = int(np.prod([s for s in shape if s != -1], dtype=np.int64))
            shape = tuple(n // rest if s == -1 else s for s in shape)
        return _FakeArray(shape, self.dtype)

    def transpose(self, *axes):
        if not axes:
            axes = tuple(range(len(self.shape))[::-1])
        elif len(axes) == 1 and not isinstance(axes[0], int):
            axes = tuple(axes[0])
        return _FakeArray(tuple(self.shape[a] for a in axes), self.dtype)

    @property
    def T(self):
        return self.transpose()


class _ZeroRng:
    """numpy Generator stand-in whose draws are shape-only stand-ins (or, in
    ``materialize`` mode, real zeros) — lets ``init_*_params`` run at full
    model scale in milliseconds so only the *shapes* are paid for."""

    materialize = False

    def __init__(self, seed=None):
        pass

    def _make(self, size, dtype):
        shape = () if size is None else size
        if self.materialize:
            return np.zeros(shape, dtype=dtype)
        return _FakeArray(shape, dtype)

    def standard_normal(self, size=None, dtype=np.float64):
        return self._make(size, dtype)

    def normal(self, loc=0.0, scale=1.0, size=None):
        return self._make(size, np.float64)

    def uniform(self, low=0.0, high=1.0, size=None):
        return self._make(size, np.float64)

    def random(self, size=None, dtype=np.float64):
        return self._make(size, dtype)

    def integers(self, low, high=None, size=None, dtype=np.int64, **kw):
        return self._make(size, dtype)


class _ZeroRngMaterial(_ZeroRng):
    materialize = True


@contextlib.contextmanager
def _zero_rng(materialize: bool = False):
    orig = np.random.default_rng
    np.random.default_rng = _ZeroRngMaterial if materialize else _ZeroRng
    try:
        yield
    finally:
        np.random.default_rng = orig


def _spec_of(x, dtype=None):
    a = x if hasattr(x, "shape") else np.asarray(x)
    return jax.ShapeDtypeStruct(tuple(a.shape), np.dtype(dtype) if dtype else a.dtype)


@contextlib.contextmanager
def _abstract_jnp():
    """Patch the handful of array constructors that ``init_*_params``
    functions funnel through so they return ShapeDtypeStructs instead of
    materializing data — full-scale shape derivation costs milliseconds, not
    a 10 GB host copy + bf16 cast."""
    patches = {
        "asarray": lambda x, dtype=None, **kw: _spec_of(x, dtype),
        "array": lambda x, dtype=None, **kw: _spec_of(x, dtype),
        "zeros": lambda shape, dtype=np.float32: jax.ShapeDtypeStruct(
            (shape,) if isinstance(shape, int) else tuple(shape), np.dtype(dtype)),
        "ones": lambda shape, dtype=np.float32: jax.ShapeDtypeStruct(
            (shape,) if isinstance(shape, int) else tuple(shape), np.dtype(dtype)),
        "full": lambda shape, v, dtype=None: jax.ShapeDtypeStruct(
            (shape,) if isinstance(shape, int) else tuple(shape),
            np.dtype(dtype) if dtype else np.asarray(v).dtype),
    }
    orig = {k: getattr(jnp, k) for k in patches}
    for k, v in patches.items():
        setattr(jnp, k, v)
    try:
        yield
    finally:
        for k, v in orig.items():
            setattr(jnp, k, v)


def param_specs(init_fn: Callable, *args, **kwargs) -> Dict[str, object]:
    """Run a host ``init_*_params`` function with zero-cost RNG and abstract
    array constructors, returning its tree with every array replaced by a
    ``jax.ShapeDtypeStruct`` (quant wrappers keep their structure).

    Falls back to a zero-filled CPU-backend dry run for init functions that
    compute on the constructed arrays (rare)."""
    try:
        with _zero_rng(), _abstract_jnp():
            tree = init_fn(*args, **kwargs)
    except Exception:
        cpu = jax.devices("cpu")[0]
        with _zero_rng(materialize=True), jax.default_device(cpu):
            tree = init_fn(*args, **kwargs)
    return jax.tree.map(lambda a: jax.ShapeDtypeStruct(tuple(a.shape), a.dtype),
                        tree)


def _is_spec_wrapper(v) -> bool:
    return isinstance(v, (QuantTensor, Q4Tensor, GroupQuantTensor))


def quantize_specs(
    specs: Dict[str, object],
    mode: str = "q8_0",
    min_elems: int = 1 << 16,
    exclude: Sequence[str] = EMBEDDING_HINTS,
    block_k: int = 512,
    group: int = 64,
) -> Dict[str, object]:
    """Rewrite large rank-2 float specs into the requested quantized memory
    class (q8_0 → per-row ``QuantTensor``, q4_0 → packed ``Q4Tensor``,
    q8_0_gguf → ``GroupQuantTensor`` with the GGUF keep-quant loader's
    group-32 transposed layout), leaving embeddings and small tensors dense —
    the same policy as the GGUF keep-quant loader."""
    if mode not in ("q8_0", "q4_0", "q8_0_gguf"):
        raise ValueError(f"unsupported synthesis quant mode {mode!r}")
    out = {}
    for name, s in specs.items():
        eligible = (
            not _is_spec_wrapper(s)
            and len(s.shape) == 2
            and jnp.issubdtype(s.dtype, jnp.floating)
            and s.shape[0] * s.shape[1] >= min_elems
            and not any(h in name for h in exclude)
        )
        if not eligible:
            out[name] = s
            continue
        n, k = s.shape
        if mode == "q8_0":
            out[name] = QuantTensor(
                q=jax.ShapeDtypeStruct((n, k), jnp.int8),
                scale=jax.ShapeDtypeStruct((n,), jnp.float32),
            )
        elif mode == "q8_0_gguf":
            grp = 32  # ggml q8_0 block size (io/gguf.py keep-quant layout)
            kp = (k + grp - 1) // grp * grp
            out[name] = GroupQuantTensor(
                q=jax.ShapeDtypeStruct((kp, n), jnp.int8),
                scale=jax.ShapeDtypeStruct((kp // grp, n), jnp.float32),
                zero=None, k=k, group=grp,
            )
        else:
            kp = max(k, block_k)
            kp = (kp + block_k - 1) // block_k * block_k
            out[name] = Q4Tensor(
                packed=jax.ShapeDtypeStruct((kp // 2, n), jnp.uint8),
                scale=jax.ShapeDtypeStruct((kp // group, n), jnp.float32),
                k=k, block_k=block_k, group=group,
            )
    return out


def _leaf_descs(name: str, spec) -> list:
    """Flatten one tree entry into (kind, shape, dtype, const) draw recipes."""
    if isinstance(spec, QuantTensor):
        return [
            ("int8", spec.q.shape, jnp.int8, None),
            ("full", spec.scale.shape, jnp.float32, _Q8_SCALE),
        ]
    if isinstance(spec, Q4Tensor):
        return [
            ("bits8", spec.packed.shape, jnp.uint8, None),
            ("full", spec.scale.shape, jnp.float32, _Q4_SCALE),
        ]
    if isinstance(spec, GroupQuantTensor):
        descs = [
            ("int8", spec.q.shape, jnp.int8, None),
            ("full", spec.scale.shape, jnp.float32, _Q8_SCALE),
        ]
        if spec.zero is not None:
            descs.append(("full", spec.zero.shape, spec.zero.dtype, 0.0))
        return descs
    if jnp.issubdtype(spec.dtype, jnp.floating):
        if len(spec.shape) >= 2:
            return [("normal", spec.shape, spec.dtype, None)]
        # rank-0/1 float: norm scales and biases — ones keep norms identity-ish
        return [("full", spec.shape, spec.dtype, 1.0)]
    if spec.dtype == jnp.int8:
        return [("int8", spec.shape, jnp.int8, None)]
    return [("full", spec.shape, spec.dtype, 0)]


def _rebuild(spec, leaves_iter):
    if isinstance(spec, QuantTensor):
        return QuantTensor(q=next(leaves_iter), scale=next(leaves_iter))
    if isinstance(spec, Q4Tensor):
        return Q4Tensor(packed=next(leaves_iter), scale=next(leaves_iter),
                        k=spec.k, block_k=spec.block_k, group=spec.group)
    if isinstance(spec, GroupQuantTensor):
        q, scale = next(leaves_iter), next(leaves_iter)
        zero = next(leaves_iter) if spec.zero is not None else None
        return GroupQuantTensor(q, scale, zero, k=spec.k, group=spec.group)
    return next(leaves_iter)


def _draw(kind, shape, dtype, const, key):
    if kind == "normal":
        return jax.random.normal(key, shape, dtype) * jnp.asarray(
            WEIGHT_STD, dtype)
    if kind == "int8":
        return jax.random.randint(key, shape, -127, 127, jnp.int8)
    if kind == "bits8":
        return jax.random.bits(key, shape, jnp.uint8)
    return jnp.full(shape, const, dtype)


def synthesize_on_device(
    specs: Dict[str, object],
    seed: int = 0,
    chunk_bytes: int = 1 << 31,
    device=None,
) -> Dict[str, object]:
    """Materialize a spec tree as distinct random device buffers.

    Leaves are generated in byte-bounded chunks, one jitted program per chunk
    (bounds XLA program size and peak temporary memory); every leaf draws from
    ``fold_in(seed, global_leaf_index)`` so buffers are distinct and the
    result is chunking-invariant."""
    names = list(specs.keys())
    descs = []  # (global_leaf_idx, kind, shape, dtype, const)
    per_name = []  # leaf count per name, for rebuild
    for name in names:
        ds = _leaf_descs(name, specs[name])
        per_name.append(len(ds))
        descs.extend(ds)

    def nbytes(d):
        return int(np.prod(d[1], dtype=np.int64)) * jnp.dtype(d[2]).itemsize

    chunks = []
    cur, cur_b = [], 0
    for i, d in enumerate(descs):
        cur.append((i,) + d)
        cur_b += nbytes(d)
        if cur_b >= chunk_bytes:
            chunks.append(cur)
            cur, cur_b = [], 0
    if cur:
        chunks.append(cur)

    def make_fn(chunk):
        def fn(key):
            outs = []
            for gi, kind, shape, dtype, const in chunk:
                outs.append(_draw(kind, shape, dtype, const,
                                  jax.random.fold_in(key, gi)))
            return tuple(outs)
        return fn

    root = jax.random.key(seed)
    leaves = []
    ctx = jax.default_device(device) if device is not None else contextlib.nullcontext()
    with ctx:
        for chunk in chunks:
            out = jax.jit(make_fn(chunk))(root)
            leaves.extend(out)
    it = iter(leaves)
    return {name: _rebuild(specs[name], it) for name in names}


def synthesize_params(
    init_fn: Callable,
    *args,
    quant: Optional[str] = None,
    seed: int = 0,
    device=None,
    chunk_bytes: int = 1 << 31,
    **kwargs,
) -> Dict[str, object]:
    """``param_specs`` → optional ``quantize_specs`` → ``synthesize_on_device``
    in one call: a full-scale random parameter tree that never touches host
    memory."""
    specs = param_specs(init_fn, *args, **kwargs)
    if quant:
        specs = quantize_specs(specs, mode=quant)
    return synthesize_on_device(specs, seed=seed, device=device,
                                chunk_bytes=chunk_bytes)


def write_synthetic_gguf(path: str, specs: Dict[str, object],
                         big_type: str = "q8_0",
                         min_quant_size: int = 1 << 16, seed: int = 0) -> int:
    """Stream a FULL-SIZE synthetic GGUF checkpoint to disk: large 2-D
    ``.weight`` tensors get fabricated q8_0/q4_0 block payloads directly (no
    f32 round trip — writing FLUX-dev q8_0 is ~13 GB of mostly-memcpy), the
    rest f32.  Loader benchmarking only: parse → block extraction →
    QuantTensor staging → HBM upload wall-clock on checkpoint-real bytes
    (VERDICT r4 next #2; reference loads multi-threaded,
    src/model_loader.cpp:1440-1537).  → bytes written."""
    import struct

    from sdtpu.io.gguf import (
        GGML_F32,
        GGML_Q4_0,
        GGML_Q8_0,
        GGUF_MAGIC,
    )

    tmap = {"q8_0": (GGML_Q8_0, 32, 34), "q4_0": (GGML_Q4_0, 32, 18)}
    big_t, group, block_bytes = tmap[big_type]
    align = 32

    def is_big(name, shape):
        n = int(np.prod(shape)) if shape else 1
        return (len(shape) == 2 and n >= min_quant_size
                and name.endswith(".weight") and shape[1] % group == 0)

    entries = []  # (name, type, shape, payload_nbytes)
    for name, spec in specs.items():
        shape = tuple(spec.shape)
        n = int(np.prod(shape)) if shape else 1
        if is_big(name, shape):
            entries.append((name, big_t, shape, n // group * block_bytes))
        else:
            entries.append((name, GGML_F32, shape, n * 4))

    buf = bytearray()
    buf += GGUF_MAGIC
    kv = [("general.architecture", "sdtpu"), ("general.name", "synthetic")]
    buf += struct.pack("<IQQ", 3, len(entries), len(kv))

    def w_str(s):
        b = s.encode("utf-8")
        buf.extend(struct.pack("<Q", len(b)))
        buf.extend(b)

    for k, v in kv:
        w_str(k)
        buf.extend(struct.pack("<I", 8))
        w_str(v)

    offset = 0
    for name, t, shape, nbytes in entries:
        w_str(name)
        dims = list(reversed(shape))
        buf.extend(struct.pack("<I", len(dims)))
        for d in dims:
            buf.extend(struct.pack("<Q", d))
        buf.extend(struct.pack("<I", t))
        buf.extend(struct.pack("<Q", offset))
        offset += (nbytes + align - 1) // align * align
    buf.extend(b"\x00" * ((align - (len(buf) % align)) % align))

    # payload templates: one random megablock tiled per tensor (contents are
    # irrelevant to load timing; d scales constant small f16)
    rng = np.random.default_rng(seed)
    q_core = rng.integers(-127, 128, size=1 << 22, dtype=np.int8)
    d16 = np.float16(0.02 / 127.0).tobytes()

    def q8_payload(nblocks):
        arr = np.empty((nblocks, 34), dtype=np.uint8)
        arr[:, :2] = np.frombuffer(d16, dtype=np.uint8)
        need = nblocks * 32
        reps = -(-need // q_core.size)
        arr[:, 2:] = np.tile(q_core, reps)[:need].view(np.uint8).reshape(
            nblocks, 32)
        return arr.tobytes()

    def q4_payload(nblocks):
        arr = np.empty((nblocks, 18), dtype=np.uint8)
        arr[:, :2] = np.frombuffer(d16, dtype=np.uint8)
        need = nblocks * 16
        reps = -(-need // q_core.size)
        arr[:, 2:] = np.tile(q_core, reps)[:need].view(np.uint8).reshape(
            nblocks, 16)
        return arr.tobytes()

    with open(path, "wb") as f:
        f.write(bytes(buf))
        total = len(buf)
        for name, t, shape, nbytes in entries:
            n = int(np.prod(shape)) if shape else 1
            if t == GGML_Q8_0:
                payload = q8_payload(n // group)
            elif t == GGML_Q4_0:
                payload = q4_payload(n // group)
            else:
                fill = 0.0 if name.endswith(".bias") else 1.0
                payload = np.full(n, fill, dtype=np.float32).tobytes()
            f.write(payload)
            pad = (align - (len(payload) % align)) % align
            f.write(b"\x00" * pad)
            total += len(payload) + pad
    return total

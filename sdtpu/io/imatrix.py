"""Importance-matrix (imatrix) collection, llama.cpp-compatible .dat IO, and
importance-weighted quantization.

Reference analog: src/runtime/imatrix.{h,cpp} (adapted there from llama.cpp):
per-matmul mean-squared input activations guide quantization.  In the
reference, collection hooks the backend's eval callback on MUL_MAT nodes; in
this functional stack the collector intercepts `sdtpu.ops.basic.linear`
during an EAGER (un-jitted) forward — activations are concrete arrays there,
which is exactly the one-time calibration use case.
"""
from __future__ import annotations

import contextlib
import struct
from typing import Dict, Optional

import numpy as np


class IMatrixCollector:
    def __init__(self):
        # values accumulates the PER-CALL channel mean of x² (so an entry is
        # mean·ncall — the exact unit the llama.cpp .dat stores), counts ==
        # ncall == number of calls.  Keeping collection and load() in the
        # same unit makes continued collection (--imat-in + fresh taps) a
        # correctly ncall-weighted merge instead of mixing rows with calls.
        self.values: Dict[str, np.ndarray] = {}  # name → Σ_call mean(x²)
        self.counts: Dict[str, int] = {}  # name → calls (== ncall)
        self.ncall: Dict[str, int] = {}
        self.last_call = 0

    # ------------------------------------------------------------ collection

    @contextlib.contextmanager
    def capture(self, params: Dict[str, object]):
        """Intercept linear() calls whose weight belongs to `params`; run the
        model EAGERLY inside this context (jit would trace, not execute)."""
        import sdtpu.ops.basic as basic
        from sdtpu.utils.debug import patch_linear, resolve_name, _name_map

        id_to_name = _name_map(params)
        orig = basic.linear
        collector = self

        def hooked(x, weight, bias=None):
            name = resolve_name(weight, id_to_name)
            if name is not None:
                collector._accumulate(name, np.asarray(x, dtype=np.float32))
            return orig(x, weight, bias)

        with patch_linear(hooked):
            yield self

    @contextlib.contextmanager
    def capture_jit(self, params: Optional[Dict[str, object]] = None):
        """Collect from inside COMPILED forwards: io_callback taps baked at
        trace time stream each matmul's input to the host accumulator (the
        in-jit analog of the reference's MUL_MAT eval-callback hook — works
        under the fused sampler scan).  Trace the program inside this
        context; names resolve from `params` when closed over, or from the
        ``trace_names`` per-trace map when params are traced jit arguments."""
        import functools

        from jax.experimental import io_callback

        import sdtpu.ops.basic as basic
        from sdtpu.utils.debug import patch_linear, resolve_name, _name_map

        id_to_name = _name_map(params) if params else {}
        orig = basic.linear
        collector = self

        def _acc(name, x):
            collector._accumulate(name, np.asarray(x, dtype=np.float32))

        def hooked(x, weight, bias=None):
            name = resolve_name(weight, id_to_name)
            if name is not None:
                io_callback(functools.partial(_acc, name), None, x,
                            ordered=False)
            return orig(x, weight, bias)

        with patch_linear(hooked):
            yield self

    @contextlib.contextmanager
    def capture_pipeline(self, pipe):
        """Accumulate across a Pipeline's COMPILED generation — every matmul
        of every denoise step feeds the importance sums, like the reference's
        backend eval callback firing on each MUL_MAT across the whole run
        (src/runtime/imatrix.cpp).  Re-traces the sampling programs with taps
        and restores the pipeline on exit; call ``jax.effects_barrier()``
        before saving if the run just finished."""
        from sdtpu.utils.debug import wrap_forward_with_names

        orig_fn = pipe.diffusion_fn
        pipe.diffusion_fn = wrap_forward_with_names(orig_fn)
        pipe._program_cache.clear()
        pipe._stepwise_step_cache.clear()
        try:
            with self.capture_jit():
                yield self
        finally:
            pipe.diffusion_fn = orig_fn
            pipe._program_cache.clear()
            pipe._stepwise_step_cache.clear()

    def _accumulate(self, name: str, x: np.ndarray):
        x2 = (x.reshape(-1, x.shape[-1]) ** 2).mean(axis=0)
        if name in self.values:
            self.values[name] += x2
            self.counts[name] += 1
            self.ncall[name] += 1
        else:
            self.values[name] = x2
            self.counts[name] = 1
            self.ncall[name] = 1
        self.last_call += 1

    def get(self, name: str) -> Optional[np.ndarray]:
        """Mean squared activation per input channel (mean of per-call
        channel means — calls weight equally, like llama.cpp's merge)."""
        if name not in self.values:
            return None
        return self.values[name] / max(self.counts[name], 1)

    # ------------------------------------------------------------------- IO

    def save(self, path: str):
        """llama.cpp/.dat layout (reference imatrix.cpp:187): n_entries, then
        per entry {len, name, ncall, nval, f32 values·ncall/count}, then
        last_call."""
        names = [n for n in self.values if self.counts[n] > 0]
        with open(path, "wb") as f:
            f.write(struct.pack("<i", len(names)))
            for name in names:
                nb = name.encode("utf-8")
                f.write(struct.pack("<i", len(nb)))
                f.write(nb)
                f.write(struct.pack("<i", self.ncall[name]))
                vals = (
                    self.values[name] / float(self.counts[name]) * float(self.ncall[name])
                ).astype(np.float32)
                f.write(struct.pack("<i", vals.size))
                f.write(vals.tobytes())
            f.write(struct.pack("<i", self.last_call))

    def load(self, path: str):
        with open(path, "rb") as f:
            (n_entries,) = struct.unpack("<i", f.read(4))
            for _ in range(n_entries):
                (ln,) = struct.unpack("<i", f.read(4))
                name = f.read(ln).decode("utf-8")
                (ncall,) = struct.unpack("<i", f.read(4))
                (nval,) = struct.unpack("<i", f.read(4))
                vals = np.frombuffer(f.read(4 * nval), dtype=np.float32).copy()
                # stored as mean·ncall — the same unit values uses
                # internally, so loading merges additively with both prior
                # files and fresh collection (reference --imat-in merge,
                # src/runtime/imatrix.cpp)
                if name in self.values:
                    self.values[name] += vals
                    self.ncall[name] += ncall
                else:
                    self.values[name] = vals
                    self.ncall[name] = ncall
                self.counts[name] = self.ncall[name]
            tail = f.read(4)
            if len(tail) == 4:
                self.last_call = struct.unpack("<i", tail)[0]
        return self


def quantize_q4_0_weighted(w: np.ndarray, importance: np.ndarray) -> np.ndarray:
    """Importance-weighted q4_0: per 32-block scale chosen by weighted
    least-squares search over candidate scales (ggml make_qx_quants
    semantics, simplified)."""
    flat = np.ascontiguousarray(w, dtype=np.float32).reshape(-1, 32)
    imp = np.broadcast_to(
        np.asarray(importance, dtype=np.float32).reshape(1, -1), w.shape
    ).reshape(-1, 32)
    imp = imp + 1e-8
    n = flat.shape[0]
    idx = np.abs(flat).argmax(axis=1)
    maxv = flat[np.arange(n), idx]
    out = np.empty((n, 18), dtype=np.uint8)
    best_d = np.zeros(n, dtype=np.float32)
    best_err = np.full(n, np.inf, dtype=np.float32)
    best_q = np.zeros((n, 32), dtype=np.int32)
    # candidate scales around the amax heuristic (ggml searches -9..9 steps)
    for step in range(-4, 5):
        d = maxv / (-8.0 + 0.25 * step)
        d = np.where(d == 0, 1e-12, d)
        q = np.clip(np.round(flat / d[:, None]), -8, 7)
        err = (imp * (flat - q * d[:, None]) ** 2).sum(axis=1)
        better = err < best_err
        best_err = np.where(better, err, best_err)
        best_d = np.where(better, d, best_d)
        best_q = np.where(better[:, None], q.astype(np.int32), best_q)
    qu = (best_q + 8).astype(np.uint8)
    out[:, :2] = best_d.astype(np.float16).view(np.uint8).reshape(-1, 2)
    out[:, 2:] = qu[:, :16] | (qu[:, 16:] << 4)
    return out.reshape(-1)

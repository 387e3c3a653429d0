"""Tracing / profiling utilities (SURVEY.md §5 aux subsystems).

The reference logs wall-clock phase timings (ggml_time_ms around
sample/encode/decode), reports per-module parameter memory
(stable-diffusion.cpp:~1660), and exposes a per-node graph-eval callback.
TPU-native equivalents:

- PhaseTimer: the same phase wall-clock log lines.
- trace(): XLA profiler capture → TensorBoard/Perfetto trace (a strict
  upgrade over the reference's per-node host callback, which cannot exist
  under XLA fusion — the compiler trace shows the fused kernels that
  actually ran).
- module_memory_report(): params MB + dtype census per module (the
  reference's wtype stats, stable-diffusion.cpp:902-924).
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import numpy as np

from sdtpu.utils import log_info


class PhaseTimer:
    """Wall-clock phase timings (reference ggml_time_ms phase logs)."""

    def __init__(self):
        self.phases: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            dt = time.time() - t0
            self.phases[name] = self.phases.get(name, 0.0) + dt
            log_info(f"{name} completed in {dt:.2f}s")

    def summary(self) -> str:
        total = sum(self.phases.values())
        lines = [f"  {k}: {v:.2f}s" for k, v in self.phases.items()]
        return "\n".join(lines + [f"  total: {total:.2f}s"])


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/sdtpu_trace"):
    """Capture an XLA profiler trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        log_info(f"profiler trace written to {log_dir}")


def _tensor_bytes(v) -> int:
    if hasattr(v, "nbytes"):
        return int(v.nbytes)
    # QuantTensor / Q4Tensor: sum the leaves
    total = 0
    for leaf in getattr(v, "tree_flatten", lambda: ((), None))()[0]:
        total += int(getattr(leaf, "nbytes", 0))
    if total == 0 and hasattr(v, "q"):
        total = int(v.q.nbytes) + int(v.scale.nbytes)
    return total


def module_memory_report(modules: Dict[str, Optional[dict]]) -> str:
    """Per-module parameter memory + dtype census (reference weight-type
    stats at load, stable-diffusion.cpp:902-924).

    modules: {"diffusion": params_dict, "vae": ..., ...}; None entries are
    skipped.  Returns the formatted report (also logged)."""
    lines = []
    total = 0
    for name, params in modules.items():
        if not params:
            continue
        size = 0
        dtypes: Dict[str, int] = {}
        for v in params.values():
            b = _tensor_bytes(v)
            size += b
            dt = str(getattr(v, "dtype", type(v).__name__))
            dtypes[dt] = dtypes.get(dt, 0) + 1
        total += size
        census = ", ".join(f"{k}×{n}" for k, n in sorted(dtypes.items()))
        lines.append(f"  {name}: {size / 1e6:.1f} MB ({census})")
    lines.append(f"  total: {total / 1e6:.1f} MB")
    report = "\n".join(lines)
    log_info("module memory:\n" + report)
    return report

"""Debug tensor capture — inspect intermediate activations by layer name.

Reference analogs: GGMLRunnerContext::capture_tensor (ggml_extend.hpp:1700,
blocks snapshot intermediates into the graph for post-compute printing) and
the per-node backend eval callback (sd_set_backend_eval_callback).  Under
XLA those hooks cannot exist inside a compiled program (nodes are fused
away); the TPU-native equivalent runs the forward EAGERLY inside a capture
context that intercepts `ops.linear` calls and records the activations
feeding each named weight — the same mechanism the imatrix collector uses
(io/imatrix.py).
"""
from __future__ import annotations

import contextlib
import fnmatch
from typing import Dict, List, Optional

import numpy as np


class TensorCapture:
    """Record inputs/outputs of named linear layers during an eager forward.

    >>> cap = TensorCapture(patterns=["double_blocks.0.*"])
    >>> with cap.capture(params):
    ...     flux_forward(params, ...)   # eager (no jit)
    >>> cap.activations["double_blocks.0.img_attn.qkv.weight"].shape
    """

    def __init__(self, patterns: Optional[List[str]] = None,
                 capture_outputs: bool = False):
        self.patterns = patterns
        self.capture_outputs = capture_outputs
        self.activations: Dict[str, np.ndarray] = {}
        self.outputs: Dict[str, np.ndarray] = {}

    def _want(self, name: str) -> bool:
        if self.patterns is None:
            return True
        return any(fnmatch.fnmatch(name, p) for p in self.patterns)

    @contextlib.contextmanager
    def capture(self, params: Dict[str, object]):
        import sys

        import sdtpu.ops.basic as basic

        id_to_name = {}
        for name, w in params.items():
            q = getattr(w, "q", None) or getattr(w, "packed", None)
            id_to_name[id(q if q is not None else w)] = name

        orig = basic.linear
        cap = self

        def hooked(x, weight, bias=None):
            q = getattr(weight, "q", None) or getattr(weight, "packed", None)
            name = id_to_name.get(id(q if q is not None else weight))
            y = orig(x, weight, bias)
            if name is not None and cap._want(name):
                cap.activations[name] = np.asarray(x, dtype=np.float32)
                if cap.capture_outputs:
                    cap.outputs[name] = np.asarray(y, dtype=np.float32)
            return y

        basic.linear = hooked
        patched = []
        for mod in list(sys.modules.values()):
            if mod is None or not getattr(mod, "__name__", "").startswith("sdtpu"):
                continue
            if getattr(mod, "linear", None) is orig:
                mod.linear = hooked
                patched.append(mod)
        try:
            yield self
        finally:
            basic.linear = orig
            for mod in patched:
                mod.linear = orig

    def summary(self) -> str:
        lines = [
            f"  {k}: {tuple(v.shape)} |x|max={np.abs(v).max():.4g}"
            for k, v in self.activations.items()
        ]
        return "\n".join(lines)

"""Debug tensor capture — inspect intermediate activations by layer name.

Reference analogs: GGMLRunnerContext::capture_tensor (ggml_extend.hpp:1700,
blocks snapshot intermediates into the graph for post-compute printing) and
the per-node backend eval callback (sd_set_backend_eval_callback,
include/stable-diffusion.h:429).  Two modes:

- ``capture(params)``       — EAGER: run the forward un-jitted inside the
  context; activations are concrete arrays.
- ``capture_jit(params)`` / ``capture_pipeline(pipe)`` — COMPILED: hooked
  linears bake an ``io_callback`` into the traced program so activations
  stream to the host from inside jitted forwards (including the fused
  sampler scan) without breaking compilation or fusion around them.

Name resolution inside a trace: weights passed as jit *arguments* are
tracers, so a static id→name map built from concrete params can't see them.
``trace_names(params)`` sets a contextvar map from the traced params dict at
the top of the wrapped forward — the hook consults it per call, which is how
``capture_pipeline`` taps programs whose params stay traced jit arguments
(required: closing weights over would bake them into the XLA program as
constants).
"""
from __future__ import annotations

import contextlib
import contextvars
import fnmatch
import functools
from typing import Callable, Dict, List, Optional

import numpy as np

# per-trace id(weight-leaf) → checkpoint name, set while a wrapped forward
# is being traced (see trace_names / wrap_forward_with_names)
_TRACE_NAME_MAP: contextvars.ContextVar = contextvars.ContextVar(
    "sdtpu_tap_name_map", default=None
)


def tap_leaf(w):
    """The identity-carrying array of a param leaf: the packed payload for
    quant tensors (NamedTuples re-materialize fields through flatten, but the
    field object itself is stable within one trace), else the leaf itself.
    No truthiness on arrays — multi-element `bool(arr)` raises."""
    q = getattr(w, "q", None)
    if q is None:
        q = getattr(w, "packed", None)
    if q is None and type(w).__name__ == "LoraTensor":
        q = w.w
    return w if q is None else q


def _name_map(params: Dict[str, object]) -> Dict[int, str]:
    return {id(tap_leaf(w)): n for n, w in params.items()}


def resolve_name(weight, static_map: Dict[int, str]) -> Optional[str]:
    """Layer name for a weight seen inside a hooked linear: the static map
    (concrete / closed-over params) first, then the active per-trace map."""
    try:
        leaf_id = id(tap_leaf(weight))
    except Exception:
        return None
    name = static_map.get(leaf_id)
    if name is None:
        m = _TRACE_NAME_MAP.get()
        if m is not None:
            name = m.get(leaf_id)
    return name


@contextlib.contextmanager
def trace_names(params: Dict[str, object]):
    """Expose `params`' id→name map to hooked linears for the duration of a
    (traced or eager) forward call."""
    tok = _TRACE_NAME_MAP.set(_name_map(params))
    try:
        yield
    finally:
        _TRACE_NAME_MAP.reset(tok)


def wrap_forward_with_names(fn: Callable) -> Callable:
    """Wrap a diffusion_fn(params, ...) so each call (including the trace-time
    call under jit) publishes its params' name map to the tap contextvar."""

    @functools.wraps(fn)
    def wrapped(params, *a, **kw):
        with trace_names(params):
            return fn(params, *a, **kw)

    return wrapped


@contextlib.contextmanager
def patch_linear(hooked: Callable):
    """Swap sdtpu.ops.basic.linear for `hooked`, including modules that
    imported the symbol directly; restore on exit."""
    import sys

    import sdtpu.ops.basic as basic

    orig = basic.linear
    basic.linear = hooked
    patched = []
    for mod in list(sys.modules.values()):
        if mod is None or not getattr(mod, "__name__", "").startswith("sdtpu"):
            continue
        if getattr(mod, "linear", None) is orig:
            mod.linear = hooked
            patched.append(mod)
    try:
        yield orig
    finally:
        basic.linear = orig
        for mod in patched:
            mod.linear = orig


class TensorCapture:
    """Record inputs/outputs of named linear layers during a forward.

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
        """Eager capture: run the forward un-jitted inside this context."""
        id_to_name = _name_map(params)
        cap = self

        import sdtpu.ops.basic as basic

        orig = basic.linear

        def hooked(x, weight, bias=None):
            name = resolve_name(weight, id_to_name)
            y = orig(x, weight, bias)
            if name is not None and cap._want(name):
                cap.activations[name] = np.asarray(x, dtype=np.float32)
                if cap.capture_outputs:
                    cap.outputs[name] = np.asarray(y, dtype=np.float32)
            return y

        with patch_linear(hooked):
            yield self

    @contextlib.contextmanager
    def capture_jit(self, params: Optional[Dict[str, object]] = None):
        """In-jit tensor tap — the compiled-program analog of the reference's
        per-node backend eval callback (sd_set_backend_eval_callback,
        include/stable-diffusion.h:429).  Hooked linears bake an
        ``io_callback`` into the traced program, so activations stream to the
        host from INSIDE jitted forwards (including fused sampler scans).

        The context must be active while the program is *traced* (the first
        call of a fresh ``jax.jit``).  Names resolve from `params` when the
        jitted function closes over them, or from the per-trace map set by
        ``trace_names`` / ``wrap_forward_with_names`` when params are traced
        jit arguments (see ``capture_pipeline``).  Re-running the compiled
        program keeps firing the taps; activations hold the latest value.

        >>> cap = TensorCapture(patterns=["double_blocks.0.*"])
        >>> with cap.capture_jit(params):
        ...     out = jax.jit(lambda x: flux_forward(params, x, ...))(x)
        """
        from jax.experimental import io_callback

        import sdtpu.ops.basic as basic

        id_to_name = _name_map(params) if params else {}
        orig = basic.linear
        cap = self

        def _record(name, x):
            cap.activations[name] = np.asarray(x, dtype=np.float32)

        def _record_out(name, y):
            cap.outputs[name] = np.asarray(y, dtype=np.float32)

        def hooked(x, weight, bias=None):
            name = resolve_name(weight, id_to_name)
            y = orig(x, weight, bias)
            if name is not None and cap._want(name):
                io_callback(functools.partial(_record, name), None, x,
                            ordered=False)
                if cap.capture_outputs:
                    io_callback(functools.partial(_record_out, name), None, y,
                                ordered=False)
            return y

        with patch_linear(hooked):
            yield self

    @contextlib.contextmanager
    def capture_pipeline(self, pipe):
        """Tap a Pipeline's compiled sampling programs end-to-end: wraps
        ``pipe.diffusion_fn`` so each trace publishes its params' name map,
        clears the program cache so programs re-trace with taps baked in,
        and restores + re-clears on exit.  Works with the pipeline's normal
        params-as-jit-arguments design; every denoise step streams the tapped
        activations out via io_callback (call ``jax.effects_barrier()``
        before reading if the run just finished).

        >>> with cap.capture_pipeline(pipe):
        ...     pipe.generate(GenerationParams(...))
        """
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

    def summary(self) -> str:
        lines = [
            f"  {k}: {tuple(v.shape)} |x|max={np.abs(v).max():.4g}"
            for k, v in self.activations.items()
        ]
        return "\n".join(lines)

"""Native (C) loader kernels, built on demand with the system compiler.

The extension is compiled once into this directory and imported from there;
when the toolchain or build fails, callers fall back to the pure-numpy
implementations transparently.
"""
from __future__ import annotations

import os
import subprocess
import sys
import sysconfig
from typing import Optional

_HERE = os.path.dirname(__file__)
_mod = None
_tried = False


def _build() -> Optional[str]:
    src = os.path.join(_HERE, "dequant.c")
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(_HERE, "_sdtpu_native" + suffix)
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    include = sysconfig.get_paths()["include"]
    cc = os.environ.get("CC", "cc")
    cmd = [cc, "-O3", "-shared", "-fPIC", "-pthread", f"-I{include}", src, "-o", out]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.SubprocessError, OSError):
        return None
    return out


def get_native():
    """→ the _sdtpu_native module, or None when unavailable."""
    global _mod, _tried
    if _mod is not None or _tried:
        return _mod
    _tried = True
    if os.environ.get("SDTPU_DISABLE_NATIVE"):
        return None
    path = _build()
    if path is None:
        return None
    try:
        import importlib.util

        spec = importlib.util.spec_from_file_location("_sdtpu_native", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _mod = mod
    except Exception:
        _mod = None
    return _mod

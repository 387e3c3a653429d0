"""Device mesh construction (TPU-native replacement for the reference's
device-placement machinery — SURVEY.md §2.14).

The reference distributes work via per-module backend assignment, layer
splits, and CUDA row-split buffers; on TPU all of these collapse into
jax.sharding: a Mesh with named axes and NamedSharding annotations, with XLA
inserting the collectives over ICI.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def create_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("dp", "tp"),
    devices=None,
) -> Mesh:
    """Create a Mesh over the available devices.

    shape=None → put all devices on the last ("tp") axis if only one axis is
    useful, else (1, n).  A 1-device mesh still works (all collectives no-op),
    so single-chip and multi-chip run the same code path.
    """
    if devices is None:
        try:
            devices = jax.devices()
        except RuntimeError:
            devices = []
        if shape is not None and len(devices) < int(np.prod(shape)):
            # single-chip + virtual-CPU-mesh setups (tests, driver dry runs):
            # fall back to the host platform's forced device count
            try:
                cpu = jax.devices("cpu")
                if len(cpu) >= int(np.prod(shape)):
                    devices = cpu
            except RuntimeError:
                pass
    devices = list(devices)
    n = len(devices)
    if shape is None:
        shape = (1,) * (len(axis_names) - 1) + (n,)
    need = int(np.prod(shape))
    if need < n:
        devices = devices[:need]  # smaller meshes use a device prefix
    elif need > n:
        raise ValueError(f"mesh shape {shape} does not cover {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))

"""Multi-host distribution over DCN — the TPU-native replacement for the
reference's ggml RPC backend (docs/rpc.md, add_rpc_devices
ggml_extend_backend.h:98).

The reference tunnels tensors + graphs over TCP to rpc-server processes; on
TPU pods none of that infrastructure is needed: `jax.distributed` forms the
process group, every process sees the global device set, and NamedSharding
over a global mesh makes XLA compile the cross-host collectives (ICI within
a slice, DCN across slices).  There is no tensor serialization layer to
maintain and no ABI to match.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> bool:
    """Join the multi-host process group (reference rpc-server replacement).

    With no arguments, initializes only when a cluster environment is
    detectable (TPU pod metadata or COORDINATOR_ADDRESS/JAX_* env), so
    single-host runs are unaffected.  Returns True when the distributed
    runtime was initialized."""
    import jax

    explicit = coordinator_address is not None or num_processes is not None
    env_present = any(
        os.environ.get(k)
        for k in ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
                  "TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS")
    )
    if not explicit and not env_present:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return True


def global_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("dp", "tp"),
    dcn_axis: Optional[str] = None,
):
    """Mesh over the GLOBAL device set (all processes).

    dcn_axis: name of the axis that should span hosts/slices — it is laid
    out over the slowest-varying device dimension so its collectives ride
    DCN while the remaining axes stay on ICI (the scaling-book recipe:
    data-parallel outermost over DCN, tensor/sequence parallel within a
    slice)."""
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()  # global list across processes
    if shape is not None and len(devices) < int(np.prod(shape)):
        # virtual-CPU-mesh setups (tests, dry runs) — same fallback as
        # parallel.mesh.create_mesh
        try:
            cpu = jax.devices("cpu")
            if len(cpu) >= int(np.prod(shape)):
                devices = cpu
        except RuntimeError:
            pass
    n = len(devices)
    if shape is None:
        nproc = jax.process_count()
        if dcn_axis is not None and dcn_axis in axis_names and nproc > 1:
            per = n // nproc
            shape = tuple(
                nproc if a == dcn_axis else (per if i == len(axis_names) - 1 else 1)
                for i, a in enumerate(axis_names)
            )
        else:
            shape = (1,) * (len(axis_names) - 1) + (n,)
    need = int(np.prod(shape))
    if need > n:
        raise ValueError(f"mesh shape {shape} needs {need} devices, have {n}")
    if dcn_axis is not None and dcn_axis in axis_names:
        # put the DCN axis slowest-varying so each host's devices stay
        # contiguous on the ICI axes
        order = [axis_names.index(dcn_axis)] + [
            i for i in range(len(axis_names)) if axis_names[i] != dcn_axis
        ]
        arr = np.asarray(devices[:need]).reshape(
            tuple(shape[i] for i in order)
        )
        arr = np.moveaxis(arr, range(len(order)), order)
        return Mesh(arr, tuple(axis_names))
    return Mesh(np.asarray(devices[:need]).reshape(shape), tuple(axis_names))

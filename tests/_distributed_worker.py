"""Worker for test_distributed_multiprocess: joins a 2-process jax.distributed
group over loopback and runs a cross-process (DCN-axis) collective.

argv: coordinator_address process_id num_processes
"""
import sys


def main(coord: str, pid: int, nproc: int) -> None:
    from sdtpu.parallel.distributed import global_mesh, initialize_distributed

    ok = initialize_distributed(
        coordinator_address=coord, num_processes=nproc, process_id=pid)
    assert ok, "explicit args must initialize"

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 2 * nproc  # 2 local CPU devices per process

    # dp spans hosts (slowest-varying → DCN), tp stays process-local (ICI)
    mesh = global_mesh((nproc, 2), ("dp", "tp"), dcn_axis="dp")
    assert mesh.devices.shape == (nproc, 2)
    for i in range(nproc):
        procs = {d.process_index for d in mesh.devices[i]}
        assert procs == {i}, f"dp row {i} spans processes {procs}"

    # cross-process reduction: each process contributes rows filled with
    # (process_index + 1); the global sum proves the DCN-axis collective ran
    sharding = NamedSharding(mesh, P("dp", "tp"))
    local = np.full((2, 4), float(pid + 1), dtype=np.float32)
    x = jax.make_array_from_process_local_data(sharding, local, (2 * nproc, 4))
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(x)
    want = sum(8.0 * (p + 1) for p in range(nproc))
    assert float(total) == want, (float(total), want)
    print(f"WORKER_OK pid={pid} total={float(total)}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))

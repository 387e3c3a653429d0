"""Sharding tests on the 8-virtual-device CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sdtpu.parallel import create_mesh, shard_params, unet_partition_specs


def test_mesh_creation():
    mesh = create_mesh((2, 4), ("dp", "tp"))
    assert mesh.shape == {"dp": 2, "tp": 4}
    mesh1 = create_mesh(None, ("dp", "tp"), devices=jax.devices()[:1])
    assert mesh1.shape == {"dp": 1, "tp": 1}


def test_partition_specs():
    params = {
        "input_blocks.1.1.transformer_blocks.0.attn1.to_q.weight": jnp.zeros((64, 64)),
        "input_blocks.1.1.transformer_blocks.0.attn1.to_out.0.weight": jnp.zeros((64, 64)),
        "input_blocks.1.1.transformer_blocks.0.ff.net.0.proj.weight": jnp.zeros((512, 64)),
        "input_blocks.1.1.transformer_blocks.0.ff.net.2.weight": jnp.zeros((64, 256)),
        "input_blocks.0.0.weight": jnp.zeros((32, 4, 3, 3)),
        "out.0.weight": jnp.zeros((32,)),
    }
    specs = unet_partition_specs(params)
    assert specs["input_blocks.1.1.transformer_blocks.0.attn1.to_q.weight"] == P("tp", None)
    assert specs["input_blocks.1.1.transformer_blocks.0.attn1.to_out.0.weight"] == P(None, "tp")
    assert specs["input_blocks.1.1.transformer_blocks.0.ff.net.0.proj.weight"] == P("tp", None)
    assert specs["input_blocks.1.1.transformer_blocks.0.ff.net.2.weight"] == P(None, "tp")
    assert specs["input_blocks.0.0.weight"] == P()
    assert specs["out.0.weight"] == P()


def test_sharded_matmul_matches_replicated():
    """TP-sharded linear == replicated result (GSPMD inserts the psum)."""
    from sdtpu.ops import linear

    mesh = create_mesh((1, 8), ("dp", "tp"))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 64), dtype=np.float32))
    params = {"ff.net.0.proj.weight": jnp.asarray(rng.standard_normal((128, 64), dtype=np.float32)),
              "ff.net.2.weight": jnp.asarray(rng.standard_normal((64, 128), dtype=np.float32))}
    want = np.asarray(linear(linear(x, params["ff.net.0.proj.weight"]), params["ff.net.2.weight"]))
    with mesh:
        sharded = shard_params(params, mesh)
        got = np.asarray(
            jax.jit(lambda p, x: linear(linear(x, p["ff.net.0.proj.weight"]), p["ff.net.2.weight"]))(
                sharded, x
            )
        )
    # TP splits the contraction across devices; psum reduction order differs
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_dryrun_multichip():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)

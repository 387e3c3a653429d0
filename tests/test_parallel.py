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


def test_ring_attention_matches_dense():
    """Ring attention over an 8-way sequence shard == plain attention."""
    from sdtpu.ops.attention import attention
    from sdtpu.parallel import create_mesh, ring_attention

    mesh = create_mesh((8,), ("sp",), devices=jax.devices("cpu"))
    rng = np.random.default_rng(0)
    b, h, l, d = 2, 4, 64, 16  # l divisible by 8
    q = jnp.asarray(rng.standard_normal((b, h, l, d)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, l, d)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, l, d)), dtype=jnp.float32)

    ref = np.asarray(attention(q, k, v, flash=False))
    out = np.asarray(ring_attention(q, k, v, mesh, axis="sp"))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_ring_attention_single_device():
    from sdtpu.ops.attention import attention
    from sdtpu.parallel import create_mesh, ring_attention

    mesh = create_mesh((1,), ("sp",), devices=jax.devices("cpu")[:1])
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((1, 2, 16, 8)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 2, 16, 8)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 2, 16, 8)), dtype=jnp.float32)
    ref = np.asarray(attention(q, k, v, flash=False))
    out = np.asarray(ring_attention(q, k, v, mesh, axis="sp"))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_dit_partition_specs():
    from jax.sharding import PartitionSpec as P

    from sdtpu.parallel import partition_specs

    params = {
        "double_blocks.0.img_attn.qkv.weight": jnp.zeros((192, 64)),
        "double_blocks.0.img_attn.proj.weight": jnp.zeros((64, 64)),
        "double_blocks.0.img_mlp.0.weight": jnp.zeros((256, 64)),
        "single_blocks.0.linear1.weight": jnp.zeros((448, 64)),
        "single_blocks.0.linear2.weight": jnp.zeros((64, 320)),
        "blocks.0.self_attn.q.weight": jnp.zeros((64, 64)),
        "blocks.0.self_attn.o.weight": jnp.zeros((64, 64)),
        "blocks.0.ffn.0.weight": jnp.zeros((256, 64)),
        "blocks.0.ffn.2.weight": jnp.zeros((64, 256)),
        "encoder.block.0.layer.0.SelfAttention.q.weight": jnp.zeros((64, 64)),
        "encoder.block.0.layer.1.DenseReluDense.wo.weight": jnp.zeros((64, 128)),
        "blocks.0.modulation": jnp.zeros((1, 6, 64)),
    }
    specs = partition_specs(params)
    assert specs["double_blocks.0.img_attn.qkv.weight"] == P("tp", None)
    assert specs["double_blocks.0.img_attn.proj.weight"] == P(None, "tp")
    assert specs["single_blocks.0.linear1.weight"] == P("tp", None)
    assert specs["single_blocks.0.linear2.weight"] == P(None, "tp")
    assert specs["blocks.0.self_attn.q.weight"] == P("tp", None)
    assert specs["blocks.0.self_attn.o.weight"] == P(None, "tp")
    assert specs["blocks.0.ffn.0.weight"] == P("tp", None)
    assert specs["blocks.0.ffn.2.weight"] == P(None, "tp")
    assert specs["encoder.block.0.layer.0.SelfAttention.q.weight"] == P("tp", None)
    assert specs["encoder.block.0.layer.1.DenseReluDense.wo.weight"] == P(None, "tp")
    assert specs["blocks.0.modulation"] == P()


def test_tp_sharded_flux_matches_replicated():
    """TP-sharded FLUX forward == unsharded (GSPMD inserts the collectives)."""
    from sdtpu.models.flux import FluxConfig, flux_forward, init_flux_params
    from sdtpu.parallel import create_mesh, shard_params

    cfg = FluxConfig(
        in_channels=16, hidden_size=64, num_heads=2, depth=2, depth_single=2,
        axes_dim=(8, 12, 12), context_in_dim=96, vec_in_dim=48,
        guidance_embed=False,
    )
    p = init_flux_params(cfg, seed=0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4), dtype=np.float32))
    ctx = jnp.asarray(rng.standard_normal((2, 12, 96), dtype=np.float32))
    y = jnp.asarray(rng.standard_normal((2, 48), dtype=np.float32))
    t = jnp.asarray([0.5, 0.7])

    ref = np.asarray(flux_forward(p, x, t, ctx, y, cfg=cfg))

    mesh = create_mesh((2, 4), ("dp", "tp"), devices=jax.devices("cpu"))
    with mesh:
        ps = shard_params(p, mesh)
        fn = jax.jit(lambda p, x, t, c, y: flux_forward(p, x, t, c, y, cfg=cfg))
        out = np.asarray(fn(ps, x, t, ctx, y))
    np.testing.assert_allclose(out, ref, rtol=5e-4, atol=5e-4)


def test_tp_sharded_wan_matches_replicated():
    from sdtpu.models.wan import WanConfig, init_wan_params, wan_forward
    from sdtpu.parallel import create_mesh, shard_params

    cfg = WanConfig(in_dim=4, dim=64, ffn_dim=128, freq_dim=32, text_dim=96,
                    out_dim=4, num_heads=2, num_layers=2, axes_dim=(8, 12, 12))
    p = init_wan_params(cfg, seed=0)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 2, 8, 8, 4), dtype=np.float32))
    ctx = jnp.asarray(rng.standard_normal((1, 12, 96), dtype=np.float32))
    t = jnp.asarray([500.0])
    ref = np.asarray(wan_forward(p, x, t, ctx, cfg=cfg))
    mesh = create_mesh((1, 8), ("dp", "tp"), devices=jax.devices("cpu"))
    with mesh:
        ps = shard_params(p, mesh)
        out = np.asarray(jax.jit(lambda p, x, t, c: wan_forward(p, x, t, c, cfg=cfg))(ps, x, t, ctx))
    np.testing.assert_allclose(out, ref, rtol=5e-4, atol=5e-4)

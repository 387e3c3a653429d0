"""Multi-host helpers + profiling utilities (SURVEY.md §2.14 / §5)."""
import numpy as np

import jax
import jax.numpy as jnp

from sdtpu.parallel.distributed import global_mesh, initialize_distributed
from sdtpu.utils.profiling import PhaseTimer, module_memory_report


def test_initialize_distributed_noop_without_cluster(monkeypatch):
    for k in ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
              "TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(k, raising=False)
    assert initialize_distributed() is False  # single-host: no-op


def test_global_mesh_shapes():
    mesh = global_mesh((2, 4), ("dp", "tp"))
    assert mesh.shape == {"dp": 2, "tp": 4}
    mesh = global_mesh(axis_names=("dp", "tp"))
    assert mesh.shape["dp"] == 1
    # dcn axis placement (single process → dcn axis size from shape)
    mesh = global_mesh((2, 4), ("dp", "tp"), dcn_axis="dp")
    assert mesh.shape == {"dp": 2, "tp": 4}
    # sharded computation over the dcn-ordered mesh still works
    from jax.sharding import NamedSharding, PartitionSpec as P

    x = jax.device_put(jnp.arange(16.0).reshape(8, 2),
                       NamedSharding(mesh, P("dp", None)))
    np.testing.assert_allclose(np.asarray(jnp.sum(x)), 120.0)


def test_phase_timer_and_memory_report():
    t = PhaseTimer()
    with t.phase("sampling"):
        pass
    with t.phase("decode"):
        pass
    assert set(t.phases) == {"sampling", "decode"}
    assert "total" in t.summary()

    from sdtpu.ops.quant import quantize_per_channel, quantize_q4

    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 512)).astype(np.float32)
    report = module_memory_report({
        "diffusion": {
            "a.weight": jnp.asarray(w),
            "b.weight": quantize_per_channel(w),
            "c.weight": quantize_q4(w),
        },
        "vae": {"x.weight": jnp.zeros((8, 8), jnp.float32)},
        "skipped": None,
    })
    assert "diffusion" in report and "vae" in report and "total" in report
    # int8 + q4 weights report packed sizes, not dequantized f32
    assert "MB" in report


def test_tensor_capture_records_named_activations():
    """Debug capture analog of capture_tensor / backend eval callback
    (reference ggml_extend.hpp:1700)."""
    from sdtpu.models.unet import SD1_UNET_CONFIG, init_unet_params, unet_forward
    from sdtpu.utils.debug import TensorCapture
    import dataclasses

    cfg = dataclasses.replace(SD1_UNET_CONFIG, model_channels=32,
                              num_res_blocks=1, channel_mult=(1, 2),
                              transformer_depth=(1, 1), num_heads=2,
                              context_dim=32, adm_in_channels=None)
    p = init_unet_params(cfg, seed=0)
    x = jnp.zeros((1, 16, 16, 4), jnp.float32)
    t = jnp.asarray([500.0], jnp.float32)
    ctx = jnp.zeros((1, 7, 32), jnp.float32)

    cap = TensorCapture(patterns=["*attn1.to_q*"], capture_outputs=True)
    with cap.capture(p):
        unet_forward(p, x, t, ctx, cfg=cfg)  # eager
    assert cap.activations, "no activations captured"
    assert all("attn1.to_q" in k for k in cap.activations)
    assert set(cap.outputs) == set(cap.activations)
    assert "attn1.to_q" in cap.summary()

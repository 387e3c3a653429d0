"""Multi-host helpers + profiling utilities (SURVEY.md §2.14 / §5)."""
import numpy as np
import pytest

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


def test_tensor_capture_inside_jit():
    """In-jit per-node tap (reference sd_set_backend_eval_callback,
    include/stable-diffusion.h:429 — VERDICT r3 item 9): io_callback taps
    baked into the traced program stream activations out of COMPILED
    forwards, and keep firing on re-execution of the cached program."""
    import jax

    from sdtpu.models.unet import SD1_UNET_CONFIG, init_unet_params, unet_forward
    from sdtpu.utils.debug import TensorCapture
    import dataclasses

    cfg = dataclasses.replace(SD1_UNET_CONFIG, model_channels=32,
                              num_res_blocks=1, channel_mult=(1, 2),
                              transformer_depth=(1, 1), num_heads=2,
                              context_dim=32, adm_in_channels=None)
    p = init_unet_params(cfg, seed=0)
    t = jnp.asarray([500.0], jnp.float32)
    ctx = jnp.zeros((1, 7, 32), jnp.float32)

    cap = TensorCapture(patterns=["*attn1.to_q*"], capture_outputs=True)
    with cap.capture_jit(p):
        fwd = jax.jit(lambda x: unet_forward(p, x, t, ctx, cfg=cfg))
        out = fwd(jnp.zeros((1, 16, 16, 4), jnp.float32))
    out.block_until_ready()
    jax.effects_barrier()
    assert cap.activations, "no activations captured from inside jit"
    assert all("attn1.to_q" in k for k in cap.activations)
    assert set(cap.outputs) == set(cap.activations)
    first = {k: v.copy() for k, v in cap.activations.items()}
    # compiled program keeps the taps on re-execution with new inputs
    out2 = fwd(jnp.ones((1, 16, 16, 4), jnp.float32))
    out2.block_until_ready()
    jax.effects_barrier()
    changed = any(
        not np.allclose(first[k], cap.activations[k]) for k in first
    )
    assert changed, "taps did not fire on cached-program re-execution"


@pytest.mark.slow
def test_tensor_capture_through_pipeline():
    """capture_pipeline taps the REAL factory pipeline path — params stay
    traced jit arguments; names resolve via the per-trace contextvar map
    (sdtpu.utils.debug.trace_names).  This is the full analog of the
    reference wiring sd_set_backend_eval_callback around generation."""
    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.factory import create_pipeline
    from sdtpu.utils.debug import TensorCapture

    pipe = create_pipeline(SDVersion.SD1, small=True, seed=0)
    orig_fn = pipe.diffusion_fn
    cap = TensorCapture(patterns=["*attn1.to_q*"])
    with cap.capture_pipeline(pipe):
        res = pipe.generate(GenerationParams(
            prompt="x", width=64, height=64, sample_steps=2,
            sample_method="euler"))
    jax.effects_barrier()
    assert len(res.images) == 1
    assert cap.activations, "no activations captured through pipe.generate"
    assert all("attn1.to_q" in k for k in cap.activations)
    # pipeline fully restored: unwrapped forward + cleared program cache
    assert pipe.diffusion_fn is orig_fn
    assert not pipe._program_cache


@pytest.mark.slow
def test_imatrix_through_pipeline_accumulates_all_steps():
    """capture_pipeline on IMatrixCollector accumulates every denoise step's
    matmuls from inside the compiled sampler scan (reference imatrix.cpp
    collects across generation on the eval callback)."""
    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.factory import create_pipeline
    from sdtpu.io.imatrix import IMatrixCollector

    pipe = create_pipeline(SDVersion.SD1, small=True, seed=0)
    col = IMatrixCollector()
    steps = 3
    with col.capture_pipeline(pipe):
        pipe.generate(GenerationParams(
            prompt="x", width=64, height=64, sample_steps=steps,
            sample_method="euler", cfg_scale=1.0))
    jax.effects_barrier()
    assert col.values, "no imatrix entries collected through the pipeline"
    some = [n for n in col.values if "attn" in n]
    assert some
    # every step fired the tap (cfg 1.0 → one forward per step)
    assert max(col.ncall.values()) >= steps
    for n, v in col.values.items():
        assert np.all(np.isfinite(v)) and v.ndim == 1

"""Reference-CLI long-tail closure: --backend/--params-backend/--split-mode/
--rpc-servers/--lora-apply-mode/--vae-format/--imat-in/--imat-out/--color/
--version/--image/--temporal-tiling/conv-direct (reference
examples/common/common.cpp:406-664 + cli/main.cpp:72-215)."""
import numpy as np
import pytest

import jax.numpy as jnp

from sdtpu.cli import _parse_assignment_spec, build_parser


def test_long_tail_flags_parse():
    a = build_parser().parse_args([
        "-p", "x", "-m", "m.safetensors",
        "--backend", "clip=cpu,vae=tpu0",
        "--params-backend", "diffusion=disk,clip=cpu",
        "--split-mode", "layer",
        "--vae-format", "flux2",
        "--lora-apply-mode", "at_runtime",
        "--imat-in", "a.dat", "--imat-in", "b.dat",
        "--imat-out", "out.dat",
        "--color", "--temporal-tiling",
        "--diffusion-conv-direct", "--vae-conv-direct",
        "--image", "pic.png",
    ])
    assert a.backend == "clip=cpu,vae=tpu0"
    assert a.imatrix == ["a.dat", "b.dat"]
    assert a.imatrix_out == "out.dat"
    assert a.lora_apply_mode == "at_runtime"
    assert a.vae_format == "flux2"
    assert a.vae_temporal_tiling  # --temporal-tiling alias
    assert a.image == "pic.png"


def test_version_flag_exits():
    with pytest.raises(SystemExit) as e:
        build_parser().parse_args(["--version"])
    assert e.value.code == 0


def test_rpc_servers_errors_with_pointer(capsys):
    from sdtpu.cli import main

    rc = main(["-p", "x", "-m", "m.safetensors",
               "--rpc-servers", "localhost:50052"])
    assert rc == 2
    assert "jax.distributed" in capsys.readouterr().out


def test_parse_assignment_spec():
    assert _parse_assignment_spec("cpu") == {"*": "cpu"}
    assert _parse_assignment_spec("clip=cpu, vae=tpu0") == {
        "clip": "cpu", "vae": "tpu0"}
    assert _parse_assignment_spec("") == {}


def test_lora_tensor_linear_matches_merged():
    """LoraTensor runtime path == merged dense weights."""
    import sdtpu.ops.basic as basic
    from sdtpu.ops.quant import LoraTensor

    rng = np.random.default_rng(0)
    w = rng.standard_normal((16, 8)).astype(np.float32)
    down = rng.standard_normal((2, 8)).astype(np.float32)
    up = rng.standard_normal((16, 2)).astype(np.float32)
    x = rng.standard_normal((3, 8)).astype(np.float32)
    lt = LoraTensor(jnp.asarray(w), jnp.asarray(down), jnp.asarray(up))
    y_rt = basic.linear(jnp.asarray(x), lt)
    y_merged = basic.linear(jnp.asarray(x), jnp.asarray(w + up @ down))
    np.testing.assert_allclose(np.asarray(y_rt), np.asarray(y_merged),
                               rtol=1e-5, atol=1e-5)
    assert lt.shape == (16, 8) and lt.ndim == 2


_PNAME = "input_blocks.1.1.transformer_blocks.0.attn1.to_q.weight"
_LKEY = "lora_unet_input_blocks_1_1_transformer_blocks_0_attn1_to_q"


def _mk_lora(out_d, in_d, r, seed=1):
    rng = np.random.default_rng(seed)
    return {
        f"{_LKEY}.lora_down.weight":
            rng.standard_normal((r, in_d)).astype(np.float32) * 0.1,
        f"{_LKEY}.lora_up.weight":
            rng.standard_normal((out_d, r)).astype(np.float32) * 0.1,
        f"{_LKEY}.alpha": np.float32(r),
    }


def _resolvable_params(w):
    return {"diffusion": {_PNAME: w}}


def test_apply_lora_modes_dense():
    from sdtpu.models.lora import apply_lora
    from sdtpu.ops.quant import LoraTensor

    rng = np.random.default_rng(0)
    w = rng.standard_normal((16, 8)).astype(np.float32)
    lora = _mk_lora(16, 8, 2)

    pm = _resolvable_params(jnp.asarray(w))
    n, _ = apply_lora(pm, lora, 1.0, mode="at_runtime")
    assert n == 1
    leaf = pm["diffusion"][_PNAME]
    assert isinstance(leaf, LoraTensor)

    # stacking a second LoRA concatenates ranks
    n, _ = apply_lora(pm, _mk_lora(16, 8, 3, seed=2), 1.0, mode="at_runtime")
    assert n == 1
    leaf2 = pm["diffusion"][_PNAME]
    assert leaf2.lora_down.shape[0] == 5

    # immediate merge for reference values
    pm_m = _resolvable_params(jnp.asarray(w))
    apply_lora(pm_m, lora, 1.0, mode="immediately")
    apply_lora(pm_m, _mk_lora(16, 8, 3, seed=2), 1.0, mode="immediately")
    import sdtpu.ops.basic as basic

    x = jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(basic.linear(x, leaf2)),
        np.asarray(basic.linear(x, pm_m["diffusion"][_PNAME])),
        rtol=1e-4, atol=1e-4)


def test_apply_lora_immediately_quant_base():
    from sdtpu.models.lora import apply_lora
    from sdtpu.ops.quant import QuantTensor, dequantize, quantize_per_channel

    rng = np.random.default_rng(0)
    w = rng.standard_normal((16, 8)).astype(np.float32)
    qt = quantize_per_channel(w)
    lora = _mk_lora(16, 8, 2)
    pm = _resolvable_params(qt)
    n, _ = apply_lora(pm, lora, 1.0, mode="immediately")
    assert n == 1
    leaf = pm["diffusion"][_PNAME]
    assert isinstance(leaf, QuantTensor)
    down = lora[f"{_LKEY}.lora_down.weight"]
    up = lora[f"{_LKEY}.lora_up.weight"]
    want = np.asarray(dequantize(qt, jnp.float32)) + up @ down
    got = np.asarray(dequantize(leaf, jnp.float32))
    # int8 requantization noise bounds the error
    assert np.abs(got - want).max() < np.abs(want).max() * 0.02


def test_apply_lora_group_quant_base_merges():
    """GroupQuantTensor bases merge on their own group grid (previously
    crashed in the dense fallback path)."""
    from sdtpu.models.lora import apply_lora
    from sdtpu.ops.quant import dequantize_group, quantize_group

    rng = np.random.default_rng(0)
    w = rng.standard_normal((16, 64)).astype(np.float32)
    gq = quantize_group(w, group=32)
    lora = _mk_lora(16, 64, 2)
    pm = _resolvable_params(gq)
    n, _ = apply_lora(pm, lora, 1.0)
    assert n == 1
    leaf = pm["diffusion"][_PNAME]
    assert type(leaf).__name__ == "GroupQuantTensor" and leaf.group == 32
    down = lora[f"{_LKEY}.lora_down.weight"]
    up = lora[f"{_LKEY}.lora_up.weight"]
    want = w + up @ down
    got = np.asarray(dequantize_group(leaf, jnp.float32))
    assert np.abs(got - want).max() < np.abs(want).max() * 0.02


def test_imatrix_multi_in_merges(tmp_path):
    from sdtpu.io.imatrix import IMatrixCollector

    a = IMatrixCollector()
    a.values["t.weight"] = np.ones(4, np.float32)
    a.counts["t.weight"] = 1
    a.ncall["t.weight"] = 1
    p1 = str(tmp_path / "a.dat")
    a.save(p1)
    b = IMatrixCollector()
    b.load(p1)
    b.load(p1)
    assert b.ncall["t.weight"] == 2
    np.testing.assert_allclose(b.values["t.weight"], 2 * np.ones(4), rtol=1e-6)


def test_create_pipeline_accepts_vae_format_kwarg():
    """Non-PiD families ignore the override (reference only PiD honors
    vae_format, stable-diffusion.cpp:1366)."""
    from sdtpu.config import SDVersion
    from sdtpu.factory import create_pipeline

    pipe = create_pipeline(SDVersion.SD1, small=True, seed=0,
                           vae_format="flux")
    assert pipe is not None


def test_set_log_color_tags():
    import sys

    from sdtpu.utils.logging import log_info, set_log_color

    try:
        set_log_color(True)
        import io

        cap = io.StringIO()
        old = sys.stderr
        sys.stderr = cap
        try:
            log_info("colored")
        finally:
            sys.stderr = old
        assert "\x1b[32m" in cap.getvalue()
    finally:
        set_log_color(False)

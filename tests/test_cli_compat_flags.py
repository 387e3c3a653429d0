"""Reference CLI compat-flag stragglers (VERDICT r3 missing #2/#4/#5/#7):
metadata-mode output options, output sequence indexing, --convert-name,
the --disable-auto-resize-ref-image alias, high-noise guidance flags, and
the chunk-level metadata walker.
"""
import json
import subprocess
import sys

import numpy as np
import pytest

from sdtpu.cli import build_parser, main, resolve_output_path
from sdtpu.utils.image import walk_image_metadata, write_png


def test_new_flags_parse():
    a = build_parser().parse_args([
        "-p", "x", "-m", "m.safetensors",
        "--high-noise-img-cfg-scale", "1.5",
        "--high-noise-slg-scale", "2.0",
        "--high-noise-skip-layers", "3,4",
        "--high-noise-skip-layer-start", "0.1",
        "--high-noise-skip-layer-end", "0.9",
        "--preview-noisy", "--taesd-preview-only",
        "--metadata-format", "json", "--metadata-brief", "--metadata-all",
        "--metadata-raw", "--force-sdxl-vae-conv-scale",
        "--output-begin-idx", "3", "--convert-name",
        "--disable-auto-resize-ref-image",
    ])
    assert a.high_noise_img_cfg_scale == 1.5
    assert a.high_noise_slg_scale == 2.0
    assert a.high_noise_skip_layers == "3,4"
    assert a.high_noise_slg_start == 0.1 and a.high_noise_slg_end == 0.9
    assert a.preview_noisy and a.taesd_preview_only
    assert a.metadata_format == "json"
    assert a.metadata_brief and a.metadata_all and a.metadata_raw
    assert a.force_sdxl_vae_conv_scale
    assert a.output_begin_idx == 3 and a.convert_name
    assert a.disable_auto_resize_ref_image


def test_mode_flag_alias():
    # reference -M/--mode (cli/main.cpp:201) — same as the positional
    a = build_parser().parse_args(["-M", "vid_gen", "-p", "x", "-m", "m.gguf"])
    assert a.mode_flag == "vid_gen"
    a = build_parser().parse_args(["--mode", "metadata", "-m", "out.png"])
    assert a.mode_flag == "metadata"


def test_resolve_output_path():
    assert resolve_output_path("out.png", 0, 1) == "out.png"
    assert resolve_output_path("out.png", 0, 3) == "out_0.png"
    assert resolve_output_path("out.png", 2, 3, begin_idx=5) == "out_7.png"
    assert resolve_output_path("img_%03d.png", 1, 3) == "img_001.png"
    assert resolve_output_path("img_%d.png", 0, 1, begin_idx=9) == "img_9.png"


def test_walk_image_metadata_png(tmp_path):
    p = str(tmp_path / "x.png")
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    write_png(p, img, parameters="a cat\nSteps: 20, Seed: 7")
    entries = walk_image_metadata(p)
    kw = {e.get("keyword"): e.get("value") for e in entries}
    assert kw.get("parameters", "").startswith("a cat")
    # structural entries only with include_structural
    assert not any(e["chunk"] == "IHDR" for e in entries)
    full = walk_image_metadata(p, include_structural=True)
    ihdr = next(e for e in full if e["chunk"] == "IHDR")
    assert ihdr["value"] == "8x8"
    # brief truncates long values
    write_png(p, img, parameters="x" * 300)
    brief = walk_image_metadata(p, brief=True)
    v = next(e["value"] for e in brief if e.get("keyword") == "parameters")
    assert len(v) < 300 and "chars)" in v


def test_metadata_mode_json_output(tmp_path, capsys):
    p = str(tmp_path / "m.png")
    write_png(p, np.zeros((4, 4, 3), dtype=np.uint8),
              parameters="hello\nSteps: 2, Seed: 1")
    rc = main(["metadata", "-m", p, "--metadata-format", "json"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["file"] == p
    assert any(e.get("keyword") == "parameters" for e in out["entries"])
    assert out["parameters"]["prompt"] == "hello"
    assert out["parameters"]["seed"] == "1"


def test_metadata_mode_text_output(tmp_path, capsys):
    p = str(tmp_path / "t.png")
    write_png(p, np.zeros((4, 4, 3), dtype=np.uint8), parameters="hi")
    rc = main(["metadata", "-m", p, "--metadata-all", "--metadata-raw"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "tEXt/parameters" in out
    assert "IHDR" in out  # structural included


def test_disable_auto_resize_alias(tmp_path, capsys):
    # the alias must rewrite ref_image_args before mode dispatch; use
    # metadata mode so no model is needed
    p = str(tmp_path / "a.png")
    write_png(p, np.zeros((4, 4, 3), dtype=np.uint8), parameters="x")
    rc = main(["metadata", "-m", p, "--disable-auto-resize-ref-image"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "deprecated" in out


def test_convert_name_canonicalizes(tmp_path):
    from sdtpu.io.safetensors import load_safetensors, save_safetensors

    src = str(tmp_path / "in.safetensors")
    dst = str(tmp_path / "out.safetensors")
    # diffusers-style name that canonicalize_name rewrites
    save_safetensors(src, {
        "down_blocks.0.resnets.0.conv1.weight":
            np.zeros((4, 4, 3, 3), dtype=np.float32),
    })
    rc = main(["convert", "-m", src, "-o", dst, "--output-type", "f32",
               "--convert-name"])
    assert rc == 0
    names = list(load_safetensors(dst).keys())
    assert names == ["model.diffusion_model.input_blocks.1.0.in_layers.2.weight"]


def test_ref_resize_before_vae_off_changes_latent_grid():
    """resize_before_vae=off keeps the native ref size (round-down only);
    the default resizes toward the request size (reference
    stable-diffusion.cpp:4879-4896)."""
    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.factory import create_pipeline

    pipe = create_pipeline(SDVersion.FLUX, small=True, seed=0)
    captured = {}
    orig = pipe.ref_extras_fn

    def spy(refs, resize_before_vae=True, **kw):
        out = orig(refs, resize_before_vae=resize_before_vae, **kw)
        captured.update({k: v.shape for k, v in out.items()})
        return out

    pipe.ref_extras_fn = spy
    ref = np.zeros((128, 128, 3), dtype=np.uint8)
    gp = GenerationParams(prompt="x", width=64, height=64, sample_steps=1,
                          sample_method="euler", cfg_scale=1.0)
    pipe.generate(gp, ref_images=[ref])
    default_shape = captured["ref_latent_0"]

    captured.clear()
    gp2 = GenerationParams(prompt="x", width=64, height=64, sample_steps=1,
                           sample_method="euler", cfg_scale=1.0,
                           ref_image_args="resize_before_vae=0")
    pipe.generate(gp2, ref_images=[ref])
    native_shape = captured["ref_latent_0"]
    # default resized the 128px ref toward the 64px request; off keeps 128
    assert native_shape[1] > default_shape[1]

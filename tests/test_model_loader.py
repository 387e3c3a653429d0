"""Loader tests: torch-ckpt reading vs torch.save, name conversion, module
splitting, version detection."""
import numpy as np
import pytest

from sdtpu.config import SDVersion
from sdtpu.io.detect import detect_version
from sdtpu.io.model_loader import load_model_bundle, read_checkpoint_file, split_modules
from sdtpu.io.name_conversion import (
    canonicalize_name,
    convert_diffusers_unet_name,
    convert_diffusers_vae_name,
    convert_open_clip_name,
)

torch = pytest.importorskip("torch")


def test_torch_zip_checkpoint(tmp_path):
    sd = {
        "model.diffusion_model.x.weight": torch.randn(4, 8),
        "half.weight": torch.randn(3, 3).half(),
        "bf.weight": torch.randn(5).bfloat16(),
    }
    p = str(tmp_path / "m.ckpt")
    torch.save({"state_dict": sd}, p)
    out = read_checkpoint_file(p)
    assert set(out) == set(sd)
    np.testing.assert_allclose(
        out["model.diffusion_model.x.weight"], sd["model.diffusion_model.x.weight"].numpy()
    )
    np.testing.assert_allclose(out["half.weight"], sd["half.weight"].float().numpy())
    np.testing.assert_allclose(out["bf.weight"], sd["bf.weight"].float().numpy())


def test_torch_legacy_checkpoint(tmp_path):
    sd = {"a.weight": torch.randn(2, 3)}
    p = str(tmp_path / "legacy.pt")
    torch.save(sd, p, _use_new_zipfile_serialization=False)
    out = read_checkpoint_file(p)
    np.testing.assert_allclose(out["a.weight"], sd["a.weight"].numpy())


def test_unet_name_conversion():
    cases = {
        "time_embedding.linear_1.weight": "time_embed.0.weight",
        "time_embedding.linear_2.bias": "time_embed.2.bias",
        "conv_in.weight": "input_blocks.0.0.weight",
        "down_blocks.0.resnets.0.norm1.weight": "input_blocks.1.0.in_layers.0.weight",
        "down_blocks.0.resnets.1.conv2.weight": "input_blocks.2.0.out_layers.3.weight",
        "down_blocks.0.downsamplers.0.conv.weight": "input_blocks.3.0.op.weight",
        "down_blocks.1.resnets.0.time_emb_proj.weight": "input_blocks.4.0.emb_layers.1.weight",
        "down_blocks.1.attentions.0.transformer_blocks.0.attn1.to_q.weight":
            "input_blocks.4.1.transformer_blocks.0.attn1.to_q.weight",
        "mid_block.resnets.0.conv1.weight": "middle_block.0.in_layers.2.weight",
        "mid_block.attentions.0.proj_in.weight": "middle_block.1.proj_in.weight",
        "mid_block.resnets.1.norm2.bias": "middle_block.2.out_layers.0.bias",
        "up_blocks.0.resnets.0.conv_shortcut.weight": "output_blocks.0.0.skip_connection.weight",
        "up_blocks.1.resnets.2.conv1.weight": "output_blocks.5.0.in_layers.2.weight",
        "conv_norm_out.weight": "out.0.weight",
        "conv_out.bias": "out.2.bias",
    }
    for src, want in cases.items():
        assert convert_diffusers_unet_name(src) == want, src


def test_vae_name_conversion():
    cases = {
        "encoder.conv_in.weight": "encoder.conv_in.weight",
        "encoder.down_blocks.0.resnets.0.norm1.weight": "encoder.down.0.block.0.norm1.weight",
        "encoder.down_blocks.1.resnets.0.conv_shortcut.weight":
            "encoder.down.1.block.0.nin_shortcut.weight",
        "encoder.down_blocks.0.downsamplers.0.conv.weight": "encoder.down.0.downsample.conv.weight",
        "encoder.mid_block.attentions.0.group_norm.weight": "encoder.mid.attn_1.norm.weight",
        "encoder.mid_block.attentions.0.to_q.weight": "encoder.mid.attn_1.q.weight",
        "decoder.mid_block.resnets.1.conv2.weight": "decoder.mid.block_2.conv2.weight",
        "decoder.up_blocks.0.resnets.0.norm1.weight": "decoder.up.3.block.0.norm1.weight",
        "decoder.up_blocks.3.resnets.2.conv1.weight": "decoder.up.0.block.2.conv1.weight",
        "decoder.up_blocks.0.upsamplers.0.conv.weight": "decoder.up.3.upsample.conv.weight",
        "quant_conv.weight": "quant_conv.weight",
    }
    for src, want in cases.items():
        assert convert_diffusers_vae_name(src) == want, src


def test_open_clip_conversion():
    assert (
        convert_open_clip_name("transformer.resblocks.3.ln_1.weight")
        == "text_model.encoder.layers.3.layer_norm1.weight"
    )
    assert (
        convert_open_clip_name("transformer.resblocks.0.mlp.c_fc.bias")
        == "text_model.encoder.layers.0.mlp.fc1.bias"
    )
    assert (
        convert_open_clip_name("token_embedding.weight")
        == "text_model.embeddings.token_embedding.weight"
    )
    assert convert_open_clip_name("positional_embedding") == (
        "text_model.embeddings.position_embedding.weight"
    )
    assert "__inproj__" in convert_open_clip_name("transformer.resblocks.1.attn.in_proj_weight")


def test_detect_versions():
    sd1 = {
        "model.diffusion_model.input_blocks.0.0.weight": (320, 4, 3, 3),
        "model.diffusion_model.input_blocks.4.1.transformer_blocks.0.attn2.to_k.weight": (320, 768),
        "cond_stage_model.transformer.text_model.embeddings.token_embedding.weight": (49408, 768),
    }
    assert detect_version(sd1.keys(), sd1) == SDVersion.SD1
    sd2 = dict(sd1)
    sd2["model.diffusion_model.input_blocks.4.1.transformer_blocks.0.attn2.to_k.weight"] = (320, 1024)
    assert detect_version(sd2.keys(), sd2) == SDVersion.SD2
    inpaint = dict(sd1)
    inpaint["model.diffusion_model.input_blocks.0.0.weight"] = (320, 9, 3, 3)
    assert detect_version(inpaint.keys(), inpaint) == SDVersion.SD1_INPAINT
    sdxl = {
        "model.diffusion_model.input_blocks.0.0.weight": (320, 4, 3, 3),
        "model.diffusion_model.label_emb.0.0.weight": (1280, 2816),
        "model.diffusion_model.middle_block.1.transformer_blocks.9.attn1.to_q.weight": (1280, 1280),
        "conditioner.embedders.1.model.ln_final.weight": (1280,),
    }
    assert detect_version(sdxl.keys(), sdxl) == SDVersion.SDXL
    sd3 = {"model.diffusion_model.joint_blocks.0.context_block.attn.qkv.weight": (1, 1)}
    assert detect_version(sd3.keys(), sd3) == SDVersion.SD3
    flux = {"model.diffusion_model.double_blocks.0.img_attn.qkv.weight": (1, 1)}
    assert detect_version(flux.keys(), flux) == SDVersion.FLUX


def test_split_modules_in_proj():
    rng = np.random.default_rng(0)
    tensors = {
        "cond_stage_model.model.transformer.resblocks.0.attn.in_proj_weight": rng.standard_normal(
            (192, 64)
        ).astype(np.float32),
        "cond_stage_model.model.transformer.resblocks.0.attn.in_proj_bias": rng.standard_normal(
            192
        ).astype(np.float32),
        "model.diffusion_model.input_blocks.0.0.weight": rng.standard_normal((32, 4, 3, 3)).astype(
            np.float32
        ),
        "model.diffusion_model.input_blocks.4.1.transformer_blocks.0.attn2.to_k.weight":
            rng.standard_normal((32, 1024)).astype(np.float32),
    }
    bundle = split_modules(tensors)
    assert bundle.version == SDVersion.SD2
    pre = "text_model.encoder.layers.0.self_attn"
    assert bundle.clip_l[f"{pre}.q_proj.weight"].shape == (64, 64)
    np.testing.assert_array_equal(
        bundle.clip_l[f"{pre}.k_proj.weight"],
        tensors["cond_stage_model.model.transformer.resblocks.0.attn.in_proj_weight"][64:128],
    )


def test_load_bundle_multi_file(tmp_path):
    from sdtpu.io.safetensors import save_safetensors

    rng = np.random.default_rng(1)
    unet = {"input_blocks.0.0.weight": rng.standard_normal((320, 4, 3, 3)).astype(np.float32)}
    vae = {"decoder.conv_in.weight": rng.standard_normal((512, 4, 3, 3)).astype(np.float32)}
    save_safetensors(str(tmp_path / "unet.safetensors"), unet)
    save_safetensors(str(tmp_path / "vae.safetensors"), vae)
    bundle = load_model_bundle(
        diffusion_model_path=str(tmp_path / "unet.safetensors"),
        vae_path=str(tmp_path / "vae.safetensors"),
    )
    assert "input_blocks.0.0.weight" in bundle.diffusion
    assert "decoder.conv_in.weight" in bundle.vae


def test_detect_tiny_unet_variants():
    """Tiny distilled UNets split on middle-block absence + output-block
    fingerprints (reference model_loader.cpp:663-675)."""
    from sdtpu.io.detect import detect_version

    def mk(tok_dim, with_ob71, attn_1024=False):
        te_key = ("cond_stage_model.model.token_embedding.weight"
                  if tok_dim == 1024 else
                  "cond_stage_model.transformer.text_model.embeddings."
                  "token_embedding.weight")
        names = {
            "model.diffusion_model.input_blocks.0.0.weight",
            "model.diffusion_model.input_blocks.1.0.in_layers.0.weight",
            "model.diffusion_model.output_blocks.0.0.in_layers.0.weight",
            te_key,
        }
        shapes = {
            te_key: (49408, tok_dim),
            "model.diffusion_model.input_blocks.0.0.weight": (320, 4, 3, 3),
        }
        if with_ob71:
            k = ("model.diffusion_model.output_blocks.7.1."
                 "transformer_blocks.0.attn1.to_k.weight")
            names.add(k)
            shapes[k] = (1024 if attn_1024 else 320,
                         1024 if attn_1024 else 320)
        return names, shapes

    names, shapes = mk(768, with_ob71=True)
    assert detect_version(names, shapes) == SDVersion.SD1_TINY_UNET
    names, shapes = mk(768, with_ob71=False)
    assert detect_version(names, shapes) == SDVersion.SDXS_512_DS
    names, shapes = mk(1024, with_ob71=True, attn_1024=True)
    assert detect_version(names, shapes) == SDVersion.SDXS_09
    names, shapes = mk(1024, with_ob71=True, attn_1024=False)
    assert detect_version(names, shapes) == SDVersion.SD2_TINY_UNET
    # full SD1 keeps its middle block → not tiny
    names, shapes = mk(768, with_ob71=True)
    names.add("model.diffusion_model.middle_block.1.norm.weight")
    assert detect_version(names, shapes) == SDVersion.SD1


def test_detect_flux_concat_variants():
    """FLUX.1 input width → Fill / Controls / Flex.2
    (reference model_loader.cpp:636-645)."""
    from sdtpu.io.detect import detect_version

    def mk(in_w):
        names = {"double_blocks.0.img_attn.qkv.weight", "img_in.weight",
                 "single_blocks.0.linear1.weight"}
        return names, {"img_in.weight": (3072, in_w)}

    assert detect_version(*mk(64)) == SDVersion.FLUX
    assert detect_version(*mk(384)) == SDVersion.FLUX_FILL
    assert detect_version(*mk(128)) == SDVersion.FLUX_CONTROLS
    assert detect_version(*mk(196)) == SDVersion.FLEX_2


def test_write_synthetic_gguf_roundtrip(tmp_path):
    """The loader-bench checkpoint fabricator (bench item: time-to-first-
    image from disk) writes valid GGUF: q8_0 blocks for large 2-D weights,
    f32 elsewhere, parse-able by both loader paths — and the threaded
    load_gguf returns the same dict as SDTPU_LOAD_THREADS=1."""
    import os

    import jax
    import numpy as np

    from sdtpu.io.gguf import GGUFFile, load_gguf
    from sdtpu.utils.device_init import write_synthetic_gguf

    specs = {
        "blocks.0.attn.qkv.weight": jax.ShapeDtypeStruct((768, 256), np.float32),
        "blocks.0.norm.weight": jax.ShapeDtypeStruct((256,), np.float32),
        "blocks.0.attn.proj.bias": jax.ShapeDtypeStruct((256,), np.float32),
    }
    p = str(tmp_path / "synth.gguf")
    nbytes = write_synthetic_gguf(p, specs)
    assert os.path.getsize(p) == nbytes

    f = GGUFFile(p)
    assert f.tensor_type("blocks.0.attn.qkv.weight") == "q8_0"
    d = load_gguf(p, keep_quant=True)
    assert type(d["blocks.0.attn.qkv.weight"]).__name__ == "HostQuant"
    assert d["blocks.0.attn.qkv.weight"].shape == (768, 256)
    assert np.allclose(d["blocks.0.norm.weight"], 1.0)
    assert np.allclose(d["blocks.0.attn.proj.bias"], 0.0)

    os.environ["SDTPU_LOAD_THREADS"] = "1"
    try:
        serial = load_gguf(p, keep_quant=False)
    finally:
        del os.environ["SDTPU_LOAD_THREADS"]
    threaded = load_gguf(p, keep_quant=False)
    assert sorted(serial) == sorted(threaded)
    for k in serial:
        np.testing.assert_array_equal(serial[k], threaded[k])

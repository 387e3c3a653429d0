"""Diffusers name-conversion breadth (VERDICT r1 item 8): flux / SD3 /
lumina2 / krea2 / wan-vae / pmid / ip-adapter mappings + fused-qkv merge.

Reference: src/name_conversion.cpp:434-1325.
"""
import numpy as np

from sdtpu.io.model_loader import (
    _merge_fused_markers,
    convert_diffusers_diffusion_names,
    maybe_convert_diffusers_wan_vae,
)
from sdtpu.io.name_conversion import (
    convert_diffusers_flux_name,
    convert_diffusers_krea2_name,
    convert_diffusers_lumina2_name,
    convert_diffusers_sd3_name,
    convert_diffusers_wan_vae_name,
    convert_ip_adapter_name,
    convert_pmid_name,
)


def test_flux_names():
    cases = {
        "time_text_embed.timestep_embedder.linear_1.weight": "time_in.in_layer.weight",
        "time_text_embed.guidance_embedder.linear_2.bias": "guidance_in.out_layer.bias",
        "context_embedder.weight": "txt_in.weight",
        "x_embedder.bias": "img_in.bias",
        "transformer_blocks.3.norm1.linear.weight": "double_blocks.3.img_mod.lin.weight",
        "transformer_blocks.3.attn.to_q.weight": "double_blocks.3.img_attn.qkv.weight",
        "transformer_blocks.3.attn.to_k.weight": "double_blocks.3.img_attn.qkv.weight.1",
        "transformer_blocks.3.attn.to_v.bias": "double_blocks.3.img_attn.qkv.bias.2",
        "transformer_blocks.3.attn.add_q_proj.weight": "double_blocks.3.txt_attn.qkv.weight",
        "transformer_blocks.3.attn.norm_q.weight": "double_blocks.3.img_attn.norm.query_norm.scale",
        "transformer_blocks.3.attn.norm_added_k.weight": "double_blocks.3.txt_attn.norm.key_norm.scale",
        "transformer_blocks.3.ff.net.0.proj.weight": "double_blocks.3.img_mlp.0.weight",
        "transformer_blocks.3.ff_context.net.2.bias": "double_blocks.3.txt_mlp.2.bias",
        "transformer_blocks.3.attn.to_out.0.weight": "double_blocks.3.img_attn.proj.weight",
        "transformer_blocks.3.attn.to_add_out.weight": "double_blocks.3.txt_attn.proj.weight",
        "single_transformer_blocks.7.attn.to_q.weight": "single_blocks.7.linear1.weight",
        "single_transformer_blocks.7.proj_mlp.weight": "single_blocks.7.linear1.weight.3",
        "single_transformer_blocks.7.norm.linear.bias": "single_blocks.7.modulation.lin.bias",
        "single_transformer_blocks.7.attn.norm_q.weight": "single_blocks.7.norm.query_norm.scale",
        "single_transformer_blocks.7.proj_out.weight": "single_blocks.7.linear2.weight",
        "proj_out.weight": "final_layer.linear.weight",
        "norm_out.linear.weight": "final_layer.adaLN_modulation.1.weight",
        # Comfy-Org re-export: internal names with .weight instead of .scale
        "double_blocks.0.img_attn.norm.query_norm.weight":
            "double_blocks.0.img_attn.norm.query_norm.scale",
    }
    for src, want in cases.items():
        assert convert_diffusers_flux_name(src) == want, src


def test_sd3_names():
    cases = {
        "time_text_embed.timestep_embedder.linear_1.weight": "t_embedder.mlp.0.weight",
        "time_text_embed.text_embedder.linear_2.bias": "y_embedder.mlp.2.bias",
        "pos_embed.pos_embed": "pos_embed",
        "pos_embed.proj.weight": "x_embedder.proj.weight",
        "transformer_blocks.2.norm1.linear.weight":
            "joint_blocks.2.x_block.adaLN_modulation.1.weight",
        "transformer_blocks.2.attn.to_q.weight": "joint_blocks.2.x_block.attn.qkv.weight",
        "transformer_blocks.2.attn.to_v.weight": "joint_blocks.2.x_block.attn.qkv.weight.2",
        "transformer_blocks.2.attn.add_k_proj.bias":
            "joint_blocks.2.context_block.attn.qkv.bias.1",
        "transformer_blocks.2.attn2.to_q.weight": "joint_blocks.2.x_block.attn2.qkv.weight",
        "transformer_blocks.2.attn.norm_q.weight": "joint_blocks.2.x_block.attn.ln_q.weight",
        "transformer_blocks.2.ff.net.0.proj.weight": "joint_blocks.2.x_block.mlp.fc1.weight",
        "transformer_blocks.2.attn.to_out.0.weight": "joint_blocks.2.x_block.attn.proj.weight",
        "transformer_blocks.2.attn.to_add_out.weight":
            "joint_blocks.2.context_block.attn.proj.weight",
        "proj_out.weight": "final_layer.linear.weight",
    }
    for src, want in cases.items():
        assert convert_diffusers_sd3_name(src) == want, src


def test_lumina2_krea2_names():
    assert (convert_diffusers_lumina2_name("all_x_embedder.2-1.weight")
            == "x_embedder.weight")
    assert (convert_diffusers_lumina2_name("layers.5.attention.to_k.weight")
            == "layers.5.attention.qkv.weight.1")
    assert (convert_diffusers_lumina2_name("noise_refiner.1.attention.norm_q.weight")
            == "noise_refiner.1.attention.q_norm.weight")
    assert (convert_diffusers_lumina2_name("layers.0.attention.to_out.0.bias")
            == "layers.0.attention.out.bias")

    assert convert_diffusers_krea2_name("img_in.weight") == "first.weight"
    assert convert_diffusers_krea2_name("time_embed.linear_1.weight") == "tmlp.0.weight"
    assert (convert_diffusers_krea2_name("transformer_blocks.4.attn.to_out.0.weight")
            == "blocks.4.attn.wo.weight")
    assert (convert_diffusers_krea2_name("transformer_blocks.4.ff.gate.weight")
            == "blocks.4.mlp.gate.weight")
    assert (convert_diffusers_krea2_name("final_layer.norm.weight")
            == "last.norm.scale")


def test_wan_vae_names():
    cases = {
        "quant_conv.weight": "conv1.weight",
        "post_quant_conv.bias": "conv2.bias",
        "encoder.conv_in.weight": "encoder.conv1.weight",
        "decoder.conv_out.bias": "decoder.head.2.bias",
        "decoder.mid_block.resnets.0.norm1.weight":
            "decoder.middle.0.residual.0.weight",
        "decoder.mid_block.attentions.0.to_q.weight": "decoder.middle.1.to_q.weight",
        "decoder.up_blocks.1.resnets.0.conv_shortcut.weight":
            "decoder.upsamples.4.shortcut.weight",
        "decoder.up_blocks.0.resnets.2.conv2.weight":
            "decoder.upsamples.2.residual.6.weight",
        "decoder.up_blocks.2.upsamplers.0.resample.1.weight":
            "decoder.upsamples.11.resample.1.weight",
        "encoder.down_blocks.3.conv_shortcut.weight":
            "encoder.downsamples.3.shortcut.weight",
        "encoder.down_blocks.7.norm2.weight": "encoder.downsamples.7.residual.3.weight",
    }
    for src, want in cases.items():
        assert convert_diffusers_wan_vae_name(src) == want, src


def test_pmid_and_ip_adapter_names():
    assert (convert_pmid_name("pmid.vision_model.visual_projection.weight")
            == "pmid.visual_projection.weight")
    assert (convert_pmid_name(
        "pmid.qformer_perceiver.perceiver_resampler.layers.2.1.3.weight")
        == "pmid.qformer_perceiver.perceiver_resampler.layers.2.1.1.fc2.weight")
    assert (convert_pmid_name("pmid.qformer_perceiver.token_proj.0.weight")
            == "pmid.qformer_perceiver.token_proj.fc1.weight")

    assert (convert_ip_adapter_name("image_proj.proj.weight")
            == "ip_adapter.image_proj.proj.weight")
    assert (convert_ip_adapter_name("ip_adapter.1.to_k_ip.weight")
            == "model.diffusion_model.input_blocks.1.1.transformer_blocks.0"
               ".attn2.to_k_ip.weight")
    assert (convert_ip_adapter_name("ip_adapter.31.to_v_ip.weight")
            == "model.diffusion_model.middle_block.1.transformer_blocks.0"
               ".attn2.to_v_ip.weight")
    assert (convert_ip_adapter_name("ip_adapter.1.to_k_ip.weight", sdxl=True)
            == "model.diffusion_model.input_blocks.4.1.transformer_blocks.0"
               ".attn2.to_k_ip.weight")


def test_merge_fused_markers_and_dispatch():
    rng = np.random.default_rng(0)
    q = rng.standard_normal((8, 16)).astype(np.float32)
    k = rng.standard_normal((8, 16)).astype(np.float32)
    v = rng.standard_normal((8, 16)).astype(np.float32)
    t = {
        "double_blocks.0.img_attn.qkv.weight": q,
        "double_blocks.0.img_attn.qkv.weight.1": k,
        "double_blocks.0.img_attn.qkv.weight.2": v,
    }
    out = _merge_fused_markers(t)
    assert list(out) == ["double_blocks.0.img_attn.qkv.weight"]
    np.testing.assert_array_equal(
        out["double_blocks.0.img_attn.qkv.weight"], np.concatenate([q, k, v], 0)
    )

    # end-to-end: diffusers flux dict → internal fused dict
    d = {
        "transformer_blocks.0.attn.to_q.weight": q,
        "transformer_blocks.0.attn.to_k.weight": k,
        "transformer_blocks.0.attn.to_v.weight": v,
        "single_transformer_blocks.0.proj_out.weight": q,
        "context_embedder.weight": q,
    }
    out = convert_diffusers_diffusion_names(d)
    assert "double_blocks.0.img_attn.qkv.weight" in out
    assert out["double_blocks.0.img_attn.qkv.weight"].shape == (24, 16)
    assert "single_blocks.0.linear2.weight" in out
    assert "txt_in.weight" in out

    # wan-vae detection: flat down_blocks.0..10 triggers, SD VAE does not
    wv = {"encoder.down_blocks.4.norm1.weight": q, "quant_conv.weight": q}
    assert "encoder.downsamples.4.residual.0.weight" in maybe_convert_diffusers_wan_vae(wv)
    sd = {"encoder.down_blocks.0.resnets.0.norm1.weight": q}
    assert maybe_convert_diffusers_wan_vae(sd) is sd


def test_hunyuan_video_names():
    from sdtpu.io.name_conversion import convert_hunyuan_video_name

    cases = {
        "time_in.mlp.0.weight": "time_in.in_layer.weight",
        "guidance_in.mlp.2.bias": "guidance_in.out_layer.bias",
        "txt_in.c_embedder.linear_1.weight": "txt_in.c_embedder.in_layer.weight",
        "txt_in.t_embedder.mlp.0.weight": "txt_in.t_embedder.in_layer.weight",
        "double_blocks.3.img_mod.linear.weight": "double_blocks.3.img_mod.lin.weight",
        "double_blocks.3.img_attn_qkv.weight": "double_blocks.3.img_attn.qkv.weight",
        "double_blocks.3.txt_attn_proj.bias": "double_blocks.3.txt_attn.proj.bias",
        "double_blocks.3.img_attn_q_norm.weight":
            "double_blocks.3.img_attn.norm.query_norm.scale",
        "double_blocks.3.img_mlp.fc1.weight": "double_blocks.3.img_mlp.0.weight",
        "double_blocks.3.txt_mlp.fc2.bias": "double_blocks.3.txt_mlp.2.bias",
        "single_blocks.1.modulation.linear.weight":
            "single_blocks.1.modulation.lin.weight",
    }
    for src, want in cases.items():
        assert convert_hunyuan_video_name(src) == want, src

    # dispatch detection
    from sdtpu.io.model_loader import convert_diffusers_diffusion_names

    d = {"double_blocks.0.img_attn_qkv.weight": np.zeros((4, 4), np.float32)}
    out = convert_diffusers_diffusion_names(d)
    assert "double_blocks.0.img_attn.qkv.weight" in out


def test_gguf_t5_and_llm_names():
    """llama.cpp GGUF TE exports → HF names (VERDICT r2 item 8; reference
    t5_name_map / llm_name_map, name_conversion.cpp:113-153)."""
    from sdtpu.io.name_conversion import convert_gguf_llm_name, convert_gguf_t5_name

    t5_cases = {
        "enc.blk.0.attn_q.weight": "encoder.block.0.layer.0.SelfAttention.q.weight",
        "enc.blk.3.ffn_gate.weight": "encoder.block.3.layer.1.DenseReluDense.wi_0.weight",
        "enc.blk.0.attn_rel_b.weight":
            "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight",
        "enc.blk.5.ffn_norm.weight": "encoder.block.5.layer.1.layer_norm.weight",
        "enc.output_norm.weight": "encoder.final_layer_norm.weight",
        "token_embd.weight": "shared.weight",
    }
    for src, want in t5_cases.items():
        assert convert_gguf_t5_name(src) == want, src

    llm_cases = {
        "token_embd.weight": "model.embed_tokens.weight",
        "blk.0.attn_q.weight": "model.layers.0.self_attn.q_proj.weight",
        "blk.12.attn_output.weight": "model.layers.12.self_attn.o_proj.weight",
        "blk.2.attn_q_norm.weight": "model.layers.2.self_attn.q_norm.weight",
        "blk.4.ffn_gate_exps.weight": "model.layers.4.mlp.experts.gate_proj.weight",
        "blk.4.ffn_gate_inp.weight": "model.layers.4.mlp.router.weight",
        "blk.7.ffn_down.weight": "model.layers.7.mlp.down_proj.weight",
        "blk.1.attn_norm.weight": "model.layers.1.input_layernorm.weight",
        "blk.1.ffn_norm.weight": "model.layers.1.post_attention_layernorm.weight",
        "blk.3.attn_sinks.weight": "model.layers.3.self_attn.sinks",
        "output_norm.weight": "model.norm.weight",
    }
    for src, want in llm_cases.items():
        assert convert_gguf_llm_name(src) == want, src


def test_qwen_vl_vision_gguf_names():
    """mmproj vision-tower GGUF names → HF visual.* (reference
    llm_vision_name_map :155 + convert_qwen3_vl_vision_name :187)."""
    from sdtpu.io.name_conversion import (
        convert_qwen25_vl_vision_name,
        convert_qwen3_vl_vision_name,
    )

    q25 = {
        "mm.0.weight": "merger.mlp.0.weight",
        "v.post_ln.weight": "merger.ln_q.weight",
        "v.patch_embd.weight": "patch_embed.proj.0.weight",
        "v.patch_embd.weight.1": "patch_embed.proj.1.weight",
        "v.blk.0.attn_q.weight": "blocks.0.attn.q_proj.weight",
        "v.blk.2.ffn_up.weight": "blocks.2.mlp.up_proj.weight",
        "v.blk.2.ln1.weight": "blocks.2.norm1.weight",
    }
    for src, want in q25.items():
        assert convert_qwen25_vl_vision_name(src) == want, src

    q3 = {
        "mm.0.weight": "merger.linear_fc1.weight",
        "mm.2.bias": "merger.linear_fc2.bias",
        "v.post_ln.weight": "merger.norm.weight",
        "v.position_embd.weight": "pos_embed.weight",
        "v.patch_embd.weight": "patch_embed.proj.0.weight",
        "v.patch_embd.weight.1": "patch_embed.proj.1.weight",
        "v.patch_embd.bias": "patch_embed.bias",
        "v.blk.0.attn_qkv.weight": "blocks.0.attn.qkv.weight",
        "v.blk.5.ffn_up.weight": "blocks.5.mlp.linear_fc1.weight",
        "v.blk.5.ffn_down.bias": "blocks.5.mlp.linear_fc2.bias",
    }
    for src, want in q3.items():
        assert convert_qwen3_vl_vision_name(src) == want, src


def test_sdxl_controlnet_diffusers_names():
    """diffusers-SDXL ControlNet → original layout (reference
    convert_diffusers_controlnet_to_original_sdxl, name_conversion.cpp:815)."""
    from sdtpu.io.name_conversion import convert_diffusers_controlnet_name

    cases = {
        # controlnet-only pieces (identical to SD1.5)
        "controlnet_cond_embedding.conv_in.weight": "input_hint_block.0.weight",
        "controlnet_cond_embedding.blocks.3.weight": "input_hint_block.8.weight",
        "controlnet_cond_embedding.conv_out.weight": "input_hint_block.14.weight",
        "controlnet_down_blocks.4.bias": "zero_convs.4.0.bias",
        "controlnet_mid_block.weight": "middle_block_out.0.weight",
        # SDXL encoder copy: add_embedding + 3-level down blocks
        "add_embedding.linear_1.weight": "label_emb.0.0.weight",
        "add_embedding.linear_2.bias": "label_emb.0.2.bias",
        "time_embedding.linear_1.weight": "time_embed.0.weight",
        "conv_in.weight": "input_blocks.0.0.weight",
        "down_blocks.1.resnets.0.norm1.weight":
            "input_blocks.4.0.in_layers.0.weight",
        "down_blocks.1.attentions.1.transformer_blocks.1.attn1.to_q.weight":
            "input_blocks.5.1.transformer_blocks.1.attn1.to_q.weight",
        "down_blocks.2.resnets.1.time_emb_proj.weight":
            "input_blocks.8.0.emb_layers.1.weight",
        "down_blocks.0.downsamplers.0.conv.weight":
            "input_blocks.3.0.op.weight",
        "mid_block.resnets.1.conv2.weight":
            "middle_block.2.out_layers.3.weight",
        "mid_block.attentions.0.proj_in.weight": "middle_block.1.proj_in.weight",
    }
    for src, want in cases.items():
        assert convert_diffusers_controlnet_name(src) == want, src


def test_anima_net_prefix_and_loader_dispatch():
    """Anima keeps the net. nesting; checkpoints without it gain the prefix
    (reference convert_other_dit_to_original_anima, name_conversion.cpp:771)."""
    from sdtpu.io.name_conversion import convert_anima_dit_name

    assert convert_anima_dit_name("blocks.0.self_attn.q_proj.weight") == \
        "net.blocks.0.self_attn.q_proj.weight"
    assert convert_anima_dit_name("net.x_embedder.proj.1.weight") == \
        "net.x_embedder.proj.1.weight"

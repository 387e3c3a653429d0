"""Tensor-name canonicalization: diffusers / open_clip / HF names → internal
(original SD checkpoint) names.

Reference analog: src/name_conversion.cpp (dispatch convert_tensor_name
:1327).  The internal canonical scheme is the original CompVis layout used by
sdtpu.models.* param dicts:
  model.diffusion_model.{input_blocks,middle_block,output_blocks,...}
  first_stage_model.{encoder,decoder,quant_conv,post_quant_conv}
  cond_stage_model.transformer.text_model.…  (HF CLIPText naming)
"""
from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

# --------------------------------------------------------------- UNet (SD1/2/XL)

_RES_INNER = {
    "norm1": "in_layers.0",
    "conv1": "in_layers.2",
    "time_emb_proj": "emb_layers.1",
    "norm2": "out_layers.0",
    "conv2": "out_layers.3",
    "conv_shortcut": "skip_connection",
}


def convert_diffusers_unet_name(name: str, num_res_blocks: int = 2, num_levels: int = 4) -> Optional[str]:
    """diffusers UNet2DConditionModel names → CompVis input/middle/output_blocks."""
    per_level = num_res_blocks + 1

    m = re.match(r"time_embedding\.linear_(\d)\.(.*)", name)
    if m:
        return f"time_embed.{0 if m.group(1) == '1' else 2}.{m.group(2)}"
    m = re.match(r"add_embedding\.linear_(\d)\.(.*)", name)
    if m:
        return f"label_emb.0.{0 if m.group(1) == '1' else 2}.{m.group(2)}"
    if name.startswith("conv_in."):
        return "input_blocks.0.0." + name[len("conv_in.") :]
    if name.startswith("conv_norm_out."):
        return "out.0." + name[len("conv_norm_out.") :]
    if name.startswith("conv_out."):
        return "out.2." + name[len("conv_out.") :]

    m = re.match(r"down_blocks\.(\d+)\.resnets\.(\d+)\.(.*)", name)
    if m:
        i, j, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        idx = 1 + i * per_level + j
        return f"input_blocks.{idx}.0.{_convert_res_inner(rest)}"
    m = re.match(r"down_blocks\.(\d+)\.attentions\.(\d+)\.(.*)", name)
    if m:
        i, j, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        idx = 1 + i * per_level + j
        return f"input_blocks.{idx}.1.{rest}"
    m = re.match(r"down_blocks\.(\d+)\.downsamplers\.0\.conv\.(.*)", name)
    if m:
        i, rest = int(m.group(1)), m.group(2)
        idx = 1 + (i + 1) * per_level - 1
        return f"input_blocks.{idx}.0.op.{rest}"

    m = re.match(r"mid_block\.resnets\.(\d)\.(.*)", name)
    if m:
        which = 0 if m.group(1) == "0" else 2
        return f"middle_block.{which}.{_convert_res_inner(m.group(2))}"
    m = re.match(r"mid_block\.attentions\.0\.(.*)", name)
    if m:
        return f"middle_block.1.{m.group(1)}"

    m = re.match(r"up_blocks\.(\d+)\.resnets\.(\d+)\.(.*)", name)
    if m:
        i, j, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        idx = i * (num_res_blocks + 1) + j
        return f"output_blocks.{idx}.0.{_convert_res_inner(rest)}"
    m = re.match(r"up_blocks\.(\d+)\.attentions\.(\d+)\.(.*)", name)
    if m:
        i, j, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        idx = i * (num_res_blocks + 1) + j
        return f"output_blocks.{idx}.1.{rest}"
    m = re.match(r"up_blocks\.(\d+)\.upsamplers\.0\.conv\.(.*)", name)
    if m:
        i, rest = int(m.group(1)), m.group(2)
        idx = i * (num_res_blocks + 1) + num_res_blocks
        # upsample is the last sub-layer: .2 when the block has attention, .1 otherwise
        return f"output_blocks.{idx}.__up__.conv.{rest}"
    return None


def _convert_res_inner(rest: str) -> str:
    for k, v in _RES_INNER.items():
        if rest.startswith(k + "."):
            return v + rest[len(k) :]
    return rest


# --------------------------------------------------------------- ControlNet

def convert_diffusers_controlnet_name(name: str) -> Optional[str]:
    """diffusers ControlNetModel names → CompVis control_model names
    (reference name_conversion.cpp controlnet section).

    The encoder copy reuses the UNet mapping; the extra pieces are the hint
    stem (controlnet_cond_embedding → input_hint_block, even indices 0..14)
    and the zero convs (controlnet_down_blocks.N → zero_convs.N.0,
    controlnet_mid_block → middle_block_out.0)."""
    if name.startswith("controlnet_cond_embedding.conv_in."):
        return "input_hint_block.0." + name.split(".", 2)[2]
    m = re.match(r"controlnet_cond_embedding\.blocks\.(\d+)\.(.*)", name)
    if m:
        return f"input_hint_block.{2 + 2 * int(m.group(1))}.{m.group(2)}"
    if name.startswith("controlnet_cond_embedding.conv_out."):
        return "input_hint_block.14." + name.split(".", 2)[2]
    m = re.match(r"controlnet_down_blocks\.(\d+)\.(.*)", name)
    if m:
        return f"zero_convs.{m.group(1)}.0.{m.group(2)}"
    if name.startswith("controlnet_mid_block."):
        return "middle_block_out.0." + name.split(".", 1)[1]
    return convert_diffusers_unet_name(name)


# --------------------------------------------------------------------- VAE

def convert_diffusers_vae_name(name: str, num_levels: int = 4) -> Optional[str]:
    vae_res = {
        "norm1": "norm1", "conv1": "conv1", "norm2": "norm2", "conv2": "conv2",
        "conv_shortcut": "nin_shortcut",
    }

    def res_inner(rest):
        for k, v in vae_res.items():
            if rest.startswith(k + "."):
                return v + rest[len(k) :]
        return rest

    attn_map = {
        "group_norm": "norm", "to_q": "q", "to_k": "k", "to_v": "v", "to_out.0": "proj_out",
        # older diffusers naming
        "query": "q", "key": "k", "value": "v", "proj_attn": "proj_out",
    }

    def attn_inner(rest):
        for k, v in sorted(attn_map.items(), key=lambda kv: -len(kv[0])):
            if rest.startswith(k + "."):
                return v + rest[len(k) :]
        return rest

    for enc in ("encoder", "decoder"):
        if not name.startswith(enc + "."):
            continue
        sub = name[len(enc) + 1 :]
        if sub.startswith("conv_in.") or sub.startswith("conv_out."):
            return f"{enc}.{sub}"
        if sub.startswith("conv_norm_out."):
            return f"{enc}.norm_out.{sub[len('conv_norm_out.'):]}"
        m = re.match(r"mid_block\.resnets\.(\d)\.(.*)", sub)
        if m:
            return f"{enc}.mid.block_{int(m.group(1)) + 1}.{res_inner(m.group(2))}"
        m = re.match(r"mid_block\.attentions\.0\.(.*)", sub)
        if m:
            return f"{enc}.mid.attn_1.{attn_inner(m.group(1))}"
        m = re.match(r"down_blocks\.(\d+)\.resnets\.(\d+)\.(.*)", sub)
        if m:
            return f"encoder.down.{m.group(1)}.block.{m.group(2)}.{res_inner(m.group(3))}"
        m = re.match(r"down_blocks\.(\d+)\.downsamplers\.0\.conv\.(.*)", sub)
        if m:
            return f"encoder.down.{m.group(1)}.downsample.conv.{m.group(2)}"
        m = re.match(r"up_blocks\.(\d+)\.resnets\.(\d+)\.(.*)", sub)
        if m:
            i = num_levels - 1 - int(m.group(1))
            return f"decoder.up.{i}.block.{m.group(2)}.{res_inner(m.group(3))}"
        m = re.match(r"up_blocks\.(\d+)\.upsamplers\.0\.conv\.(.*)", sub)
        if m:
            i = num_levels - 1 - int(m.group(1))
            return f"decoder.up.{i}.upsample.conv.{m.group(2)}"
        return None
    if name.startswith("quant_conv.") or name.startswith("post_quant_conv."):
        return name
    return None


# --------------------------------------------------------- open_clip text towers

def convert_open_clip_name(name: str) -> Optional[str]:
    """open_clip text tower (SD2 cond_stage_model.model.*, SDXL embedders.1.model.*)
    → HF CLIPText naming. in_proj qkv splitting is handled by the loader
    (returns a '__inproj__' marker)."""
    if name.startswith("transformer."):
        name = name[len("transformer.") :]
    if name == "token_embedding.weight":
        return "text_model.embeddings.token_embedding.weight"
    if name == "positional_embedding":
        return "text_model.embeddings.position_embedding.weight"
    if name.startswith("ln_final."):
        return "text_model.final_layer_norm." + name[len("ln_final.") :]
    if name == "text_projection":
        return "text_projection.weight"  # loader transposes
    m = re.match(r"resblocks\.(\d+)\.(.*)", name)
    if m:
        i, rest = m.group(1), m.group(2)
        pre = f"text_model.encoder.layers.{i}"
        table = {
            "ln_1.weight": f"{pre}.layer_norm1.weight",
            "ln_1.bias": f"{pre}.layer_norm1.bias",
            "ln_2.weight": f"{pre}.layer_norm2.weight",
            "ln_2.bias": f"{pre}.layer_norm2.bias",
            "mlp.c_fc.weight": f"{pre}.mlp.fc1.weight",
            "mlp.c_fc.bias": f"{pre}.mlp.fc1.bias",
            "mlp.c_proj.weight": f"{pre}.mlp.fc2.weight",
            "mlp.c_proj.bias": f"{pre}.mlp.fc2.bias",
            "attn.out_proj.weight": f"{pre}.self_attn.out_proj.weight",
            "attn.out_proj.bias": f"{pre}.self_attn.out_proj.bias",
            "attn.in_proj_weight": f"{pre}.self_attn.__inproj__.weight",
            "attn.in_proj_bias": f"{pre}.self_attn.__inproj__.bias",
        }
        return table.get(rest)
    return None


# --------------------------------------------------------------------- dispatch

def canonicalize_name(name: str) -> str:
    """Best-effort canonicalization of a full checkpoint key. Names already in
    the internal scheme pass through unchanged."""
    # strip known wrapper prefixes
    for prefix, module in (
        ("model.diffusion_model.", "model.diffusion_model."),
        ("first_stage_model.", "first_stage_model."),
        ("cond_stage_model.transformer.", "cond_stage_model.transformer."),
        ("cond_stage_model.model.", "cond_stage_model.model."),
        ("conditioner.embedders.0.transformer.", "conditioner.embedders.0.transformer."),
        ("conditioner.embedders.1.model.", "conditioner.embedders.1.model."),
    ):
        if name.startswith(prefix):
            return name
    # diffusers module-local names (from a diffusers folder checkpoint)
    cv = convert_diffusers_unet_name(name)
    if cv is not None:
        return "model.diffusion_model." + cv
    cv = convert_diffusers_vae_name(name)
    if cv is not None:
        return "first_stage_model." + cv
    return name

"""SDVersion detection from tensor-name/shape fingerprints.

Reference analog: ModelLoader::get_sd_version (src/model_loader.cpp:450-660)
— e.g. SDXL via the second text encoder, inpaint via input-conv channels,
DiT families via their block names.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

from sdtpu.config import SDVersion


def detect_version(
    names, shapes: Optional[Dict[str, Tuple[int, ...]]] = None
) -> SDVersion:
    names = set(names)
    shapes = shapes or {}

    def has_prefix(p):
        return any(n.startswith(p) for n in names)

    # DiT families first (unique block names)
    if any("adaln_single.emb.timestep_embedder.linear_1" in n for n in names):
        # LTX-2 audio-video DiT (reference model_loader.cpp:537)
        return SDVersion.LTXAV
    if any("cap_embedder.0.weight" in n for n in names):
        # Z-Image / Lumina-2 style (reference model_loader.cpp:528)
        return SDVersion.Z_IMAGE
    if any(n.endswith("patch_embedder.weight") for n in names):
        # LingBot-Video (reference model_loader.cpp:543)
        return SDVersion.LINGBOT_VIDEO
    if any("lq_proj.latent_proj.0.weight" in n for n in names):
        # PiD super-resolution (reference model_loader.cpp:473)
        return SDVersion.PID
    if any("embed_image_indicator.weight" in n for n in names):
        # Ideogram4 (reference model_loader.cpp:476)
        return SDVersion.IDEOGRAM4
    if any("txtfusion.projector.weight" in n or "text_fusion.projector.weight" in n
           for n in names):
        # Krea2 (reference model_loader.cpp:479)
        return SDVersion.KREA2
    if any("transformer_blocks.0.attn.norm_added_q.weight" in n for n in names) and any(
        "transformer_blocks.0.img_mlp.w1.weight" in n for n in names
    ):
        # Lens (reference model_loader.cpp:493)
        return SDVersion.LENS
    if any("net.img_embedder.proj1.weight" in n for n in names):
        # MiniT2I (reference model_loader.cpp:497)
        return SDVersion.MINIT2I
    if any("double_stream_layers.0.img_instruct_attn" in n for n in names):
        # Boogu (reference model_loader.cpp:531)
        return SDVersion.BOOGU_IMAGE
    if any("layers.0.adaLN_sa_ln.weight" in n for n in names):
        # ERNIE-Image (reference model_loader.cpp:534)
        return SDVersion.ERNIE_IMAGE
    if any("llm_adapter.blocks.0.cross_attn.q_proj.weight" in n for n in names):
        # Anima (reference model_loader.cpp:513)
        return SDVersion.ANIMA
    if any("transformer_blocks.0.img_mod.1.weight" in n for n in names):
        # Qwen-Image family (reference model_loader.cpp:500-509)
        img_in = next((n for n in names if n.endswith("img_in.weight")), None)
        if img_in is not None and shapes.get(img_in, (0, 0))[-1] == 128:
            return SDVersion.MAGE_FLOW
        if any("addition_t_embedding" in n for n in names):
            return SDVersion.QWEN_IMAGE_LAYERED
        return SDVersion.QWEN_IMAGE
    if any(n.endswith("x_embedder.proj1.weight") for n in names) and any(
            "language_model.layers.0.self_attn.q_proj.weight" in n for n in names):
        # HiDream-O1 unified LLM-DiT (reference model_loader.cpp:489)
        return SDVersion.HIDREAM_O1
    if has_prefix("model.diffusion_model.joint_blocks") or has_prefix("joint_blocks"):
        return SDVersion.SD3
    if has_prefix("model.diffusion_model.double_blocks") or has_prefix("double_blocks"):
        if any("nerf_final_layer_conv." in n for n in names):
            # pixel-space NeRF head (model_loader.cpp:483)
            return SDVersion.CHROMA_RADIANCE
        if any("distilled_guidance_layer" in n for n in names):
            return SDVersion.CHROMA
        if any("dual_time_embed.semantic_embedder" in n for n in names):
            # SeFi-Image dual timestep embedder (model_loader.cpp:519)
            return SDVersion.SEFI
        if any("double_blocks.0.img_mlp.gate_proj.weight" in n for n in names):
            # Ovis-Image yak MLP (model_loader.cpp:525)
            return SDVersion.OVIS
        if any("double_stream_modulation_img" in n for n in names):
            # klein is the shallow distillation: no single_blocks.47
            # (reference model_loader.cpp:649-654)
            if any("single_blocks.47." in n for n in names):
                return SDVersion.FLUX2
            return SDVersion.FLUX2_KLEIN
        if any("txt_in.individual_token_refiner" in n for n in names):
            return SDVersion.HUNYUAN_VIDEO
        # LongCat: Qwen2.5-VL context width on txt_in (model_loader.cpp:633)
        for n in names:
            if n.endswith("txt_in.weight") and shapes.get(n, (0, 0))[-1] == 3584:
                return SDVersion.LONGCAT
        # FLUX.1 input width distinguishes the concat variants
        # (reference model_loader.cpp:636-645): 384 Fill, 128 Canny/Depth
        # "Controls", 196 Flex.2, 64 base
        for n in names:
            if n.endswith("img_in.weight"):
                in_w = shapes.get(n, (0, 0))[-1]
                if in_w == 384:
                    return SDVersion.FLUX_FILL
                if in_w == 128:
                    return SDVersion.FLUX_CONTROLS
                if in_w == 196:
                    return SDVersion.FLEX_2
                break
        return SDVersion.FLUX
    if any(".vace_blocks." in n for n in names):
        return SDVersion.WAN2
    if has_prefix("model.diffusion_model.blocks.0.cross_attn") or any(
        "patch_embedding.weight" in n for n in names
    ):
        patch = next((n for n in names if "patch_embedding.weight" in n), None)
        if patch is not None:
            sh = shapes.get(patch)
            if sh is not None and len(sh) == 5:
                in_ch = sh[1]
                if in_ch == 48:
                    return SDVersion.WAN2_2_TI2V
                if in_ch == 36:
                    return SDVersion.WAN2_2_I2V
                return SDVersion.WAN2
            return SDVersion.WAN2
    if any("txt_in.individual_token_refiner" in n for n in names):
        return SDVersion.HUNYUAN_VIDEO

    # UNet families
    unet_key = None
    for cand in ("model.diffusion_model.input_blocks.0.0.weight", "input_blocks.0.0.weight"):
        if cand in names:
            unet_key = cand
            break
    if unet_key is None:
        return SDVersion.UNKNOWN

    if any("time_mixer.mix_factor" in n and "block" in n for n in names):
        # SVD spatial-video UNet (reference fingerprint
        # input_blocks.8.0.time_mixer.mix_factor, model_loader.cpp:567)
        return SDVersion.SVD

    in_channels = shapes.get(unet_key, (0, 4, 3, 3))[1]
    is_sdxl = (
        has_prefix("conditioner.embedders.1")
        or "model.diffusion_model.label_emb.0.0.weight" in names
        or any(n.startswith("add_embedding") for n in names)
    )
    if is_sdxl:
        if in_channels == 9:
            return SDVersion.SDXL_INPAINT
        if in_channels == 8:
            return SDVersion.SDXL_PIX2PIX
        # SSD-1B prunes the middle block's transformer depth
        if "model.diffusion_model.middle_block.1.transformer_blocks.9.attn1.to_q.weight" not in names and \
           "model.diffusion_model.middle_block.1.transformer_blocks.0.attn1.to_q.weight" not in names:
            return SDVersion.SDXL_SSD1B
        return SDVersion.SDXL

    # SD2 vs SD1: cross-attention context dim (1024 vs 768) or open_clip tower
    ctx_key = None
    for cand in (
        "model.diffusion_model.input_blocks.4.1.transformer_blocks.0.attn2.to_k.weight",
        "model.diffusion_model.input_blocks.1.1.transformer_blocks.0.attn2.to_k.weight",
    ):
        if cand in names:
            ctx_key = cand
            break
    ctx_dim = shapes.get(ctx_key, (0, 768))[1] if ctx_key else None
    is_sd2 = ctx_dim == 1024 or has_prefix("cond_stage_model.model.")
    # tiny UNets drop the whole middle block (reference
    # model_loader.cpp:663-675: no middle_block.1 → tiny; SD1 side splits on
    # output_blocks.7.1 presence, SD2 side on a 1024-wide attn there)
    no_middle = not any(
        n.startswith(("model.diffusion_model.middle_block.1.", "middle_block.1."))
        for n in names
    ) and any(
        n.startswith(("model.diffusion_model.output_blocks.", "output_blocks."))
        for n in names
    )
    has_ob71 = any(
        n.startswith(("model.diffusion_model.output_blocks.7.1",
                      "output_blocks.7.1"))
        for n in names
    )
    if is_sd2:
        if in_channels == 9:
            return SDVersion.SD2_INPAINT
        if no_middle:
            attn_k = None
            for cand in ("model.diffusion_model.output_blocks.7.1."
                         "transformer_blocks.0.attn1.to_k.weight",
                         "output_blocks.7.1.transformer_blocks.0.attn1"
                         ".to_k.weight"):
                if cand in names:
                    attn_k = shapes.get(cand, (0, 0))[-1]
            return (SDVersion.SDXS_09 if attn_k == 1024
                    else SDVersion.SD2_TINY_UNET)
        return SDVersion.SD2
    if in_channels == 9:
        return SDVersion.SD1_INPAINT
    if in_channels == 8:
        return SDVersion.SD1_PIX2PIX
    if no_middle:
        return SDVersion.SD1_TINY_UNET if has_ob71 else SDVersion.SDXS_512_DS
    return SDVersion.SD1

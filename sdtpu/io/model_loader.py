"""Checkpoint aggregation → per-module param dicts.

Reference analog: ModelLoader (src/model_loader.h:32) + ModelManager staging:
parse N weight files, canonicalize names, fingerprint the SDVersion, split
into module param dicts (diffusion / clip_l / clip_g / vae) keyed by the
module-local names that sdtpu.models.* consume.
"""
from __future__ import annotations

import dataclasses
import os
import re
from typing import Dict, Optional

import numpy as np

from sdtpu.config import SDVersion
from sdtpu.io.detect import detect_version
from sdtpu.io.gguf import GGUFFile
from sdtpu.io.name_conversion import (
    canonicalize_name,
    convert_open_clip_name,
)
from sdtpu.io.safetensors import SafetensorsFile
from sdtpu.utils import log_info, log_warn


@dataclasses.dataclass
class ModelBundle:
    version: SDVersion
    diffusion: Dict[str, np.ndarray]
    clip_l: Dict[str, np.ndarray]
    clip_g: Dict[str, np.ndarray]
    t5: Dict[str, np.ndarray]
    vae: Dict[str, np.ndarray]
    extra: Dict[str, np.ndarray]
    tensor_types: Dict[str, str]
    llm: Dict[str, np.ndarray] = dataclasses.field(default_factory=dict)
    audio_vae: Dict[str, np.ndarray] = dataclasses.field(default_factory=dict)
    text_projection: Dict[str, np.ndarray] = dataclasses.field(default_factory=dict)


def read_checkpoint_file(path: str, keep_quant: bool = False) -> Dict[str, np.ndarray]:
    """Read any supported format into {name: np.ndarray} (f32/typed).

    keep_quant: quantized GGUF tensors come back as io.gguf.HostQuant —
    the checkpoint's own blocks, no f32 round-trip (reference keeps ggml
    types end-to-end, src/model_io/tensor_storage.h:16)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".safetensors" or path.endswith(".index.json"):
        from sdtpu.io.safetensors import load_safetensors

        return load_safetensors(path)
    if ext == ".gguf":
        from sdtpu.io.gguf import load_gguf

        return load_gguf(path, keep_quant=keep_quant)
    if ext in (".ckpt", ".pt", ".pth", ".bin"):
        from sdtpu.io.torch_ckpt import load_torch_checkpoint

        return load_torch_checkpoint(path)
    raise ValueError(f"unsupported checkpoint format: {path}")


def _merge_fused_markers(tensors: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Concatenate '<name>.weight.N' merge markers (diffusers split q/k/v →
    internal fused qkv / linear1; reference name_conversion.cpp:540-666)."""
    marker = re.compile(r"^(.*\.(?:weight|bias))\.([123])$")
    groups: Dict[str, Dict[int, np.ndarray]] = {}
    for k in list(tensors):
        m = marker.match(k)
        if m:
            groups.setdefault(m.group(1), {})[int(m.group(2))] = tensors.pop(k)
    for base, parts in groups.items():
        if base in tensors:
            arrs = [np.asarray(tensors.pop(base))]
            arrs += [np.asarray(parts[i]) for i in sorted(parts)]
            tensors[base] = np.concatenate(arrs, axis=0)
        else:  # incomplete set — put the pieces back untouched
            for i, v in parts.items():
                tensors[f"{base}.{i}"] = v
    return tensors


def convert_diffusers_diffusion_names(
    tensors: Dict[str, np.ndarray]
) -> Dict[str, np.ndarray]:
    """Detect + convert a diffusers-format DiT param dict (flux/SD3/lumina2/
    krea2) to internal names (reference convert_diffusion_model_name,
    name_conversion.cpp:867-886)."""
    from sdtpu.io.name_conversion import (
        convert_diffusers_flux_name,
        convert_diffusers_krea2_name,
        convert_diffusers_lumina2_name,
        convert_diffusers_sd3_name,
        convert_hunyuan_video_name,
    )

    def has_prefix(p):
        return any(k.startswith(p) for k in tensors)

    conv = None
    if any("img_attn_qkv" in k or "img_mod.linear." in k for k in tensors):
        conv = convert_hunyuan_video_name
    elif has_prefix("single_transformer_blocks."):
        conv = convert_diffusers_flux_name
    elif has_prefix("pos_embed.proj."):
        conv = convert_diffusers_sd3_name
    elif has_prefix("transformer_blocks.") and has_prefix("context_embedder."):
        conv = convert_diffusers_flux_name
    elif has_prefix("all_x_embedder.2-1.") or has_prefix("noise_refiner."):
        conv = convert_diffusers_lumina2_name
    elif has_prefix("time_mod_proj.") or has_prefix("text_fusion."):
        conv = convert_diffusers_krea2_name
    if conv is None:
        return tensors
    out: Dict[str, np.ndarray] = {}
    for k, v in tensors.items():
        nk = conv(k)
        out[nk if nk is not None else k] = v
    return _merge_fused_markers(out)


def maybe_convert_diffusers_wan_vae(
    tensors: Dict[str, np.ndarray]
) -> Dict[str, np.ndarray]:
    """diffusers AutoencoderKLWan layout (flat down_blocks.0..10) → internal
    Wan VAE names (reference convert_diffusers_to_original_wan_vae)."""
    if any(k.startswith("encoder.down_blocks.4.") for k in tensors) and not any(
        ".resnets." in k and k.startswith("encoder.") for k in tensors
    ):
        from sdtpu.io.name_conversion import convert_diffusers_wan_vae_name

        return {convert_diffusers_wan_vae_name(k): v for k, v in tensors.items()}
    return tensors


def _split_in_proj(params: Dict[str, np.ndarray]):
    """open_clip fused qkv → separate q/k/v projections."""
    for name in [n for n in params if "__inproj__" in n]:
        arr = params.pop(name)
        c = arr.shape[0] // 3
        for i, which in enumerate(("q_proj", "k_proj", "v_proj")):
            params[name.replace("__inproj__", which)] = arr[i * c : (i + 1) * c]


def split_modules(tensors: Dict[str, np.ndarray]) -> ModelBundle:
    """Canonicalize + fingerprint + split into module-local param dicts."""
    canon = {canonicalize_name(k): v for k, v in tensors.items()}
    shapes = {k: tuple(v.shape) for k, v in canon.items()}
    version = detect_version(canon.keys(), shapes)

    diffusion: Dict[str, np.ndarray] = {}
    clip_l: Dict[str, np.ndarray] = {}
    clip_g: Dict[str, np.ndarray] = {}
    t5: Dict[str, np.ndarray] = {}
    vae: Dict[str, np.ndarray] = {}
    extra: Dict[str, np.ndarray] = {}
    llm: Dict[str, np.ndarray] = {}
    audio_vae: Dict[str, np.ndarray] = {}
    text_projection: Dict[str, np.ndarray] = {}

    # HiDream-O1 stores the whole LLM-DiT at top-level "model." with the
    # vision tower under "model.visual." (reference HiDreamO1Runner prefix
    # "model", hidream_o1.hpp:347)
    hidream = version == SDVersion.HIDREAM_O1
    _gguf_vision_is_q3 = None  # lazily decided from the full name set

    for name, arr in canon.items():
        if hidream and name.startswith("model.") and not name.startswith(
                "model.diffusion_model."):
            local = name[len("model.") :]
            if local.startswith("visual."):
                llm[local] = arr  # Qwen3-VL vision tower (edit conditioner)
            else:
                diffusion[local] = arr
            continue
        if name.startswith("model.diffusion_model."):
            local = name[len("model.diffusion_model.") :]
            if version == SDVersion.ANIMA:
                # Anima keeps the "net." nesting; add it when a checkpoint
                # omits it (reference convert_other_dit_to_original_anima,
                # name_conversion.cpp:771)
                if not local.startswith("net."):
                    local = "net." + local
            elif local.startswith("net."):
                # PiD nests the PixelDiT under "net." (reference PiDRunner
                # prefix "model.diffusion_model.net", stable-diffusion.cpp:1004)
                local = local[len("net.") :]
            diffusion[local] = arr
        elif name.startswith("first_stage_model."):
            vae[name[len("first_stage_model.") :]] = arr
        elif name.startswith("cond_stage_model.transformer."):
            clip_l[name[len("cond_stage_model.transformer.") :]] = arr
        elif name.startswith("cond_stage_model.model."):
            cv = convert_open_clip_name(name[len("cond_stage_model.model.") :])
            if cv is not None:
                clip_l[cv] = arr
        elif name.startswith("conditioner.embedders.0.transformer."):
            clip_l[name[len("conditioner.embedders.0.transformer.") :]] = arr
        elif name.startswith("conditioner.embedders.1.model."):
            cv = convert_open_clip_name(name[len("conditioner.embedders.1.model.") :])
            if cv is not None:
                clip_g[cv] = arr
        elif name.startswith("text_encoders.t5xxl.transformer."):
            local = name[len("text_encoders.t5xxl.transformer.") :]
            if local.startswith(("enc.", "dec.", "token_embd.", "output_norm.")):
                # llama.cpp GGUF T5 export (reference t5_name_map,
                # name_conversion.cpp:113-128)
                from sdtpu.io.name_conversion import convert_gguf_t5_name

                local = convert_gguf_t5_name(local)
            t5[local] = arr
        elif name.startswith("text_encoders.clip_l.transformer."):
            clip_l[name[len("text_encoders.clip_l.transformer.") :]] = arr
        elif name.startswith("text_encoders.clip_g.transformer."):
            clip_g[name[len("text_encoders.clip_g.transformer.") :]] = arr
        elif name.startswith("text_encoders.llm."):
            local = name[len("text_encoders.llm.") :]
            if local.startswith("model.visual."):
                # HF checkpoints nest the vision tower under model.visual
                # (reference name_conversion.cpp:1461-1463)
                local = "visual." + local[len("model.visual.") :]
            elif local.startswith(("blk.", "token_embd.", "output_norm.",
                                   "v.", "mm.", "attn_sinks.")):
                # llama.cpp GGUF LLM / mmproj export (reference llm_name_map
                # + vision maps, name_conversion.cpp:130-207); qwen3-vl
                # mmprojs carry fused attn_qkv, qwen2.5-vl separate q/k/v
                from sdtpu.io.name_conversion import (
                    convert_gguf_llm_name,
                    convert_gguf_te_name,
                )

                if local.startswith(("v.", "mm.")):
                    if _gguf_vision_is_q3 is None:
                        _gguf_vision_is_q3 = any(
                            "attn_qkv." in n or "position_embd" in n
                            for n in canon
                            if ".llm.v." in n or ".llm.mm." in n
                        )
                    local = convert_gguf_te_name(
                        local, qwen3_vision=_gguf_vision_is_q3)
                else:
                    local = convert_gguf_llm_name(local)
            llm[local] = arr
        elif name.startswith(("audio_vae.", "vocoder.")):
            # LTX audio VAE keeps its full names (reference prefix "",
            # ltx_audio_vae.hpp LTXAudioVAE param naming)
            audio_vae[name] = arr
        elif name.startswith("text_embedding_projection."):
            text_projection[name[len("text_embedding_projection.") :]] = arr
        else:
            extra[name] = arr

    for tower in (clip_l, clip_g):
        _split_in_proj(tower)
        # open_clip text_projection is [width, proj] applied as x @ W;
        # HF linear expects [proj, width]
        tp = tower.get("text_projection.weight")
        if tp is not None and tp.shape[0] != tp.shape[1]:
            pass  # square for CLIP towers; transpose handled below for SD2/XL
    # open_clip-sourced projections need a transpose (x@W vs W@x)
    for tower_name, tower in (("clip_g", clip_g),):
        tp = tower.get("text_projection.weight")
        if tp is not None:
            tower["text_projection.weight"] = np.ascontiguousarray(tp.T)

    # diffusers upsampler marker: resolve .__up__. to the correct sub-index
    _resolve_upsample_markers(diffusion)

    tensor_types = {}
    return ModelBundle(
        version=version,
        diffusion=diffusion,
        clip_l=clip_l,
        clip_g=clip_g,
        t5=t5,
        vae=vae,
        extra=extra,
        tensor_types=tensor_types,
        llm=llm,
        audio_vae=audio_vae,
        text_projection=text_projection,
    )


def _resolve_upsample_markers(diffusion: Dict[str, np.ndarray]):
    """diffusers upsamplers land at .__up__.; the CompVis sub-index is 1 when
    the output block has no attention, else 2."""
    for name in [n for n in diffusion if ".__up__." in n]:
        arr = diffusion.pop(name)
        blk = name.split(".__up__.")[0]  # e.g. output_blocks.2
        has_attn = any(k.startswith(blk + ".1.transformer_blocks") for k in diffusion)
        idx = 2 if has_attn else 1
        diffusion[name.replace(".__up__.", f".{idx}.")] = arr


def load_controlnet(path: str) -> Dict[str, np.ndarray]:
    """Load a ControlNet checkpoint (CompVis `control_model.*` or diffusers
    ControlNetModel names) into the module-local dict consumed by
    sdtpu.models.controlnet (reference: ControlNet loading,
    src/model/diffusion/control.hpp:311 + name_conversion.cpp controlnet)."""
    from sdtpu.io.name_conversion import convert_diffusers_controlnet_name

    raw = read_checkpoint_file(path)
    out: Dict[str, np.ndarray] = {}
    for k, v in raw.items():
        if k.startswith("control_model."):
            out[k[len("control_model.") :]] = v
        elif k.startswith(("input_blocks.", "zero_convs.", "middle_block",
                           "input_hint_block.", "time_embed.", "label_emb.")):
            out[k] = v
        else:
            cv = convert_diffusers_controlnet_name(k)
            if cv is not None:
                out[cv] = v
            else:
                log_warn(f"controlnet: unmapped tensor {k}")
    return out


def load_model_bundle(
    model_path: Optional[str] = None,
    diffusion_model_path: Optional[str] = None,
    clip_l_path: Optional[str] = None,
    clip_g_path: Optional[str] = None,
    t5xxl_path: Optional[str] = None,
    vae_path: Optional[str] = None,
    llm_path: Optional[str] = None,
    audio_vae_path: Optional[str] = None,
    keep_quant: bool = False,
) -> ModelBundle:
    """Aggregate N weight files with per-file logical prefixes
    (reference stable-diffusion.cpp:714-854)."""
    tensors: Dict[str, np.ndarray] = {}
    if model_path:
        tensors.update(read_checkpoint_file(model_path, keep_quant=keep_quant))
    for path, prefix in (
        (diffusion_model_path, "model.diffusion_model."),
        (clip_l_path, "text_encoders.clip_l.transformer."),
        (clip_g_path, "text_encoders.clip_g.transformer."),
        (t5xxl_path, "text_encoders.t5xxl.transformer."),
        (vae_path, "first_stage_model."),
        (llm_path, "text_encoders.llm."),
        (audio_vae_path, ""),
    ):
        if not path:
            continue
        sub = read_checkpoint_file(
            path, keep_quant=keep_quant and path == diffusion_model_path)
        if path == diffusion_model_path:
            sub = convert_diffusers_diffusion_names(sub)
        elif path == vae_path:
            sub = maybe_convert_diffusers_wan_vae(sub)
        for k, v in sub.items():
            kk = canonicalize_name(k)
            if prefix and not kk.startswith(prefix):
                kk = prefix + kk
            tensors[kk] = v
    bundle = split_modules(tensors)
    log_info(
        f"loaded checkpoint: version={bundle.version.value}, "
        f"diffusion={len(bundle.diffusion)} clip_l={len(bundle.clip_l)} "
        f"clip_g={len(bundle.clip_g)} t5={len(bundle.t5)} vae={len(bundle.vae)} "
        f"llm={len(bundle.llm)} audio_vae={len(bundle.audio_vae)} "
        f"extra={len(bundle.extra)} tensors"
    )
    return bundle

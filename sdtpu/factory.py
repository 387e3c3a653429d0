"""Pipeline assembly (reference: StableDiffusionGGML::init per-version
construction, src/stable-diffusion.cpp:987-1400).

Builds DiffusionPipeline instances for a given SDVersion from a params source
(loaded checkpoints — sdtpu.io — or random init for tests/benchmarks).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sdtpu.config import (
    SDVersion,
    sd_version_is_inpaint,
    sd_version_is_unet_edit,
    sd_version_is_sd2,
    sd_version_is_sdxl,
)
from sdtpu.conditioning.conditioner import SD1Conditioner, SDXLConditioner
from sdtpu.diffusion.denoiser import CompVisDenoiser, CompVisVDenoiser
from sdtpu.models import clip as clip_mod
from sdtpu.models import unet as unet_mod
from sdtpu.models import vae as vae_mod
from sdtpu.pipeline import DiffusionPipeline
from sdtpu.tokenizers import CLIPTokenizer


def _make_ref_extras_fn(vae_params, vae_encode_fn, multiple: int = 16):
    """Build a ref_extras_fn: reference/Kontext edit images → VAE latents as
    ``ref_latent_i`` extras for a DiT token stream (reference ref_latents
    plumbing, stable-diffusion.cpp:4860).

    With resize_before_vae (default, reference model.hpp:24) each image is
    auto-resized toward min(vae_input_max_pixels or 1 MP, target W·H)
    preserving aspect (stable-diffusion.cpp:4879-4896), or straight to the
    request size with resize_vae_to_target; with it off only the mandatory
    round-down to pixel multiples of ``multiple`` happens so patched latent
    grids stay integral."""
    _enc = jax.jit(lambda pp, xx: vae_encode_fn(pp, xx))

    def ref_extras_fn(refs, resize_before_vae=True, vae_input_max_pixels=0,
                      target_wh=None, resize_vae_to_target=False):
        from sdtpu.pipeline import _to_pm1
        from sdtpu.utils.image import resize_image

        out = {}
        for i, r in enumerate(refs):
            arr = np.asarray(r)[..., :3]
            if arr.dtype != np.uint8:
                arr = np.clip(arr * (255.0 if arr.max() <= 1.5 else 1.0),
                              0, 255).astype(np.uint8)
            h0, w0 = arr.shape[:2]
            if resize_before_vae:
                if resize_vae_to_target and target_wh is not None:
                    vw, vh = float(target_wh[0]), float(target_wh[1])
                else:
                    tp = vae_input_max_pixels or (1024 * 1024)
                    if target_wh is not None:
                        tp = min(tp, target_wh[0] * target_wh[1])
                    vw = (tp * w0 / h0) ** 0.5
                    vh = vw * h0 / w0
                nw = max(multiple, int(round(vw / multiple)) * multiple)
                nh = max(multiple, int(round(vh / multiple)) * multiple)
            else:
                nh = max(multiple, (h0 // multiple) * multiple)
                nw = max(multiple, (w0 // multiple) * multiple)
            arr = resize_image(arr, nw, nh)
            out[f"ref_latent_{i}"] = np.asarray(
                _enc(vae_params, jnp.asarray(_to_pm1(arr))[None]),
                dtype=np.float32)
        return out

    return ref_extras_fn


def _extract_vision_tower(llm_params):
    """Split the Qwen-VL vision tower (``visual.*`` keys) out of an LLM
    bundle → (params, detected config) or (None, None)."""
    vis = {k: v for k, v in llm_params.items() if k.startswith("visual.")}
    if not vis:
        return None, None
    from sdtpu.models.qwen_vl_vision import detect_vision_config

    return vis, detect_vision_config(
        vis.keys(), {k: tuple(v.shape) for k, v in vis.items()})


def unet_config_for(version: SDVersion, small: bool = False):
    if small:
        import dataclasses

        base = unet_mod.UNetConfig(
            model_channels=32,
            num_res_blocks=1,
            channel_mult=(1, 2),
            attention_resolutions=(1, 2),
            transformer_depth=(1, 1),
            context_dim=64,
            num_heads=2,
        )
        if sd_version_is_sdxl(version):
            # small clip-g projection dim (48) + 6×256 size/crop embeddings
            base = dataclasses.replace(base, context_dim=96, adm_in_channels=48 + 1536)
        if sd_version_is_inpaint(version):
            base = dataclasses.replace(base, in_channels=9)
        if sd_version_is_unet_edit(version):
            # pix2pix: 4 latent + 4 edit-image channels
            base = dataclasses.replace(base, in_channels=8)
        return base
    import dataclasses

    if sd_version_is_sdxl(version):
        if sd_version_is_unet_edit(version):
            return dataclasses.replace(unet_mod.SDXL_UNET_CONFIG, in_channels=8)
        return (
            unet_mod.SDXL_INPAINT_UNET_CONFIG
            if sd_version_is_inpaint(version)
            else unet_mod.SDXL_UNET_CONFIG
        )
    if version == SDVersion.SD2_TINY_UNET:
        return unet_mod.SD2_TINY_UNET_CONFIG
    if version == SDVersion.SDXS_09:
        return unet_mod.SDXS_09_UNET_CONFIG
    if sd_version_is_sd2(version):
        return (
            unet_mod.SD2_INPAINT_UNET_CONFIG
            if sd_version_is_inpaint(version)
            else unet_mod.SD2_UNET_CONFIG
        )
    if version == SDVersion.SD1_TINY_UNET:
        return unet_mod.SD1_TINY_UNET_CONFIG
    if version == SDVersion.SDXS_512_DS:
        return unet_mod.SDXS_512_UNET_CONFIG
    if sd_version_is_unet_edit(version):
        return dataclasses.replace(unet_mod.SD1_UNET_CONFIG, in_channels=8)
    return (
        unet_mod.SD1_INPAINT_UNET_CONFIG
        if sd_version_is_inpaint(version)
        else unet_mod.SD1_UNET_CONFIG
    )


def create_pipeline(
    version: SDVersion = SDVersion.SD1,
    params: Optional[dict] = None,
    rng_type: str = "cuda",
    dtype=jnp.float32,
    small: bool = False,
    seed: int = 0,
    v_prediction: bool = False,
    t5_tokenizer=None,
    flow_shift: Optional[float] = None,  # None → per-version default
    mesh=None,
    **kwargs,
) -> DiffusionPipeline:
    """params: dict with keys 'diffusion', 'clip_l' (+'clip_g', 't5', 'llm'),
    'vae'; any missing module is random-initialized (tests/benchmarks).

    mesh: jax.sharding.Mesh — distribute the pipeline (tp/dp/sp axes; see
    DiffusionPipeline.set_mesh).  The TPU-native replacement for the
    reference's --backend/--split-mode placement (docs/backend.md:54-116)."""
    pipe = _create_pipeline(
        version, params, rng_type, dtype, small, seed, v_prediction,
        t5_tokenizer, flow_shift, **kwargs,
    )
    if mesh is not None:
        pipe.set_mesh(mesh)
    return pipe


def _create_pipeline(
    version: SDVersion = SDVersion.SD1,
    params: Optional[dict] = None,
    rng_type: str = "cuda",
    dtype=jnp.float32,
    small: bool = False,
    seed: int = 0,
    v_prediction: bool = False,
    t5_tokenizer=None,
    flow_shift: Optional[float] = None,
    **kwargs,
) -> DiffusionPipeline:
    params = params or {}
    if version == SDVersion.SD3:
        return _create_sd3_pipeline(
            params, rng_type, dtype, small, seed, t5_tokenizer, flow_shift
        )
    if version in (SDVersion.FLUX, SDVersion.FLUX_FILL, SDVersion.CHROMA,
                   SDVersion.FLUX_CONTROLS, SDVersion.FLEX_2):
        return _create_flux_pipeline(
            params, rng_type, dtype, small, seed, t5_tokenizer,
            is_chroma=version == SDVersion.CHROMA,
            model_args=kwargs.get("model_args"),
            stream_weights=kwargs.get("stream_weights", False),
            version=version,
        )
    if version in (SDVersion.WAN2, SDVersion.WAN2_2_I2V, SDVersion.WAN2_2_TI2V):
        return _create_wan_pipeline(
            params, rng_type, dtype, small, seed, t5_tokenizer, flow_shift,
            version=version, stream_weights=kwargs.get("stream_weights", False),
        )
    if version in (SDVersion.QWEN_IMAGE, SDVersion.QWEN_IMAGE_LAYERED):
        return _create_qwen_image_pipeline(
            params, rng_type, dtype, small, seed, flow_shift,
            qwen_tokenizer=kwargs.get("qwen_tokenizer"),
            layered=version == SDVersion.QWEN_IMAGE_LAYERED,
            model_args=kwargs.get("model_args"),
        )
    if version == SDVersion.HUNYUAN_VIDEO:
        return _create_hunyuan_pipeline(
            params, rng_type, dtype, small, seed, flow_shift,
            qwen_tokenizer=kwargs.get("qwen_tokenizer"),
            stream_weights=kwargs.get("stream_weights", False),
        )
    if version == SDVersion.LTXAV:
        return _create_ltxav_pipeline(
            params, rng_type, dtype, small, seed, flow_shift,
            stream_weights=kwargs.get("stream_weights", False),
            gemma_tokenizer=kwargs.get("gemma_tokenizer"),
        )
    if version == SDVersion.SVD:
        return _create_svd_pipeline(params, rng_type, dtype, small, seed,
                                    flow_shift)
    if version == SDVersion.LINGBOT_VIDEO:
        return _create_lingbot_pipeline(
            params, rng_type, dtype, small, seed, flow_shift,
            qwen_tokenizer=kwargs.get("qwen_tokenizer"),
        )
    if version == SDVersion.HIDREAM_O1:
        return _create_hidream_pipeline(
            params, rng_type, dtype, small, seed, flow_shift,
            qwen_tokenizer=kwargs.get("qwen_tokenizer"),
        )
    if version == SDVersion.PID:
        return _create_pid_pipeline(
            params, rng_type, dtype, small, seed, flow_shift,
            gemma_tokenizer=kwargs.get("gemma_tokenizer"),
            vae_format=kwargs.get("vae_format", "auto"),
        )
    if version == SDVersion.CHROMA_RADIANCE:
        return _create_chroma_radiance_pipeline(
            params, rng_type, dtype, small, seed, flow_shift,
            t5_tokenizer=t5_tokenizer,
        )
    if version == SDVersion.SEFI:
        return _create_sefi_pipeline(
            params, rng_type, dtype, small, seed, flow_shift,
            qwen_tokenizer=kwargs.get("qwen_tokenizer"),
        )
    if version in (SDVersion.OVIS, SDVersion.LONGCAT):
        return _create_flux_llm_pipeline(
            params, rng_type, dtype, small, seed, flow_shift,
            longcat=version == SDVersion.LONGCAT,
            qwen_tokenizer=kwargs.get("qwen_tokenizer"),
        )
    if version in (SDVersion.FLUX2, SDVersion.FLUX2_KLEIN):
        return _create_flux2_pipeline(
            params, rng_type, dtype, small, seed, flow_shift,
            klein=version == SDVersion.FLUX2_KLEIN,
            mistral_tokenizer=kwargs.get("mistral_tokenizer"),
            qwen_tokenizer=kwargs.get("qwen_tokenizer"),
        )
    if version == SDVersion.Z_IMAGE:
        return _create_z_image_pipeline(
            params, rng_type, dtype, small, seed, flow_shift,
            qwen_tokenizer=kwargs.get("qwen_tokenizer"),
        )
    if version == SDVersion.LENS:
        return _create_lens_pipeline(
            params, rng_type, dtype, small, seed, flow_shift,
            gptoss_tokenizer=kwargs.get("gptoss_tokenizer"),
        )
    if version == SDVersion.ERNIE_IMAGE:
        return _create_ernie_pipeline(
            params, rng_type, dtype, small, seed, flow_shift,
            mistral_tokenizer=kwargs.get("mistral_tokenizer"),
        )
    if version == SDVersion.IDEOGRAM4:
        return _create_ideogram4_pipeline(
            params, rng_type, dtype, small, seed, flow_shift,
            qwen_tokenizer=kwargs.get("qwen_tokenizer"),
        )
    if version == SDVersion.MINIT2I:
        return _create_minit2i_pipeline(
            params, rng_type, dtype, small, seed, flow_shift,
            t5_tokenizer=t5_tokenizer,
        )
    if version == SDVersion.MAGE_FLOW:
        return _create_mage_flow_pipeline(
            params, rng_type, dtype, small, seed, flow_shift,
            qwen_tokenizer=kwargs.get("qwen_tokenizer"),
        )
    if version == SDVersion.ANIMA:
        return _create_anima_pipeline(
            params, rng_type, dtype, small, seed, flow_shift,
            qwen_tokenizer=kwargs.get("qwen_tokenizer"),
            t5_tokenizer=t5_tokenizer,
        )
    if version == SDVersion.BOOGU_IMAGE:
        return _create_boogu_pipeline(
            params, rng_type, dtype, small, seed, flow_shift,
            qwen_tokenizer=kwargs.get("qwen_tokenizer"),
        )
    if version == SDVersion.KREA2:
        return _create_krea2_pipeline(
            params, rng_type, dtype, small, seed, flow_shift,
            qwen_tokenizer=kwargs.get("qwen_tokenizer"),
        )
    ucfg = unet_config_for(version, small)

    if small:
        import dataclasses

        clip_cfg = dataclasses.replace(
            clip_mod.CLIP_L_CONFIG,
            hidden_size=64,
            intermediate_size=128,
            num_layers=2,
            num_heads=4,
        )
        if sd_version_is_sdxl(version):
            clip_cfg = dataclasses.replace(clip_cfg, hidden_size=48, intermediate_size=96)
        vae_cfg = vae_mod.VAEConfig(base_channels=32, channel_mult=(1, 2, 2, 2), num_res_blocks=1)
    else:
        clip_cfg = clip_mod.CLIP_H_CONFIG if sd_version_is_sd2(version) else clip_mod.CLIP_L_CONFIG
        vae_cfg = vae_mod.SDXL_VAE_CONFIG if sd_version_is_sdxl(version) else vae_mod.SD_VAE_CONFIG

    unet_params = params.get("diffusion") or unet_mod.init_unet_params(ucfg, seed=seed, dtype=dtype)
    if params.get("motion"):
        # AnimateDiff motion modules merge under the motion_module. prefix
        unet_params = {
            **unet_params,
            **{
                (k if k.startswith("motion_module.") else f"motion_module.{k}"): v
                for k, v in params["motion"].items()
            },
        }
    clip_params = params.get("clip_l") or clip_mod.init_clip_params(clip_cfg, seed, dtype=dtype)
    vae_params = params.get("vae") or vae_mod.init_vae_params(vae_cfg, seed=seed, dtype=dtype)

    tokenizer = CLIPTokenizer()
    if sd_version_is_sdxl(version):
        if small:
            import dataclasses

            g_cfg = dataclasses.replace(
                clip_mod.CLIP_G_CONFIG,
                hidden_size=48,
                intermediate_size=96,
                num_layers=2,
                num_heads=4,
                projection_dim=48,
            )
        else:
            g_cfg = clip_mod.CLIP_G_CONFIG
        clip_g_params = params.get("clip_g") or clip_mod.init_clip_params(g_cfg, seed + 1, dtype=dtype)
        conditioner = SDXLConditioner(tokenizer, clip_params, clip_cfg, clip_g_params, g_cfg)
    else:
        conditioner = SD1Conditioner(
            tokenizer, clip_params, clip_cfg, is_sd2=sd_version_is_sd2(version)
        )

    def diffusion_fn(p, x, t, ctx, y, controls=None, control_strength=1.0,
                     ip_context=None, ip_scale=1.0):
        if x.ndim == 5:
            # AnimateDiff video: frames fold into the batch; temporal
            # attention regroups them (reference unet.hpp num_video_frames)
            b, f, hh, ww, c = x.shape
            ctx_f = jnp.repeat(ctx, f, axis=0)
            y_f = jnp.repeat(y, f, axis=0) if y is not None else None
            t_f = jnp.repeat(t, f, axis=0)
            out = unet_mod.unet_forward(
                p, x.reshape(b * f, hh, ww, c), t_f, ctx_f, y=y_f, cfg=ucfg,
                num_frames=f,
            )
            return out.reshape(b, f, hh, ww, out.shape[-1])
        return unet_mod.unet_forward(
            p, x, t, ctx, y=y, cfg=ucfg, controls=controls,
            control_strength=control_strength, ip_context=ip_context,
            ip_scale=ip_scale,
        )

    def controlnet_fn(p, x, hint, t, ctx, y):
        from sdtpu.models.controlnet import controlnet_forward

        return controlnet_forward(p, x, hint, t, ctx, y=y, cfg=ucfg)

    def vae_decode_fn(p, z):
        if z.ndim == 5:  # video latents → frame-wise decode
            b, f = z.shape[:2]
            img = vae_mod.vae_decode(p, z.reshape((b * f,) + z.shape[2:]), vae_cfg)
            return img.reshape((b, f) + img.shape[1:])
        return vae_mod.vae_decode(p, z, vae_cfg)

    def vae_encode_fn(p, x, noise=None):
        return vae_mod.vae_encode(p, x, noise=noise, cfg=vae_cfg)

    denoiser = CompVisVDenoiser() if v_prediction else CompVisDenoiser()
    pipe = DiffusionPipeline(
        version=version,
        diffusion_params=unet_params,
        diffusion_fn=diffusion_fn,
        conditioner=conditioner,
        vae_params=vae_params,
        vae_decode_fn=vae_decode_fn,
        vae_encode_fn=vae_encode_fn,
        denoiser=denoiser,
        rng_type=rng_type,
        compute_dtype=dtype,
        controlnet_fn=controlnet_fn,
    )
    if params.get("controlnet") is not None:
        pipe.set_controlnet(params["controlnet"])
    return pipe


def _create_flux_pipeline(params, rng_type, dtype, small, seed, t5_tokenizer,
                          is_chroma: bool = False, model_args=None,
                          stream_weights: bool = False,
                          version: SDVersion = None):
    import dataclasses

    from sdtpu.config import parse_key_value_args
    from sdtpu.conditioning.conditioner import ChromaConditioner, FluxConditioner
    from sdtpu.diffusion.denoiser import FluxFlowDenoiser
    from sdtpu.models import flux as flux_mod
    from sdtpu.models import t5 as t5_mod

    if small:
        dit_cfg = flux_mod.FluxConfig(
            in_channels=16,  # packed 4ch latent × 2×2
            hidden_size=64,
            num_heads=2,
            depth=2,
            depth_single=2,
            axes_dim=(8, 12, 12),
            context_in_dim=96,
            vec_in_dim=0 if is_chroma else 48,
            guidance_embed=not is_chroma,
            is_chroma=is_chroma,
        )
        clip_l_cfg = dataclasses.replace(
            clip_mod.CLIP_L_CONFIG,
            hidden_size=48,
            intermediate_size=96,
            num_layers=2,
            num_heads=4,
        )
        t5_cfg = t5_mod.T5Config(
            vocab_size=256, d_model=96, d_kv=16, d_ff=128, num_layers=2, num_heads=4
        )
        vae_cfg = vae_mod.VAEConfig(
            base_channels=32, channel_mult=(1, 2, 2, 2), num_res_blocks=1, z_channels=4,
            scale_factor=0.3611, shift_factor=0.1159,
        )
        t5_seq = 32
    else:
        dit_cfg = flux_mod.CHROMA_CONFIG if is_chroma else flux_mod.FLUX_DEV_CONFIG
        clip_l_cfg = clip_mod.CLIP_L_CONFIG
        t5_cfg = t5_mod.T5_XXL_CONFIG
        vae_cfg = vae_mod.FLUX_VAE_CONFIG
        t5_seq = 256

    # concat variants widen the packed input (reference flux.hpp:71-75:
    # Fill 384 = img+masked+8²-shuffled-mask, Canny/Depth "Controls" 128 =
    # img+control, Flex.2 196 = img+masked+mask+control; ×4 is the 2×2 pack)
    zc = vae_cfg.z_channels
    if version == SDVersion.FLUX_FILL:
        dit_cfg = dataclasses.replace(
            dit_cfg, in_channels=(2 * zc + 64) * 4, out_channels=zc * 4)
    elif version == SDVersion.FLUX_CONTROLS:
        dit_cfg = dataclasses.replace(
            dit_cfg, in_channels=2 * zc * 4, out_channels=zc * 4)
    elif version == SDVersion.FLEX_2:
        dit_cfg = dataclasses.replace(
            dit_cfg, in_channels=(3 * zc + 1) * 4, out_channels=zc * 4)

    # model_args escape hatch (reference flux.hpp:1417, conditioner.hpp:1300)
    margs = parse_key_value_args(model_args)
    if "chroma_use_dit_mask" in margs:
        dit_cfg = dataclasses.replace(
            dit_cfg, chroma_use_dit_mask=bool(margs["chroma_use_dit_mask"]))
    if "ref_index_increase" in margs:
        # Kontext multi-ref RoPE indexing (reference --increase-ref-index)
        dit_cfg = dataclasses.replace(
            dit_cfg, ref_index_increase=bool(margs["ref_index_increase"]))

    dit_params = params.get("diffusion") or flux_mod.init_flux_params(dit_cfg, seed, dtype=dtype)
    t5_params = params.get("t5") or t5_mod.init_t5_params(t5_cfg, seed + 2, dtype=dtype)
    vae_params = params.get("vae") or vae_mod.init_vae_params(vae_cfg, seed=seed, dtype=dtype)

    if is_chroma:
        conditioner = ChromaConditioner(
            t5_tokenizer, t5_params, t5_cfg, seq_len=t5_seq,
            mask_pad=int(margs.get("chroma_t5_mask_pad", 1)),
            use_mask=bool(margs.get("chroma_use_t5_mask", False)))
    else:
        clip_l_params = params.get("clip_l") or clip_mod.init_clip_params(
            clip_l_cfg, seed, dtype=dtype
        )
        conditioner = FluxConditioner(
            CLIPTokenizer(), t5_tokenizer, clip_l_params, clip_l_cfg, t5_params, t5_cfg,
            t5_seq_len=t5_seq,
        )

    def diffusion_fn(p, x, t, ctx, y, guidance=None, skip_layers=(),
                     pulid_id=None, pulid_weight=None, **ex):
        refs = [ex[k] for k in sorted(k2 for k2 in ex if k2.startswith("ref_latent_"))]
        return flux_mod.flux_forward(p, x, t, ctx, y, guidance=guidance, cfg=dit_cfg,
                                     skip_layers=skip_layers, pulid_id=pulid_id,
                                     pulid_weight=pulid_weight,
                                     ref_latents=refs or None)

    def vae_decode_fn(p, z):
        return vae_mod.vae_decode(p, z, vae_cfg)

    def vae_encode_fn(p, x, noise=None):
        return vae_mod.vae_encode(p, x, noise=noise, cfg=vae_cfg)

    pipe = DiffusionPipeline(
        version=(SDVersion.CHROMA if is_chroma
                 else (version or SDVersion.FLUX)),
        ref_extras_fn=_make_ref_extras_fn(vae_params, vae_encode_fn),
        diffusion_params=dit_params,
        diffusion_fn=diffusion_fn,
        conditioner=conditioner,
        vae_params=vae_params,
        vae_decode_fn=vae_decode_fn,
        vae_encode_fn=vae_encode_fn,
        denoiser=FluxFlowDenoiser(),
        rng_type=rng_type,
        latent_channels=zc,  # concat channels ride c_concat, not the latent
        compute_dtype=dtype,
        uses_distilled_guidance=dit_cfg.guidance_embed,
    )
    def _setup_streaming():
        # >HBM FLUX models: double/single block stacks stream from host RAM
        # (reference --stream-layers + params-backend offload applied to flux);
        # pipe._disk_stream = (SafetensorsFile, cache_bytes) keeps the stacks
        # on disk instead (ResidencyMode::Disk analog)
        import numpy as _np

        from sdtpu.parallel.streaming import FluxStreamer, disk_sources

        disk = getattr(pipe, "_disk_stream", None)
        if disk is not None:
            resident, srcs = disk_sources(
                disk[0], FluxStreamer.STACKS, cache_bytes=disk[1])
            streamer = FluxStreamer(None, dit_cfg, prefetch=2,
                                    resident=resident, sources=srcs)
        else:
            host = {k: _np.asarray(v) for k, v in pipe.diffusion_params.items()}
            streamer = FluxStreamer(host, dit_cfg, prefetch=2)
        pipe.diffusion_params = streamer.resident

        def streamed_fn(p, x, t, ctx, y, guidance=None, **ex):
            return streamer(x, t, ctx, y, guidance=guidance)

        pipe.set_streamed_diffusion(streamed_fn)

    if not is_chroma:
        pipe._stream_setup = _setup_streaming
        if stream_weights:
            _setup_streaming()
    return pipe


def _create_flux_llm_pipeline(params, rng_type, dtype, small, seed, flow_shift,
                              longcat=False, qwen_tokenizer=None):
    """Ovis-Image / LongCat-Image (reference stable-diffusion.cpp
    construction :1044-1056, :1177-1190): a FLUX.1-shaped DiT variant (yak
    swiglu MLPs + semantic txt norm for Ovis; longcat rope + 3584-wide
    Qwen2.5-VL context for LongCat) conditioned by a chat LLM, over the
    standard 16ch flux VAE."""
    import dataclasses

    from sdtpu.conditioning.conditioner import (
        LongCatConditioner,
        OvisImageConditioner,
    )
    from sdtpu.diffusion.denoiser import FluxFlowDenoiser
    from sdtpu.models import flux as flux_mod
    from sdtpu.models import llm as llm_mod

    base = flux_mod.LONGCAT_CONFIG if longcat else flux_mod.OVIS_IMAGE_CONFIG
    if small:
        dit_cfg = dataclasses.replace(
            base, in_channels=16, hidden_size=64, num_heads=2, depth=2,
            depth_single=2, axes_dim=(8, 12, 12), context_in_dim=16)
        llm_cfg = dataclasses.replace(
            llm_mod.QWEN25_VL_7B_CONFIG if longcat else llm_mod.QWEN3_8B_CONFIG,
            num_layers=2, hidden_size=16, intermediate_size=32, num_heads=2,
            num_kv_heads=1, head_dim=8, vocab_size=64)
        vae_cfg = vae_mod.VAEConfig(
            base_channels=32, channel_mult=(1, 2, 2, 2), num_res_blocks=1,
            z_channels=4, scale_factor=0.3611, shift_factor=0.1159)
        content_len = 16
    else:
        d = params.get("diffusion")
        dit_cfg = (dataclasses.replace(
            flux_mod.detect_flux2_config(
                d.keys(), {k: tuple(getattr(v, "shape", ())) for k, v in d.items()}),
            **{f.name: getattr(base, f.name) for f in dataclasses.fields(base)
               if f.name in ("mlp_ratio", "theta", "axes_dim", "vec_in_dim",
                             "share_modulation", "disable_bias", "mlp_silu",
                             "qkv_bias", "txt_arange_axes", "patch_size",
                             "yak_mlp", "semantic_txt_norm", "longcat_rope")})
            if d else base)
        llm = params.get("llm")
        llm_cfg = (llm_mod.detect_llm_config(
            llm.keys(), {k: tuple(v.shape) for k, v in llm.items()},
            arch="qwen2.5vl" if longcat else "qwen3")
            if llm else (llm_mod.QWEN25_VL_7B_CONFIG if longcat
                         else llm_mod.QWEN3_8B_CONFIG))
        vae_cfg = vae_mod.FLUX_VAE_CONFIG
        content_len = (LongCatConditioner if longcat
                       else OvisImageConditioner).CONTENT_LEN

    dit_params = params.get("diffusion") or flux_mod.init_flux_params(
        dit_cfg, seed, dtype=dtype)
    llm_params = params.get("llm") or llm_mod.init_llm_params(
        llm_cfg, seed + 3, dtype=dtype)
    vae_params = params.get("vae") or vae_mod.init_vae_params(
        vae_cfg, seed=seed, dtype=dtype)

    if longcat:
        vis_keys, vision_cfg = _extract_vision_tower(llm_params)
        conditioner = LongCatConditioner(
            qwen_tokenizer, llm_params, llm_cfg, content_len=content_len,
            vision_params=vis_keys, vision_cfg=vision_cfg)
    else:
        conditioner = OvisImageConditioner(qwen_tokenizer, llm_params, llm_cfg,
                                           content_len=content_len)

    def diffusion_fn(p, x, t, ctx, y, guidance=None, skip_layers=(), **ex):
        refs = [ex[k] for k in sorted(k2 for k2 in ex if k2.startswith("ref_latent_"))]
        return flux_mod.flux_forward(p, x, t, ctx, None, guidance=guidance,
                                     cfg=dit_cfg, skip_layers=skip_layers,
                                     ref_latents=refs or None)

    def vae_decode_fn(p, z):
        return vae_mod.vae_decode(p, z, vae_cfg)

    def vae_encode_fn(p, x, noise=None):
        return vae_mod.vae_encode(p, x, noise=noise, cfg=vae_cfg)

    return DiffusionPipeline(
        version=SDVersion.LONGCAT if longcat else SDVersion.OVIS,
        diffusion_params=dit_params,
        diffusion_fn=diffusion_fn,
        conditioner=conditioner,
        vae_params=vae_params,
        vae_decode_fn=vae_decode_fn,
        vae_encode_fn=vae_encode_fn,
        denoiser=FluxFlowDenoiser(
            shift=(3.0 if longcat else 1.0) if flow_shift is None else flow_shift),
        rng_type=rng_type,
        latent_channels=dit_cfg.in_channels // 4,
        compute_dtype=dtype,
        uses_distilled_guidance=dit_cfg.guidance_embed,
        ref_extras_fn=_make_ref_extras_fn(vae_params, vae_encode_fn),
    )


def _create_flux2_pipeline(params, rng_type, dtype, small, seed, flow_shift,
                           klein=False, mistral_tokenizer=None,
                           qwen_tokenizer=None):
    """FLUX.2 / FLUX.2-klein (reference stable-diffusion.cpp construction:
    Mistral-Small (or Qwen3 for klein) LLMEmbedder + FluxRunner with the
    flux2 config variant + 32ch KL VAE packed 2x2 to 128 channels; sampling
    runs in the packed space with the empirical-mu flux2 scheduler,
    stable-diffusion.cpp:3865)."""
    import dataclasses

    from sdtpu.conditioning.conditioner import Flux2Conditioner
    from sdtpu.diffusion.denoiser import FluxFlowDenoiser
    from sdtpu.models import flux as flux_mod
    from sdtpu.models import llm as llm_mod

    if small:
        dit_cfg = dataclasses.replace(
            flux_mod.FLUX2_DEV_CONFIG, in_channels=16, hidden_size=64,
            num_heads=2, depth=2, depth_single=2, axes_dim=(8, 8, 8, 8),
            context_in_dim=48, guidance_embed=not klein)
        llm_cfg = dataclasses.replace(
            llm_mod.QWEN3_4B_CONFIG if klein else
            llm_mod.MISTRAL_SMALL_32_CONFIG,
            num_layers=3, hidden_size=16, intermediate_size=32, num_heads=2,
            num_kv_heads=1, head_dim=8, vocab_size=64)
        vae_cfg = vae_mod.VAEConfig(base_channels=32, channel_mult=(1, 2, 2, 2),
                                    num_res_blocks=1, z_channels=4,
                                    scale_factor=1.0)
        out_layers = (1, 2, 3)
        min_len = 8
    else:
        d = params.get("diffusion")
        dit_cfg = (flux_mod.detect_flux2_config(
            d.keys(), {k: tuple(getattr(v, "shape", ())) for k, v in d.items()})
            if d else (flux_mod.FLUX2_KLEIN_CONFIG if klein
                       else flux_mod.FLUX2_DEV_CONFIG))
        llm = params.get("llm")
        llm_cfg = (llm_mod.detect_llm_config(
            llm.keys(), {k: tuple(v.shape) for k, v in llm.items()},
            arch="qwen3" if klein else "mistral_small_3_2")
            if llm else (llm_mod.QWEN3_4B_CONFIG if klein
                         else llm_mod.MISTRAL_SMALL_32_CONFIG))
        vae_cfg = vae_mod.FLUX2_VAE_CONFIG
        out_layers = None
        min_len = Flux2Conditioner.MIN_LEN

    dit_params = params.get("diffusion") or flux_mod.init_flux_params(
        dit_cfg, seed, dtype=dtype)
    llm_params = params.get("llm") or llm_mod.init_llm_params(
        llm_cfg, seed + 3, dtype=dtype)
    vae_params = params.get("vae") or vae_mod.init_vae_params(
        vae_cfg, seed=seed, dtype=dtype)

    conditioner = Flux2Conditioner(
        qwen_tokenizer if klein else mistral_tokenizer, llm_params, llm_cfg,
        klein=klein, out_layers=out_layers, min_len=min_len)

    def diffusion_fn(p, x, t, ctx, y, guidance=None, skip_layers=(), **ex):
        refs = [ex[k] for k in sorted(k2 for k2 in ex if k2.startswith("ref_latent_"))]
        return flux_mod.flux_forward(p, x, t, ctx, None, guidance=guidance,
                                     cfg=dit_cfg, skip_layers=skip_layers,
                                     ref_latents=refs or None)

    if small:
        # tiny config: plain 4-ch VAE with a 2x2 pack, no statistics
        def vae_decode_fn(p, z):
            return vae_mod.vae_decode(p, vae_mod.flux2_unpack(z), vae_cfg)

        def vae_encode_fn(p, x, noise=None):
            return vae_mod.flux2_pack(vae_mod.vae_encode(p, x, noise=noise, cfg=vae_cfg))
    else:
        def vae_decode_fn(p, z):
            return vae_mod.flux2_vae_decode(p, z, vae_cfg)

        def vae_encode_fn(p, x, noise=None):
            return vae_mod.flux2_vae_encode(p, x, noise=noise, cfg=vae_cfg)

    return DiffusionPipeline(
        version=SDVersion.FLUX2_KLEIN if klein else SDVersion.FLUX2,
        diffusion_params=dit_params,
        diffusion_fn=diffusion_fn,
        conditioner=conditioner,
        vae_params=vae_params,
        vae_decode_fn=vae_decode_fn,
        vae_encode_fn=vae_encode_fn,
        denoiser=FluxFlowDenoiser(shift=1.0 if flow_shift is None else flow_shift),
        rng_type=rng_type,
        latent_channels=dit_cfg.in_channels,
        scale_factor=16,
        compute_dtype=dtype,
        uses_distilled_guidance=dit_cfg.guidance_embed,
        default_schedule="flux2",
        ref_extras_fn=_make_ref_extras_fn(vae_params, vae_encode_fn),
    )


def _create_svd_pipeline(params, rng_type, dtype, small, seed, flow_shift):
    """Stable Video Diffusion img2vid (reference unet.hpp SVD paths +
    EDMVDenoiser, denoiser.hpp:1182): spatial-video UNet with frames in the
    batch dimension, CLIP-ViT-H image-embedding context, first-frame latent
    concat (noise-augmented), (fps, motion bucket, aug) label vector."""
    import dataclasses

    from sdtpu.conditioning.conditioner import SVDConditioner
    from sdtpu.diffusion.denoiser import EDMVDenoiser
    from sdtpu.models import unet as unet_mod

    if small:
        dit_cfg = dataclasses.replace(
            unet_mod.SVD_UNET_CONFIG, model_channels=32, num_res_blocks=1,
            channel_mult=(1, 2), transformer_depth=(1, 1), context_dim=48,
            adm_in_channels=24, num_head_channels=16,
            attention_resolutions=(1, 2))
        vae_cfg = vae_mod.VAEConfig(base_channels=32, channel_mult=(1, 2, 2, 2),
                                    num_res_blocks=1, z_channels=4)
        cv_params = cv_cfg = None
        ctx_dim, adm = 48, 24
    else:
        d = params.get("diffusion")
        dit_cfg = unet_mod.SVD_UNET_CONFIG
        vae_cfg = vae_mod.SD_VAE_CONFIG
        cv_params = params.get("clip_vision") or params.get("clip_l")
        cv_cfg = None
        if cv_params is not None:
            from sdtpu.models.clip import CLIP_VIT_H_CONFIG

            cv_cfg = CLIP_VIT_H_CONFIG
        ctx_dim, adm = 1024, 768

    dit_params = params.get("diffusion") or unet_mod.init_unet_params(
        dit_cfg, seed, dtype=dtype)
    vae_params = params.get("vae") or vae_mod.init_vae_params(
        vae_cfg, seed=seed, dtype=dtype)

    conditioner = SVDConditioner(context_dim=ctx_dim)
    if small:
        # tiny adm: truncate the 768 embedding to the test dim
        _orig = conditioner.get_learned_condition

        def _small_cond(text, **kw):
            c = _orig(text, **kw)
            c.c_vector = c.c_vector[:, :adm]
            return c
        conditioner.get_learned_condition = _small_cond

    def diffusion_fn(p, x, t, ctx, y):
        # frames ride the TIME axis of the video pipeline; the pipeline's
        # model wrapper has already concatenated the first-frame conditioning
        # channels onto x (→ 8ch); the UNet wants frames stacked in batch
        b, tl, hh, ww, c = x.shape
        xf = x.reshape(b * tl, hh, ww, c)
        tf = jnp.repeat(t, tl)
        ctxf = jnp.repeat(ctx, tl, axis=0)
        yf = jnp.repeat(y, tl, axis=0) if y is not None else None
        out = unet_mod.unet_forward(p, xf, tf, ctxf, y=yf, cfg=dit_cfg,
                                    num_frames=tl)
        return out.reshape(b, tl, hh, ww, -1)

    def vae_decode_fn(p, z):
        # per-frame image VAE decode: [B,T,h,w,4] → [B,T,H,W,3]
        b, tl = z.shape[:2]
        img = vae_mod.vae_decode(p, z.reshape((b * tl,) + z.shape[2:]), vae_cfg)
        return img.reshape((b, tl) + img.shape[1:])

    def vae_encode_fn(p, x, noise=None):
        return vae_mod.vae_encode(p, x, noise=noise, cfg=vae_cfg)

    pipe = DiffusionPipeline(
        version=SDVersion.SVD,
        diffusion_params=dit_params,
        diffusion_fn=diffusion_fn,
        conditioner=conditioner,
        vae_params=vae_params,
        vae_decode_fn=vae_decode_fn,
        vae_encode_fn=vae_encode_fn,
        denoiser=EDMVDenoiser(),
        rng_type=rng_type,
        latent_channels=vae_cfg.z_channels,
        scale_factor=8,
        compute_dtype=dtype,
        temporal_scale=1,
        default_schedule="karras",
    )

    _enc = jax.jit(lambda pr, xx: vae_encode_fn(pr, xx))

    def video_condition_fn(init_image, frames, w, h):
        """→ (c_concat [1,T,lh,lw,4], None, ctx_override [1,1,ctx]):
        noise-augmented first-frame latent replicated per frame + CLIP-vision
        image embedding as the cond context."""
        from sdtpu.pipeline import _to_pm1
        from sdtpu.utils.image import resize_image

        lh, lw = h // 8, w // 8
        if init_image is None:
            return (np.zeros((1, frames, lh, lw, vae_cfg.z_channels),
                             dtype=np.float32), None, None)
        img = np.asarray(init_image)[..., :3]
        if img.dtype != np.uint8:
            img = np.clip(img * (255.0 if img.max() <= 1.5 else 1.0),
                          0, 255).astype(np.uint8)
        img = resize_image(img, w, h)
        pm1 = _to_pm1(img)[None]
        aug = conditioner.cond_aug
        pm1 = pm1 + aug * np.random.default_rng(seed).standard_normal(
            pm1.shape).astype(np.float32)
        z = np.asarray(_enc(vae_params, jnp.asarray(pm1)), dtype=np.float32)
        c_concat = np.broadcast_to(z[:, None], (1, frames) + z.shape[1:])
        ctx = None
        if cv_params is not None and cv_cfg is not None:
            from sdtpu.models.clip import clip_preprocess, clip_vision_forward

            emb = clip_vision_forward(
                cv_params, clip_preprocess(img, cv_cfg.image_size).astype(dtype),
                cv_cfg)
            ctx = np.asarray(emb, dtype=np.float32).reshape(1, 1, -1)
        return c_concat, None, ctx

    pipe.video_condition_fn = video_condition_fn
    return pipe


def _create_lingbot_pipeline(params, rng_type, dtype, small, seed, flow_shift,
                             qwen_tokenizer=None):
    """LingBot-Video (reference stable-diffusion.cpp:1133 + lingbot_video.hpp):
    Qwen3-VL conditioner with a video prompt-enhancement template, sparse-MoE
    video DiT over the Wan 2.1 VAE; FLOW_PRED shift 3.0."""
    import dataclasses

    from sdtpu.conditioning.conditioner import LingBotConditioner
    from sdtpu.diffusion.denoiser import DiscreteFlowDenoiser
    from sdtpu.models import lingbot_video as lb_mod
    from sdtpu.models import llm as llm_mod
    from sdtpu.models import wan_vae as wan_vae_mod

    if small:
        dit_cfg = lb_mod.LingBotVideoConfig(
            hidden_size=32, num_heads=2, depth=3, intermediate_size=64,
            text_dim=16, freq_dim=16, axes_dim=(4, 6, 6), in_channels=4,
            out_channels=4, num_experts=4, num_experts_per_tok=2,
            moe_intermediate_size=8, n_group=2, topk_group=1,
            sparse_layers=(1,))
        llm_cfg = dataclasses.replace(
            llm_mod.QWEN3_VL_4B_CONFIG, num_layers=2, hidden_size=16,
            intermediate_size=32, num_heads=2, num_kv_heads=1, head_dim=8,
            vocab_size=64, mrope_sections=(2, 1, 1, 0))
        vae_cfg = wan_vae_mod.WanVAEConfig(dim=8, z_dim=4, num_res_blocks=1)
    else:
        d = params.get("diffusion")
        dit_cfg = (lb_mod.detect_lingbot_config(
            d.keys(), {k: tuple(v.shape) for k, v in d.items()})
            if d else lb_mod.LINGBOT_VIDEO_CONFIG)
        llm = params.get("llm")
        llm_cfg = (llm_mod.detect_llm_config(
            llm.keys(), {k: tuple(v.shape) for k, v in llm.items()},
            arch="qwen3_vl") if llm else llm_mod.QWEN3_VL_4B_CONFIG)
        vae_cfg = (_detect_wan_vae_config(params["vae"], wan_vae_mod)
                   if params.get("vae") else wan_vae_mod.WAN21_VAE_CONFIG)

    dit_params = params.get("diffusion") or lb_mod.init_lingbot_params(
        dit_cfg, seed, dtype=dtype)
    llm_params = params.get("llm") or llm_mod.init_llm_params(
        llm_cfg, seed + 3, dtype=dtype)
    vae_params = params.get("vae") or wan_vae_mod.init_wan_vae_params(
        vae_cfg, seed=seed, dtype=dtype)

    conditioner = LingBotConditioner(qwen_tokenizer, llm_params, llm_cfg)

    def diffusion_fn(p, x, t, ctx, y):
        return lb_mod.lingbot_forward(p, x, t, ctx, cfg=dit_cfg)

    use_stats = vae_cfg.z_dim == 16

    def vae_decode_fn(p, z):
        if use_stats:
            z = wan_vae_mod.diffusion_to_vae_latents(z)
        return wan_vae_mod.wan_vae_decode(p, z, vae_cfg)

    def vae_encode_fn(p, x, noise=None):
        z = wan_vae_mod.wan_vae_encode(p, x, vae_cfg)
        if use_stats:
            z = wan_vae_mod.vae_to_diffusion_latents(z)
        return z

    return DiffusionPipeline(
        version=SDVersion.LINGBOT_VIDEO,
        diffusion_params=dit_params,
        diffusion_fn=diffusion_fn,
        conditioner=conditioner,
        vae_params=vae_params,
        vae_decode_fn=vae_decode_fn,
        vae_encode_fn=vae_encode_fn,
        denoiser=DiscreteFlowDenoiser(shift=3.0 if flow_shift is None else flow_shift),
        rng_type=rng_type,
        latent_channels=vae_cfg.z_dim,
        scale_factor=8,
        compute_dtype=dtype,
        temporal_scale=4,
    )


def _create_hidream_pipeline(params, rng_type, dtype, small, seed, flow_shift,
                             qwen_tokenizer=None):
    """HiDream-O1 (reference stable-diffusion.cpp:1190 + hidream_o1.hpp):
    the Qwen3-VL LLM is the diffusion backbone; pixel-space sampling (FakeVAE,
    scale factor 1), FLOW_PRED shift 3.0, model timestep input 1 - sigma
    (stable-diffusion.cpp:2333)."""
    import dataclasses

    from sdtpu.conditioning.conditioner import HiDreamO1Conditioner
    from sdtpu.diffusion.denoiser import DiscreteFlowDenoiser
    from sdtpu.models import hidream_o1 as hd_mod
    from sdtpu.models import llm as llm_mod
    from sdtpu.pipeline import HiDreamPipeline

    if small:
        llm_cfg = dataclasses.replace(
            llm_mod.QWEN3_VL_8B_CONFIG, num_layers=2, hidden_size=16,
            intermediate_size=32, num_heads=2, num_kv_heads=1, head_dim=8,
            vocab_size=151936, mrope_sections=(2, 1, 1, 0))
        dit_cfg = hd_mod.HiDreamO1Config(llm=llm_cfg, patch_size=4)
    else:
        d = params.get("diffusion")
        dit_cfg = (hd_mod.detect_hidream_config(
            d.keys(), {k: tuple(v.shape) for k, v in d.items()})
            if d else hd_mod.HIDREAM_O1_CONFIG)

    dit_params = params.get("diffusion") or hd_mod.init_hidream_params(
        dit_cfg, seed, dtype=dtype)

    conditioner = HiDreamO1Conditioner(qwen_tokenizer,
                                       patch_size=dit_cfg.patch_size)

    def diffusion_fn(p, x, t, ctx, y):
        # t arrives as sigma*1000 (DiscreteFlowDenoiser); the model takes
        # 1 - sigma and converts its x0 prediction to velocity internally
        states = conditioner.states
        t_model = 1.0 - t / 1000.0

        def fwd(xx, tt, st):
            return hd_mod.hidream_forward(
                p, xx, tt,
                jnp.asarray(st["input_ids"]),
                jnp.asarray(st["position_ids"]),
                jnp.asarray(st["attn_bias"]),
                cfg=dit_cfg)

        if len(states) == 2 and x.shape[0] % 2 == 0:
            hb = x.shape[0] // 2
            va = fwd(x[:hb], t_model[:hb], states[0])
            vb = fwd(x[hb:], t_model[hb:], states[1])
            return jnp.concatenate([va, vb], axis=0)
        return fwd(x, t_model, states[0])

    def vae_decode_fn(p, z):
        return jnp.clip(z, -1.0, 1.0)

    def vae_encode_fn(p, x, noise=None):
        return x

    return HiDreamPipeline(
        version=SDVersion.HIDREAM_O1,
        diffusion_params=dit_params,
        diffusion_fn=diffusion_fn,
        conditioner=conditioner,
        vae_params={},
        vae_decode_fn=vae_decode_fn,
        vae_encode_fn=vae_encode_fn,
        denoiser=DiscreteFlowDenoiser(shift=3.0 if flow_shift is None else flow_shift),
        rng_type=rng_type,
        latent_channels=dit_cfg.in_channels,
        scale_factor=1,
        compute_dtype=dtype,
    )


def _create_pid_pipeline(params, rng_type, dtype, small, seed, flow_shift,
                         gemma_tokenizer=None, vae_format="auto"):
    """PiD pixel-space super-resolution (reference stable-diffusion.cpp:995
    + pid.hpp PiDRunner): Gemma2-2B conditioner, sampling in pixel space
    (scale factor 1, identity decode), with the low-quality reference image
    VAE-encoded into per-block sigma-gated features.  Flow shift 1.5
    (stable-diffusion.cpp:1719).

    vae_format: which latent family the LQ reference encoder uses —
    auto/flux/sd3/flux2 (reference --vae-format + sd_vae_format_to_version,
    stable-diffusion.cpp:1366; only PiD honors the override)."""
    import dataclasses

    from sdtpu.conditioning.conditioner import PidConditioner
    from sdtpu.diffusion.denoiser import DiscreteFlowDenoiser
    from sdtpu.models import llm as llm_mod
    from sdtpu.models import pid as pid_mod

    if small:
        dit_cfg = pid_mod.PidConfig(
            hidden_size=48, num_groups=4, patch_mlp_hidden_dim=64,
            pixel_hidden_size=8, pixel_attn_hidden_size=32,
            pixel_num_groups=2, patch_depth=2, pixel_depth=1, patch_size=4,
            txt_embed_dim=16, txt_max_length=16, lq_latent_channels=4,
            lq_hidden_dim=8, lq_num_res_blocks=1, rope_ref_grid_h=8,
            rope_ref_grid_w=8)
        llm_cfg = dataclasses.replace(
            llm_mod.GEMMA2_2B_CONFIG, num_layers=2, hidden_size=16,
            intermediate_size=32, num_heads=2, num_kv_heads=1, head_dim=8,
            vocab_size=64)
        vae_cfg = vae_mod.VAEConfig(base_channels=32, channel_mult=(1, 2, 2, 2),
                                    num_res_blocks=1, z_channels=4,
                                    scale_factor=1.0)
        max_len = 16
    else:
        d = params.get("diffusion")
        dit_cfg = (pid_mod.detect_pid_config(
            d.keys(), {k: tuple(v.shape) for k, v in d.items()})
            if d else pid_mod.PID_CONFIG)
        llm = params.get("llm")
        llm_cfg = (llm_mod.detect_llm_config(
            llm.keys(), {k: tuple(v.shape) for k, v in llm.items()},
            arch="gemma2_2b") if llm else llm_mod.GEMMA2_2B_CONFIG)
        # the LQ reference encoder is a 16ch (PiD) or 32ch-packed (PiD 1.5)
        # KL VAE; --vae-format overrides the family (reference
        # sd_vae_format_to_version, stable-diffusion.cpp:1366)
        fmt_map = {"flux": vae_mod.FLUX_VAE_CONFIG,
                   "sd3": vae_mod.SD3_VAE_CONFIG,
                   "flux2": vae_mod.FLUX2_VAE_CONFIG}
        if vae_format in fmt_map:
            vae_cfg = fmt_map[vae_format]
        elif vae_format not in ("auto", "", None):
            raise ValueError(
                f"--vae-format {vae_format!r} not supported for PiD on this "
                "build (auto/flux/sd3/flux2)")
        else:
            vae_cfg = (vae_mod.FLUX2_VAE_CONFIG
                       if dit_cfg.lq_latent_channels > 16 else
                       vae_mod.FLUX_VAE_CONFIG)
        max_len = PidConditioner.MAX_LEN

    dit_params = params.get("diffusion") or pid_mod.init_pid_params(
        dit_cfg, seed, dtype=dtype)
    llm_params = params.get("llm") or llm_mod.init_llm_params(
        llm_cfg, seed + 3, dtype=dtype)
    vae_params = params.get("vae") or vae_mod.init_vae_params(
        vae_cfg, seed=seed, dtype=dtype)

    conditioner = PidConditioner(gemma_tokenizer, llm_params, llm_cfg,
                                 max_len=max_len)

    def diffusion_fn(p, x, t, ctx, y, lq_latent=None):
        if lq_latent is None:
            raise ValueError("PiD requires a reference image (pass "
                             "ref_images=[img] / --ref-image)")
        return pid_mod.pid_forward(p, x, t, ctx, lq_latent, cfg=dit_cfg)

    # pixel space: identity VAE for sampling; the real VAE only encodes refs
    def vae_decode_fn(p, z):
        return jnp.clip(z, -1.0, 1.0)

    if small or vae_cfg is not vae_mod.FLUX2_VAE_CONFIG:
        def ref_encode_fn(p, x, noise=None):
            return vae_mod.vae_encode(p, x, noise=noise, cfg=vae_cfg)
    else:
        def ref_encode_fn(p, x, noise=None):
            return vae_mod.flux2_vae_encode(p, x, noise=noise, cfg=vae_cfg)

    pipe = DiffusionPipeline(
        version=SDVersion.PID,
        diffusion_params=dit_params,
        diffusion_fn=diffusion_fn,
        conditioner=conditioner,
        vae_params=vae_params,
        vae_decode_fn=vae_decode_fn,
        vae_encode_fn=None,  # sampling is pixel-space; refs use _ref_encode
        denoiser=DiscreteFlowDenoiser(shift=1.5 if flow_shift is None else flow_shift),
        rng_type=rng_type,
        latent_channels=dit_cfg.in_channels,
        scale_factor=1,
        compute_dtype=dtype,
    )

    _jit_ref = jax.jit(lambda pr, xx: ref_encode_fn(pr, xx))

    def ref_extras_fn(refs):
        img = np.asarray(refs[0], dtype=np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        lat = _jit_ref(vae_params, jnp.asarray(img * 2.0 - 1.0)[None])
        return {"lq_latent": lat}

    pipe.ref_extras_fn = ref_extras_fn
    return pipe


def _create_chroma_radiance_pipeline(params, rng_type, dtype, small, seed,
                                     flow_shift, t5_tokenizer=None):
    """Chroma-Radiance (reference stable-diffusion.cpp:1418 FakeVAE +
    flux.hpp forward_chroma_radiance): pixel-space chroma with a 16x16 conv
    patch embed and a NeRF per-patch pixel decoder; T5 conditioner with the
    chroma attention mask; no VAE (identity, clipped to [-1,1])."""
    import dataclasses

    from sdtpu.conditioning.conditioner import ChromaConditioner
    from sdtpu.diffusion.denoiser import FluxFlowDenoiser
    from sdtpu.models import flux as flux_mod
    from sdtpu.models import t5 as t5_mod

    if small:
        dit_cfg = dataclasses.replace(
            flux_mod.CHROMA_RADIANCE_CONFIG, hidden_size=64, num_heads=2,
            depth=2, depth_single=2, axes_dim=(8, 12, 12), context_in_dim=96,
            patch_size=4, nerf_hidden=16, nerf_depth=2, nerf_max_freqs=4)
        t5_cfg = t5_mod.T5Config(vocab_size=256, d_model=96, d_kv=16, d_ff=128,
                                 num_layers=2, num_heads=4)
        t5_seq = 32
    else:
        d = params.get("diffusion")
        if d:
            shapes = {k: tuple(getattr(v, "shape", ())) for k, v in d.items()}
            names = set(d.keys())
            depth = max((int(n.split(".")[1]) + 1 for n in names
                         if n.startswith("double_blocks.")), default=19)
            depth_single = max((int(n.split(".")[1]) + 1 for n in names
                                if n.startswith("single_blocks.")), default=38)
            conv_w = shapes.get("img_in_patch.weight", (3072, 3, 16, 16))
            # __32x32__ checkpoints: conv kernel is half the logical patch
            fake_x2 = "__32x32__" in names
            dit_cfg = dataclasses.replace(
                flux_mod.CHROMA_RADIANCE_CONFIG,
                hidden_size=conv_w[0], depth=depth, depth_single=depth_single,
                patch_size=conv_w[2] * (2 if fake_x2 else 1),
                fake_patch_x2=fake_x2, radiance_x0="__x0__" in names)
        else:
            dit_cfg = flux_mod.CHROMA_RADIANCE_CONFIG
        t5_cfg = t5_mod.T5_XXL_CONFIG
        t5_seq = 512

    dit_params = params.get("diffusion") or flux_mod.init_flux_params(
        dit_cfg, seed, dtype=dtype)
    t5_params = params.get("t5") or t5_mod.init_t5_params(
        t5_cfg, seed + 2, dtype=dtype)

    conditioner = ChromaConditioner(t5_tokenizer, t5_params, t5_cfg,
                                    seq_len=t5_seq)

    def diffusion_fn(p, x, t, ctx, y, guidance=None, skip_layers=()):
        return flux_mod.flux_forward(p, x, t, ctx, y, guidance=guidance,
                                     cfg=dit_cfg, skip_layers=skip_layers)

    def vae_decode_fn(p, z):
        return jnp.clip(z, -1.0, 1.0)

    def vae_encode_fn(p, x, noise=None):
        return x

    return DiffusionPipeline(
        version=SDVersion.CHROMA_RADIANCE,
        diffusion_params=dit_params,
        diffusion_fn=diffusion_fn,
        conditioner=conditioner,
        vae_params={},
        vae_decode_fn=vae_decode_fn,
        vae_encode_fn=vae_encode_fn,
        denoiser=FluxFlowDenoiser(shift=1.0 if flow_shift is None else flow_shift),
        rng_type=rng_type,
        latent_channels=dit_cfg.in_channels,
        scale_factor=1,
        compute_dtype=dtype,
    )


def _create_sefi_pipeline(params, rng_type, dtype, small, seed, flow_shift,
                          qwen_tokenizer=None):
    """SeFi-Image (reference stable-diffusion.cpp:1754 + flux.hpp:96-111):
    FLUX.2-shaped DiT over 16 semantic + 128 packed texture channels, dual
    timestep embedder, Qwen3-VL conditioner; sampled with the dedicated
    dual-schedule sefi_euler (denoiser.hpp:2673 forces it), texture channels
    decoded by the 32ch flux2 VAE (auto_encoder_kl.hpp:819 slice 16..144)."""
    import dataclasses

    from sdtpu.conditioning.conditioner import SefiConditioner
    from sdtpu.diffusion.denoiser import SefiFlowDenoiser
    from sdtpu.models import flux as flux_mod
    from sdtpu.models import llm as llm_mod

    sem = flux_mod.SEFI_CONFIG.sefi_sem_channels
    if small:
        dit_cfg = dataclasses.replace(
            flux_mod.SEFI_CONFIG, in_channels=sem + 16, hidden_size=64,
            num_heads=2, depth=2, depth_single=2, axes_dim=(8, 8, 8, 8),
            context_in_dim=48)
        llm_cfg = dataclasses.replace(
            llm_mod.QWEN3_8B_CONFIG, num_layers=3, hidden_size=16,
            intermediate_size=32, num_heads=2, num_kv_heads=1, head_dim=8,
            vocab_size=64)
        vae_cfg = vae_mod.VAEConfig(base_channels=32, channel_mult=(1, 2, 2, 2),
                                    num_res_blocks=1, z_channels=4,
                                    scale_factor=1.0)
        out_layers = (1, 2, 3)
        min_len = 16
    else:
        d = params.get("diffusion")
        dit_cfg = (dataclasses.replace(
            flux_mod.detect_flux2_config(
                d.keys(), {k: tuple(getattr(v, "shape", ())) for k, v in d.items()}),
            is_sefi=True, guidance_embed=False)
            if d else flux_mod.SEFI_CONFIG)
        llm = params.get("llm")
        llm_cfg = (llm_mod.detect_llm_config(
            llm.keys(), {k: tuple(v.shape) for k, v in llm.items()},
            arch="qwen3") if llm else llm_mod.QWEN3_8B_CONFIG)
        vae_cfg = vae_mod.FLUX2_VAE_CONFIG
        out_layers = None
        min_len = SefiConditioner.MIN_LEN

    dit_params = params.get("diffusion") or flux_mod.init_flux_params(
        dit_cfg, seed, dtype=dtype)
    llm_params = params.get("llm") or llm_mod.init_llm_params(
        llm_cfg, seed + 3, dtype=dtype)
    vae_params = params.get("vae") or vae_mod.init_vae_params(
        vae_cfg, seed=seed, dtype=dtype)

    conditioner = SefiConditioner(qwen_tokenizer, llm_params, llm_cfg,
                                  out_layers=out_layers, min_len=min_len)

    def diffusion_fn(p, x, t, ctx, y, guidance=None, skip_layers=()):
        return flux_mod.flux_forward(p, x, t, ctx, None, cfg=dit_cfg,
                                     skip_layers=skip_layers)

    if small:
        # tiny config: texture half = plain 4-ch VAE with a 2x2 pack;
        # encode prepends zeroed semantic channels
        def vae_decode_fn(p, z):
            return vae_mod.vae_decode(p, vae_mod.flux2_unpack(z[..., sem:]), vae_cfg)

        def vae_encode_fn(p, x, noise=None):
            tex = vae_mod.flux2_pack(vae_mod.vae_encode(p, x, noise=noise, cfg=vae_cfg))
            return jnp.concatenate(
                [jnp.zeros(tex.shape[:-1] + (sem,), tex.dtype), tex], axis=-1)
    else:
        def vae_decode_fn(p, z):
            return vae_mod.flux2_vae_decode(p, z[..., sem:], vae_cfg)

        def vae_encode_fn(p, x, noise=None):
            tex = vae_mod.flux2_vae_encode(p, x, noise=noise, cfg=vae_cfg)
            return jnp.concatenate(
                [jnp.zeros(tex.shape[:-1] + (sem,), tex.dtype), tex], axis=-1)

    return DiffusionPipeline(
        version=SDVersion.SEFI,
        diffusion_params=dit_params,
        diffusion_fn=diffusion_fn,
        conditioner=conditioner,
        vae_params=vae_params,
        vae_decode_fn=vae_decode_fn,
        vae_encode_fn=vae_encode_fn,
        denoiser=SefiFlowDenoiser(),
        rng_type=rng_type,
        latent_channels=dit_cfg.in_channels,
        scale_factor=16,
        compute_dtype=dtype,
        default_schedule="sefi",
        force_sample_method="sefi_euler",
    )


def _create_qwen_image_pipeline(params, rng_type, dtype, small, seed, flow_shift,
                                qwen_tokenizer=None, layered=False,
                                model_args=None):
    """Qwen-Image (reference stable-diffusion.cpp qwen_image construction):
    Qwen2.5-VL conditioner + joint-stream DiT + Wan 2.1 VAE in image mode.

    layered: QWEN_IMAGE_LAYERED (reference qwen_image.hpp:589-632) — the
    latent carries layers+1 stacked image layers; generate via
    pipe.generate_video(frames=layers+1), each decoded frame is one layer."""
    from sdtpu.conditioning.conditioner import QwenImageConditioner
    from sdtpu.diffusion.denoiser import DiscreteFlowDenoiser
    from sdtpu.models import llm as llm_mod
    from sdtpu.models import qwen_image as qi_mod
    from sdtpu.models import wan_vae as wan_vae_mod

    if small:
        dit_cfg = qi_mod.QwenImageConfig(
            in_channels=16, out_channels=4, num_layers=2, head_dim=16,
            use_additional_t_cond=layered,
            num_heads=4, joint_attention_dim=48, axes_dim=(4, 6, 6),
        )
        llm_cfg = llm_mod.LLMConfig(
            num_layers=2, hidden_size=48, intermediate_size=96, num_heads=4,
            num_kv_heads=2, head_dim=12, vocab_size=256,
        )
        vae_cfg = wan_vae_mod.WanVAEConfig(dim=8, z_dim=4, num_res_blocks=1)
    else:
        dit_cfg = (
            qi_mod.detect_qwen_image_config(params["diffusion"].keys())
            if params.get("diffusion")
            else qi_mod.QWEN_IMAGE_CONFIG
        )
        llm_cfg = (
            llm_mod.detect_llm_config(
                params["llm"].keys(),
                {k: tuple(v.shape) for k, v in params["llm"].items()},
            )
            if params.get("llm")
            else llm_mod.QWEN25_VL_7B_CONFIG
        )
        vae_cfg = (
            _detect_wan_vae_config(params["vae"], wan_vae_mod)
            if params.get("vae")
            else wan_vae_mod.WAN21_VAE_CONFIG
        )

    # model_args 'qwen_image_zero_cond_t' (reference qwen_image.hpp:579-588)
    import dataclasses as _dc

    from sdtpu.config import parse_key_value_args
    margs = parse_key_value_args(model_args)
    if margs.get("qwen_image_zero_cond_t"):
        dit_cfg = _dc.replace(dit_cfg, zero_cond_t=True)

    dit_params = params.get("diffusion") or qi_mod.init_qwen_image_params(dit_cfg, seed, dtype=dtype)
    llm_params = params.get("llm") or llm_mod.init_llm_params(llm_cfg, seed + 3, dtype=dtype)
    vae_params = params.get("vae") or wan_vae_mod.init_wan_vae_params(vae_cfg, seed=seed, dtype=dtype)

    # vision tower (edit pipelines) lives inside the llm bundle
    vis_keys, vision_cfg = _extract_vision_tower(llm_params)
    conditioner = QwenImageConditioner(
        qwen_tokenizer, llm_params, llm_cfg,
        vision_params=vis_keys or None, vision_cfg=vision_cfg)

    def diffusion_fn(p, x, t, ctx, y, **ex):
        refs = [ex[k] for k in sorted(k2 for k2 in ex if k2.startswith("ref_latent_"))]
        return qi_mod.qwen_image_forward(p, x, t, ctx, cfg=dit_cfg,
                                         ref_latents=refs or None)

    use_stats = vae_cfg.z_dim == 16

    def vae_decode_fn(p, z):
        if z.ndim == 5:
            # layered: each layer is an INDEPENDENT image — decode as
            # B·T single-frame videos (reference per-layer decode loop,
            # stable-diffusion.cpp:5137-5160)
            b2, t2 = z.shape[0], z.shape[1]
            out = vae_decode_fn(p, z.reshape((b2 * t2,) + z.shape[2:]))
            return out.reshape((b2, t2) + out.shape[1:])
        zv = z[:, None]  # image → 1-frame video
        if use_stats:
            zv = wan_vae_mod.diffusion_to_vae_latents(zv)
        out = wan_vae_mod.wan_vae_decode(p, zv, vae_cfg)
        return out[:, 0]

    def vae_encode_fn(p, x, noise=None):
        zv = wan_vae_mod.wan_vae_encode(p, x[:, None], vae_cfg)
        if use_stats:
            zv = wan_vae_mod.vae_to_diffusion_latents(zv)
        return zv[:, 0]

    ref_extras_fn = _make_ref_extras_fn(vae_params, vae_encode_fn)

    return DiffusionPipeline(
        version=SDVersion.QWEN_IMAGE_LAYERED if layered else SDVersion.QWEN_IMAGE,
        diffusion_params=dit_params,
        diffusion_fn=diffusion_fn,
        conditioner=conditioner,
        vae_params=vae_params,
        vae_decode_fn=vae_decode_fn,
        vae_encode_fn=vae_encode_fn,
        denoiser=DiscreteFlowDenoiser(shift=3.0 if flow_shift is None else flow_shift),
        rng_type=rng_type,
        latent_channels=dit_cfg.out_channels,
        scale_factor=8,
        compute_dtype=dtype,
        ref_extras_fn=ref_extras_fn,
    )


def _create_hunyuan_pipeline(params, rng_type, dtype, small, seed, flow_shift,
                             qwen_tokenizer=None, stream_weights=False):
    """Hunyuan Video 1.5 (reference stable-diffusion.cpp:1086): Qwen2.5-VL
    conditioner (video chat template), FLUX-style double-stream DiT with the
    token refiner, 16×/4× causal VAE, flow shift 7."""
    from sdtpu.conditioning.conditioner import QwenImageConditioner
    from sdtpu.diffusion.denoiser import DiscreteFlowDenoiser
    from sdtpu.models import hunyuan as hy_mod
    from sdtpu.models import hunyuan_vae as hyvae_mod
    from sdtpu.models import llm as llm_mod
    from sdtpu.models import t5 as t5_mod

    if small:
        dit_cfg = hy_mod.HunyuanVideoConfig(
            in_channels=9, out_channels=4, hidden_size=64, context_in_dim=48,
            num_heads=2, depth=2, axes_dim=(8, 12, 12), refiner_depth=1,
            # small byt5 glyph branch when a (tiny) byt5 tower is supplied
            use_byt5=bool(params.get("t5")),
            use_cond_type_embedding=bool(params.get("t5")),
            byt5_in_dim=(params["t5"]["shared.weight"].shape[1]
                         if params.get("t5") else 1472),
        )
        llm_cfg = llm_mod.LLMConfig(
            num_layers=2, hidden_size=48, intermediate_size=96, num_heads=4,
            num_kv_heads=2, head_dim=12, vocab_size=256,
        )
        vae_cfg = hyvae_mod.HunyuanVAEConfig(
            z_channels=4, block_out_channels=(8, 8, 16, 16, 16), layers_per_block=1,
        )
    else:
        dit_cfg = (
            hy_mod.detect_hunyuan_config(
                params["diffusion"].keys(),
                {k: tuple(v.shape) for k, v in params["diffusion"].items()},
            )
            if params.get("diffusion")
            else hy_mod.HUNYUAN_VIDEO_15_CONFIG
        )
        llm_cfg = (
            llm_mod.detect_llm_config(
                params["llm"].keys(),
                {k: tuple(v.shape) for k, v in params["llm"].items()},
            )
            if params.get("llm")
            else llm_mod.QWEN25_VL_7B_CONFIG
        )
        vae_cfg = hyvae_mod.HUNYUAN_VAE_CONFIG

    dit_params = params.get("diffusion") or hy_mod.init_hunyuan_params(dit_cfg, seed, dtype=dtype)
    llm_params = params.get("llm") or llm_mod.init_llm_params(llm_cfg, seed + 3, dtype=dtype)
    vae_params = params.get("vae") or hyvae_mod.init_hunyuan_vae_params(vae_cfg, seed=seed, dtype=dtype)

    # byt5-small glyph encoder for quoted prompt text (reference LLMEmbedder
    # byt5, conditioner.hpp:1828-1840: built when the file set carries
    # text_encoders.t5xxl.* alongside a hunyuan-video model)
    byt5_params = params.get("t5")
    byt5_cfg = _detect_t5_config(byt5_params, t5_mod) if byt5_params else None
    conditioner = QwenImageConditioner(
        qwen_tokenizer, llm_params, llm_cfg, template="hunyuan_video",
        byt5_params=byt5_params, byt5_cfg=byt5_cfg,
    )
    latent_ch = vae_cfg.z_channels
    extra_in = dit_cfg.in_channels - latent_ch

    def diffusion_fn(p, x, t, ctx, y, timestep_r=None, context_byt5=None):
        single = x.ndim == 4
        if single:
            x = x[:, None]  # image → 1-frame video
        if extra_in > 0:
            # t2v: the i2v conditioning channels (cond latents + mask) are
            # zero (reference HunyuanVideoRunner c_concat handling)
            pad = jnp.zeros(x.shape[:-1] + (extra_in,), dtype=x.dtype)
            x = jnp.concatenate([x, pad], axis=-1)
        out = hy_mod.hunyuan_forward(p, x, t, ctx, cfg=dit_cfg,
                                     timestep_r=timestep_r,
                                     context_byt5=context_byt5)
        return out[:, 0] if single else out

    def vae_decode_fn(p, z):
        zv = z[:, None] if z.ndim == 4 else z
        zv = zv / hyvae_mod.HUNYUAN_LATENT_SCALE
        out = hyvae_mod.hunyuan_vae_decode(p, zv, vae_cfg)
        return out[:, 0] if z.ndim == 4 else out

    def vae_encode_fn(p, x, noise=None):
        xv = x[:, None] if x.ndim == 4 else x
        zv = hyvae_mod.hunyuan_vae_encode(p, xv, vae_cfg) * hyvae_mod.HUNYUAN_LATENT_SCALE
        return zv[:, 0] if x.ndim == 4 else zv

    pipe = DiffusionPipeline(
        version=SDVersion.HUNYUAN_VIDEO,
        diffusion_params=dit_params,
        diffusion_fn=diffusion_fn,
        conditioner=conditioner,
        vae_params=vae_params,
        vae_decode_fn=vae_decode_fn,
        vae_encode_fn=vae_encode_fn,
        denoiser=DiscreteFlowDenoiser(shift=7.0 if flow_shift is None else flow_shift),
        rng_type=rng_type,
        latent_channels=latent_ch,
        scale_factor=vae_cfg.spatial_ratio,
        compute_dtype=dtype,
        temporal_scale=vae_cfg.temporal_ratio,
    )
    # meanflow checkpoints consume the next-step timestep every forward
    pipe.needs_sigma_next = dit_cfg.use_meanflow

    def _setup_streaming():
        # >HBM Hunyuan models: double-stream stack streams from host RAM,
        # or straight from disk when pipe._disk_stream is set
        import numpy as _np

        from sdtpu.parallel.streaming import HunyuanStreamer, disk_sources

        disk = getattr(pipe, "_disk_stream", None)
        if disk is not None:
            resident, srcs = disk_sources(
                disk[0], HunyuanStreamer.STACKS, cache_bytes=disk[1])
            streamer = HunyuanStreamer(None, dit_cfg, prefetch=2,
                                       resident=resident, sources=srcs)
        else:
            host = {k: _np.asarray(v) for k, v in pipe.diffusion_params.items()}
            streamer = HunyuanStreamer(host, dit_cfg, prefetch=2)
        pipe.diffusion_params = streamer.resident

        def streamed_fn(p, x, t, ctx, y, timestep_r=None, context_byt5=None,
                        **ex):
            single = x.ndim == 4
            if single:
                x = x[:, None]
            if extra_in > 0:
                pad = jnp.zeros(x.shape[:-1] + (extra_in,), dtype=x.dtype)
                x = jnp.concatenate([x, pad], axis=-1)
            out = streamer(x, t, ctx, timestep_r=timestep_r,
                           context_byt5=context_byt5)
            return out[:, 0] if single else out

        pipe.set_streamed_diffusion(streamed_fn)

    pipe._stream_setup = _setup_streaming
    if stream_weights:
        _setup_streaming()
    return pipe


def _detect_t5_config(p, t5_mod):
    """T5/UMT5 config from checkpoint shapes (reference detect_from_weights
    pattern, src/model/te/llm.hpp:113)."""
    import dataclasses

    vocab, d_model = p["shared.weight"].shape
    num_layers = 1 + max(
        int(k.split(".")[2]) for k in p if k.startswith("encoder.block.")
    )
    num_heads = p[
        "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"
    ].shape[1]
    inner = p["encoder.block.0.layer.0.SelfAttention.q.weight"].shape[0]
    d_ff = p["encoder.block.0.layer.1.DenseReluDense.wi_0.weight"].shape[0]
    is_umt5 = (
        "encoder.block.1.layer.0.SelfAttention.relative_attention_bias.weight" in p
    )
    return t5_mod.T5Config(
        vocab_size=vocab, d_model=d_model, d_kv=inner // num_heads, d_ff=d_ff,
        num_layers=num_layers, num_heads=num_heads, is_umt5=is_umt5,
    )


def _detect_wan_vae_config(p, wan_vae_mod):
    """Wan VAE dims from checkpoint shapes; layout (dim_mult 1,2,4,4 ×
    num_res_blocks 2) is fixed across published Wan 2.1 VAEs."""
    dim = p["decoder.head.2.weight"].shape[1]
    z_dim = p["decoder.conv1.weight"].shape[1]
    n_res = 0
    while f"decoder.upsamples.{n_res}.residual.0.gamma" in p:
        n_res += 1
    return wan_vae_mod.WanVAEConfig(dim=dim, z_dim=z_dim, num_res_blocks=n_res - 1)


def _create_wan_pipeline(params, rng_type, dtype, small, seed, t5_tokenizer, flow_shift,
                         version=SDVersion.WAN2, stream_weights=False):
    """Wan 2.1 T2V (reference construction stable-diffusion.cpp:1098-1135;
    default flow shift 5.0, :1714)."""
    from sdtpu.conditioning.conditioner import WanConditioner
    from sdtpu.diffusion.denoiser import DiscreteFlowDenoiser
    from sdtpu.models import t5 as t5_mod
    from sdtpu.models import wan as wan_mod
    from sdtpu.models import wan_vae as wan_vae_mod

    if small:
        is_i2v = version == SDVersion.WAN2_2_I2V
        dit_cfg = wan_mod.WanConfig(
            model_type="i2v" if is_i2v else "t2v",
            in_dim=12 if is_i2v else 4,  # i2v: 4 latent + 4 mask + 4 cond latent
            dim=64, ffn_dim=128, freq_dim=32, text_dim=96, out_dim=4,
            num_heads=2, num_layers=2, axes_dim=(8, 12, 12),
        )
        t5_cfg = t5_mod.T5Config(
            vocab_size=256, d_model=96, d_kv=16, d_ff=128, num_layers=2,
            num_heads=4, is_umt5=True,
        )
        vae_cfg = wan_vae_mod.WanVAEConfig(dim=8, z_dim=4, num_res_blocks=1)
        t5_seq = 32
    else:
        if params.get("diffusion"):
            d = params["diffusion"]
            dit_cfg = wan_mod.detect_wan_config(
                d.keys(), {k: tuple(v.shape) for k, v in d.items()}
            )
        else:
            dit_cfg = wan_mod.WAN21_T2V_1_3B_CONFIG
        t5_cfg = (
            _detect_t5_config(params["t5"], t5_mod)
            if params.get("t5")
            else t5_mod.UMT5_XXL_CONFIG
        )
        vae_cfg = (
            _detect_wan_vae_config(params["vae"], wan_vae_mod)
            if params.get("vae")
            else wan_vae_mod.WAN21_VAE_CONFIG
        )
        t5_seq = 512

    dit_params = params.get("diffusion") or wan_mod.init_wan_params(dit_cfg, seed, dtype=dtype)
    t5_params = params.get("t5") or t5_mod.init_t5_params(t5_cfg, seed + 2, dtype=dtype)
    vae_params = params.get("vae") or wan_vae_mod.init_wan_vae_params(vae_cfg, seed=seed, dtype=dtype)

    conditioner = WanConditioner(t5_tokenizer, t5_params, t5_cfg, seq_len=t5_seq)

    def diffusion_fn(p, x, t, ctx, y, vace_context=None, vace_strength=None,
                     skip_layers=()):
        vs = 1.0 if vace_strength is None else vace_strength[:, None, None]
        return wan_mod.wan_forward(p, x, t, ctx, clip_fea=y, cfg=dit_cfg,
                                   vace_context=vace_context, vace_strength=vs,
                                   skip_layers=skip_layers)

    use_stats = vae_cfg.z_dim == 16  # per-channel stats only for the real VAE

    def vae_decode_fn(p, z):
        if use_stats:
            z = wan_vae_mod.diffusion_to_vae_latents(z)
        return wan_vae_mod.wan_vae_decode(p, z, vae_cfg)

    def vae_encode_fn(p, x, noise=None):
        z = wan_vae_mod.wan_vae_encode(p, x, vae_cfg)
        if use_stats:
            z = wan_vae_mod.vae_to_diffusion_latents(z)
        return z

    def _vace_prepare(control_frames, frames, w, h):
        """control frames + full-regenerate mask → [1, Tl, lh, lw, 96]
        (reference VACE context prep, stable-diffusion.cpp:5977-6030):
        inactive = grey (mask=1 everywhere), reactive = control video;
        mask pixel-shuffled 8x8 into 64 channels."""
        from sdtpu.pipeline import _to_pm1
        from sdtpu.utils.image import resize_image

        enc2 = jax.jit(lambda pp, xx: vae_encode_fn(pp, xx))
        vid = np.zeros((1, frames, h, w, 3), dtype=np.float32)
        for i, f in enumerate(control_frames[:frames]):
            img = np.asarray(f)[..., :3]
            if img.dtype != np.uint8:
                img = np.clip(img * (255.0 if img.max() <= 1.5 else 1.0),
                              0, 255).astype(np.uint8)
            vid[0, i] = _to_pm1(resize_image(img, w, h))
        mask = np.ones((1, frames, h, w, 1), dtype=np.float32)
        inactive = vid * (1.0 - mask)  # pm1 grey = 0
        reactive = vid * mask
        zi = np.asarray(enc2(vae_params, jnp.asarray(inactive)), dtype=np.float32)
        zr = np.asarray(enc2(vae_params, jnp.asarray(reactive)), dtype=np.float32)
        tl, lh, lw = zi.shape[1:4]
        # mask context: 8x8 pixel-shuffle of the (first-frame-aligned) mask
        m = mask[0, :1, :, :, 0]  # latent-frame mask is uniform here
        m = m.reshape(1, lh, 8, lw, 8).transpose(0, 1, 3, 2, 4).reshape(1, lh, lw, 64)
        mctx = np.broadcast_to(m[None], (1, tl, lh, lw, 64))
        return np.concatenate([zi, zr, mctx.astype(np.float32)], axis=-1)

    video_condition_fn = None
    if dit_cfg.model_type == "i2v":
        clip_vision_params = params.get("clip_vision")
        cv_cfg = None
        if clip_vision_params is not None:
            from sdtpu.models.clip import CLIP_VIT_H_CONFIG

            cv_cfg = CLIP_VIT_H_CONFIG
        enc = jax.jit(lambda p, x: vae_encode_fn(p, x))

        def video_condition_fn(init_image, frames, w, h):
            """→ (c_concat [1,Tl,lh,lw,4+16], clip_fea [1,257,1280]) —
            reference wan i2v prep (stable-diffusion.cpp:5855-5911).
            init_image=None → zero conditioning (the i2v model still needs
            its conditioning channels)."""
            from sdtpu.pipeline import _to_pm1
            from sdtpu.utils.image import resize_image

            seq = np.zeros((1, frames, h, w, 3), dtype=np.float32)  # 0.5 grey → 0 in [-1,1]
            img = None
            if init_image is not None:
                img = resize_image(np.asarray(init_image)[..., :3], w, h)
                seq[0, 0] = _to_pm1(img)
            z = np.asarray(enc(vae_params, jnp.asarray(seq)), dtype=np.float32)
            mask = np.zeros(z.shape[:-1] + (4,), dtype=np.float32)
            if img is not None:
                mask[:, 0] = 1.0
            c_concat = np.concatenate([mask, z], axis=-1)

            if img is not None and clip_vision_params is not None:
                from sdtpu.models.clip import clip_preprocess, clip_vision_forward

                _, hidden = clip_vision_forward(
                    clip_vision_params,
                    clip_preprocess(img, cv_cfg.image_size).astype(dtype),
                    cv_cfg, return_hidden=True,
                )
                clip_fea = np.asarray(hidden, dtype=np.float32)
            else:
                from sdtpu.utils import log_warn

                log_warn("wan i2v: no clip_vision weights; using zero image features")
                clip_fea = np.zeros((1, 257, 1280), dtype=np.float32)
            return c_concat, clip_fea

    pipe = DiffusionPipeline(
        version=version,
        diffusion_params=dit_params,
        diffusion_fn=diffusion_fn,
        conditioner=conditioner,
        vae_params=vae_params,
        vae_decode_fn=vae_decode_fn,
        vae_encode_fn=vae_encode_fn,
        denoiser=DiscreteFlowDenoiser(shift=5.0 if flow_shift is None else flow_shift),
        rng_type=rng_type,
        latent_channels=vae_cfg.z_dim,
        scale_factor=8,
        compute_dtype=dtype,
        temporal_scale=4,
        video_condition_fn=video_condition_fn,
    )
    pipe.vace_prepare_fn = _vace_prepare
    def _setup_streaming():
        # >HBM Wan models: keep block weights in host RAM, stream per use
        # (reference --stream-layers + params-backend offload), or straight
        # from disk when pipe._disk_stream is set
        import numpy as _np

        from sdtpu.parallel.streaming import WanStreamer, disk_sources

        disk = getattr(pipe, "_disk_stream", None)
        if disk is not None:
            resident, srcs = disk_sources(
                disk[0], WanStreamer.STACKS, cache_bytes=disk[1])
            streamer = WanStreamer(None, dit_cfg, prefetch=2,
                                   resident=resident, sources=srcs)
        else:
            host = {k: _np.asarray(v) for k, v in pipe.diffusion_params.items()}
            streamer = WanStreamer(host, dit_cfg, prefetch=2)
        pipe.diffusion_params = streamer.resident  # sampler passes these through

        def streamed_fn(p, x, t, ctx, y=None, **ex):
            return streamer(x, t, ctx, clip_fea=y)

        pipe.set_streamed_diffusion(streamed_fn)

    pipe._stream_setup = _setup_streaming
    if stream_weights:
        _setup_streaming()
    return pipe


def _create_sd3_pipeline(params, rng_type, dtype, small, seed, t5_tokenizer, flow_shift):
    import dataclasses

    from sdtpu.conditioning.conditioner import SD3Conditioner
    from sdtpu.diffusion.denoiser import DiscreteFlowDenoiser
    from sdtpu.models import mmdit as mmdit_mod
    from sdtpu.models import t5 as t5_mod

    if small:
        dit_cfg = mmdit_mod.MMDiTConfig(
            patch_size=2,
            in_channels=4,
            depth=2,
            context_size=96,
            adm_in_channels=96,
            pos_embed_max_size=16,
        )
        clip_l_cfg = dataclasses.replace(
            clip_mod.CLIP_L_CONFIG,
            hidden_size=48,
            intermediate_size=96,
            num_layers=2,
            num_heads=4,
            projection_dim=48,
        )
        clip_g_cfg = dataclasses.replace(clip_l_cfg, projection_dim=48)
        t5_cfg = t5_mod.T5Config(
            vocab_size=256, d_model=96, d_kv=16, d_ff=128, num_layers=2, num_heads=4
        )
        vae_cfg = vae_mod.VAEConfig(
            base_channels=32, channel_mult=(1, 2, 2, 2), num_res_blocks=1, z_channels=4,
            scale_factor=1.5305, shift_factor=0.0609,
        )
    else:
        if params.get("diffusion"):
            # fingerprint SD3-medium / SD3.5-medium (MMDiT-X) / SD3.5-large
            # from the provided weights (reference model-type detection)
            d = params["diffusion"]
            dit_cfg = mmdit_mod.detect_mmdit_config(
                d.keys(), {k: tuple(v.shape) for k, v in d.items()})
        else:
            dit_cfg = mmdit_mod.SD3_MEDIUM_CONFIG
        clip_l_cfg = dataclasses.replace(clip_mod.CLIP_L_CONFIG, projection_dim=768)
        clip_g_cfg = clip_mod.CLIP_G_CONFIG
        t5_cfg = (
            _detect_t5_config(params["t5"], t5_mod)
            if params.get("t5")
            else t5_mod.T5_XXL_CONFIG
        )
        vae_cfg = vae_mod.SD3_VAE_CONFIG

    dit_params = params.get("diffusion") or mmdit_mod.init_mmdit_params(dit_cfg, seed, dtype=dtype)
    clip_l_params = params.get("clip_l") or clip_mod.init_clip_params(clip_l_cfg, seed, dtype=dtype)
    clip_g_params = params.get("clip_g") or clip_mod.init_clip_params(clip_g_cfg, seed + 1, dtype=dtype)
    t5_params = params.get("t5") or t5_mod.init_t5_params(t5_cfg, seed + 2, dtype=dtype)
    vae_params = params.get("vae") or vae_mod.init_vae_params(vae_cfg, seed=seed, dtype=dtype)

    tokenizer = CLIPTokenizer()
    conditioner = SD3Conditioner(
        tokenizer,
        t5_tokenizer,
        clip_l_params,
        clip_l_cfg,
        clip_g_params,
        clip_g_cfg,
        t5_params,
        t5_cfg,
    )

    def diffusion_fn(p, x, t, ctx, y, skip_layers=()):
        return mmdit_mod.mmdit_forward(p, x, t, ctx, y, cfg=dit_cfg,
                                       skip_layers=skip_layers)

    def vae_decode_fn(p, z):
        return vae_mod.vae_decode(p, z, vae_cfg)

    def vae_encode_fn(p, x, noise=None):
        return vae_mod.vae_encode(p, x, noise=noise, cfg=vae_cfg)

    return DiffusionPipeline(
        version=SDVersion.SD3,
        diffusion_params=dit_params,
        diffusion_fn=diffusion_fn,
        conditioner=conditioner,
        vae_params=vae_params,
        vae_decode_fn=vae_decode_fn,
        vae_encode_fn=vae_encode_fn,
        denoiser=DiscreteFlowDenoiser(shift=3.0 if flow_shift is None else flow_shift),
        rng_type=rng_type,
        latent_channels=dit_cfg.in_channels,
        compute_dtype=dtype,
    )


def _create_ltxav_pipeline(params, rng_type, dtype, small, seed, flow_shift,
                           gemma_tokenizer=None, stream_weights=False):
    """LTX-2 audio-video (reference construction for VERSION_LTXAV:
    LTXAVEmbedder + LTXAVRunner + LTXVideoVAE + LTXAudioVAERunner,
    stable-diffusion.cpp:1140-1220; FluxFlowDenoiser with default flow shift
    2.37, :1750)."""
    import dataclasses

    import numpy as np

    from sdtpu.conditioning.conditioner import LTXAVConditioner
    from sdtpu.diffusion.denoiser import FluxFlowDenoiser
    from sdtpu.models import llm as llm_mod
    from sdtpu.models import ltx_audio_vae as av_mod
    from sdtpu.models import ltx_vae as lv_mod
    from sdtpu.models import ltxv as ltxv_mod
    from sdtpu.pipeline import LTXAVPipeline

    if small:
        dit_cfg = ltxv_mod.LTXAVConfig(
            in_channels=8, out_channels=8, hidden_size=48,
            cross_attention_dim=24, caption_channels=16, num_heads=4,
            head_dim=12, num_layers=2, audio_in_channels=4,
            audio_out_channels=4, audio_hidden_size=32,
            audio_cross_attention_dim=32, audio_num_heads=4, audio_head_dim=8,
            num_audio_channels=2, audio_frequency_bins=2,
            vae_scale_factors=(2, 4, 4),
        )
        vae_cfg = lv_mod.LTXVAEConfig(
            patch_size=2, latent_channels=8, timestep_conditioning=True,
            encoder_blocks=(lv_mod.LTXVAEBlock("res_x", 1),
                            lv_mod.LTXVAEBlock("compress_all_res", 0, 2),
                            lv_mod.LTXVAEBlock("res_x", 1)),
            decoder_blocks=(lv_mod.LTXVAEBlock("res_x", 1),
                            lv_mod.LTXVAEBlock("compress_all", 0, 2),
                            lv_mod.LTXVAEBlock("res_x", 1)),
        )
        audio_cfg = av_mod.LTXAudioVAEConfig(
            mel_bins=8, latent_channels=2, latent_frequency_bins=2,
            decoder_channels=4, decoder_channel_multipliers=(1, 2, 4),
            decoder_num_res_blocks=1, base_upsample_initial_channel=8,
            base_upsample_rates=(2, 2), base_upsample_kernel_sizes=(4, 4),
            base_resblock_kernel_sizes=(3,),
            base_resblock_dilations=((1, 2, 3),),
        )
        llm_cfg = dataclasses.replace(
            llm_mod.GEMMA3_12B_CONFIG, num_layers=3, hidden_size=16,
            intermediate_size=32, num_heads=2, num_kv_heads=1, head_dim=8,
            vocab_size=64, sliding_attention=(4, 0))
        scale_factor, temporal_scale = 4, 2
    else:
        d = params.get("diffusion")
        dit_cfg = (ltxv_mod.detect_ltxav_config(
            d.keys(), {k: tuple(v.shape) for k, v in d.items()})
            if d else ltxv_mod.LTXAV_CONFIG)
        v = params.get("vae")
        vae_cfg = (lv_mod.detect_ltx_vae_config(
            v.keys(), {k: tuple(v2.shape) for k, v2 in v.items()})
            if v else lv_mod.LTXVAEConfig(
                decoder_blocks=(), encoder_blocks=lv_mod.LTX2_ENCODER_BLOCKS))
        a = params.get("audio_vae")
        audio_cfg = (av_mod.detect_ltx_audio_vae_config(
            a.keys(), {k: tuple(v2.shape) for k, v2 in a.items()})
            if a else av_mod.LTX_AUDIO_VAE_CONFIG)
        llm = params.get("llm")
        llm_cfg = (llm_mod.detect_llm_config(
            llm.keys(), {k: tuple(v2.shape) for k, v2 in llm.items()},
            arch="gemma3_12b") if llm else llm_mod.GEMMA3_12B_CONFIG)
        scale_factor, temporal_scale = 32, 8

    dit_params = params.get("diffusion") or ltxv_mod.init_ltxav_params(
        dit_cfg, seed, dtype=dtype)
    vae_params = params.get("vae") or lv_mod.init_ltx_vae_params(
        vae_cfg, channels=16 if small else 128, seed=seed + 1, dtype=dtype)
    audio_params = params.get("audio_vae")
    if audio_params is None and small:
        audio_params = av_mod.init_ltx_audio_vae_params(audio_cfg, seed + 2,
                                                        dtype=dtype)
    llm_params = params.get("llm") or llm_mod.init_llm_params(
        llm_cfg, seed + 3, dtype=dtype)
    proj_params = params.get("text_projection")
    if proj_params is None:
        g = np.random.default_rng(seed + 4)
        flat = (llm_cfg.num_layers + 1) * llm_cfg.hidden_size
        vd = dit_cfg.cross_attention_dim
        ad = dit_cfg.audio_cross_attention_dim
        proj_params = {
            "video_aggregate_embed.weight": jnp.asarray(
                g.standard_normal((vd, flat), dtype=np.float32) * 0.02, dtype),
            "video_aggregate_embed.bias": jnp.zeros((vd,), dtype),
            "audio_aggregate_embed.weight": jnp.asarray(
                g.standard_normal((ad, flat), dtype=np.float32) * 0.02, dtype),
            "audio_aggregate_embed.bias": jnp.zeros((ad,), dtype),
        }

    conditioner = LTXAVConditioner(gemma_tokenizer, llm_params, llm_cfg,
                                   proj_params)

    zc = vae_cfg.latent_channels
    ca = dit_cfg.num_audio_channels
    fb = dit_cfg.audio_frequency_bins
    # trace-time AV state, mutated by LTXAVPipeline.generate_video; program
    # caches are keyed on it (LTXAVPipeline._av_key)
    av_state = {"audio_len": 0, "fps": 24.0, "positions": None}

    ltx_holder = {"streamer": None}  # filled by _setup_streaming

    def diffusion_fn(p, x, t, ctx, y, av_mask=None, av_init=None):
        """x: packed AV latent [B, T, H, W, zc+extra]; t: [B]."""
        if av_mask is not None:
            x = x * av_mask.astype(x.dtype) + av_init.astype(x.dtype) * (
                1.0 - av_mask.astype(x.dtype))
        audio_len = av_state["audio_len"]
        video = x[..., :zc]
        audio = (ltxv_mod.unpack_audio_latent_jnp(x, audio_len, zc, ca, fb)
                 if audio_len else None)
        ts = t
        if av_mask is not None:
            b = x.shape[0]
            tok_mask = av_mask[..., 0].reshape(b, -1)
            ts = t[:, None] * tok_mask
        if ltx_holder["streamer"] is not None:
            vout, aout = ltx_holder["streamer"](
                video, ts, ctx, audio_x=audio, audio_timesteps=t,
                frame_rate=av_state["fps"],
                video_positions=av_state["positions"])
        else:
            vout, aout = ltxv_mod.ltxav_forward(
                p, video, ts, ctx, audio_x=audio, audio_timesteps=t,
                frame_rate=av_state["fps"],
                video_positions=av_state["positions"], cfg=dit_cfg)
        if aout is None:
            return vout
        return ltxv_mod.pack_av_latents_jnp(vout, aout,
                                            total_channels=x.shape[-1])

    def vae_decode_fn(p, z):
        return lv_mod.ltx_vae_decode(p, z, vae_cfg)

    def vae_encode_fn(p, x, noise=None):
        return lv_mod.ltx_vae_encode(p, x, vae_cfg)

    def audio_decode_fn(p, a_latent):
        return av_mod.ltx_audio_vae_decode(p, a_latent, audio_cfg)

    def upsample_fn(p, z):
        from sdtpu.models.ltx_latent_upsampler import latent_upsample

        return latent_upsample(p, z)

    pipe = LTXAVPipeline(
        version=SDVersion.LTXAV,
        diffusion_params=dit_params,
        diffusion_fn=diffusion_fn,
        conditioner=conditioner,
        vae_params=vae_params,
        vae_decode_fn=vae_decode_fn,
        vae_encode_fn=vae_encode_fn,
        denoiser=FluxFlowDenoiser(shift=2.37 if flow_shift is None else flow_shift),
        rng_type=rng_type,
        latent_channels=zc,
        scale_factor=scale_factor,
        compute_dtype=dtype,
        temporal_scale=temporal_scale,
        av_state=av_state,
        audio_vae_params=audio_params,
        audio_vae_cfg=audio_cfg,
        audio_decode_fn=audio_decode_fn if audio_params is not None else None,
        upsample_fn=upsample_fn,
        audio_channels=ca,
        audio_freq_bins=fb,
    )
    def _setup_streaming():
        # >HBM LTX models: transformer_blocks stream from host RAM (or disk
        # when pipe._disk_stream is set); diffusion_fn already routes through
        # the streamer — it just must run eagerly so the per-block
        # device_puts execute outside jit
        import numpy as _np

        from sdtpu.parallel.streaming import LTXVStreamer, disk_sources

        disk = getattr(pipe, "_disk_stream", None)
        if disk is not None:
            resident, srcs = disk_sources(
                disk[0], LTXVStreamer.STACKS, cache_bytes=disk[1])
            ltx_holder["streamer"] = LTXVStreamer(
                None, dit_cfg, prefetch=2, resident=resident, sources=srcs)
        else:
            host = {k: _np.asarray(v) for k, v in pipe.diffusion_params.items()}
            ltx_holder["streamer"] = LTXVStreamer(host, dit_cfg, prefetch=2)
        pipe.diffusion_params = ltx_holder["streamer"].resident
        pipe.set_streamed_diffusion(diffusion_fn)

    pipe._stream_setup = _setup_streaming
    if stream_weights:
        _setup_streaming()
    return pipe


def _create_z_image_pipeline(params, rng_type, dtype, small, seed, flow_shift,
                             qwen_tokenizer=None):
    """Z-Image (reference construction stable-diffusion.cpp:1214: LLMEmbedder
    Qwen3 + ZImageRunner + flux 16-ch AutoencoderKL; FLOW_PRED with default
    shift 3.0, timesteps passed as 1000 - t, :2336)."""
    import dataclasses

    from sdtpu.conditioning.conditioner import ZImageConditioner
    from sdtpu.diffusion.denoiser import DiscreteFlowDenoiser
    from sdtpu.models import llm as llm_mod
    from sdtpu.models import z_image as zi_mod

    if small:
        dit_cfg = zi_mod.ZImageConfig(
            hidden_size=48, in_channels=4, out_channels=4, num_layers=2,
            num_refiner_layers=1, head_dim=12, num_heads=4, num_kv_heads=2,
            multiple_of=16, cap_feat_dim=32, axes_dim=(4, 4, 4),
        )
        llm_cfg = dataclasses.replace(
            llm_mod.QWEN3_8B_CONFIG, num_layers=2, hidden_size=32,
            intermediate_size=64, num_heads=4, num_kv_heads=2, head_dim=8,
            vocab_size=256)
        vae_cfg = vae_mod.VAEConfig(
            base_channels=32, channel_mult=(1, 2, 2, 2), num_res_blocks=1,
            z_channels=4, scale_factor=0.3611, shift_factor=0.1159)
    else:
        d = params.get("diffusion")
        dit_cfg = (zi_mod.detect_z_image_config(
            d.keys(), {k: tuple(v.shape) for k, v in d.items()})
            if d else zi_mod.Z_IMAGE_CONFIG)
        llm = params.get("llm")
        llm_cfg = (llm_mod.detect_llm_config(
            llm.keys(), {k: tuple(v.shape) for k, v in llm.items()},
            arch="qwen3") if llm else llm_mod.QWEN3_8B_CONFIG)
        vae_cfg = vae_mod.FLUX_VAE_CONFIG

    dit_params = params.get("diffusion") or zi_mod.init_z_image_params(
        dit_cfg, seed, dtype=dtype)
    llm_params = params.get("llm") or llm_mod.init_llm_params(
        llm_cfg, seed + 3, dtype=dtype)
    vae_params = params.get("vae") or vae_mod.init_vae_params(
        vae_cfg, seed=seed, dtype=dtype)
    if small and llm_cfg.hidden_size != dit_cfg.cap_feat_dim:
        llm_cfg = dataclasses.replace(llm_cfg, hidden_size=dit_cfg.cap_feat_dim)
        llm_params = llm_mod.init_llm_params(llm_cfg, seed + 3, dtype=dtype)

    conditioner = ZImageConditioner(qwen_tokenizer, llm_params, llm_cfg)

    def diffusion_fn(p, x, t, ctx, y):
        # reference prepare_sample_timesteps: z-image consumes 1000 - t
        return zi_mod.z_image_forward(p, x, 1000.0 - t, ctx, cfg=dit_cfg)

    def vae_decode_fn(p, z):
        return vae_mod.vae_decode(p, z, vae_cfg)

    def vae_encode_fn(p, x, noise=None):
        return vae_mod.vae_encode(p, x, noise=noise, cfg=vae_cfg)

    return DiffusionPipeline(
        version=SDVersion.Z_IMAGE,
        diffusion_params=dit_params,
        diffusion_fn=diffusion_fn,
        conditioner=conditioner,
        vae_params=vae_params,
        vae_decode_fn=vae_decode_fn,
        vae_encode_fn=vae_encode_fn,
        denoiser=DiscreteFlowDenoiser(shift=3.0 if flow_shift is None else flow_shift),
        rng_type=rng_type,
        latent_channels=dit_cfg.in_channels,
        scale_factor=8,
        compute_dtype=dtype,
    )


def _create_lens_pipeline(params, rng_type, dtype, small, seed, flow_shift,
                          gptoss_tokenizer=None):
    """Lens (reference construction stable-diffusion.cpp:1249: GPT-OSS
    LLMEmbedder + LensRunner + FLUX.2 packed VAE; FLUX_FLOW_PRED with default
    shift 1.83, :1747)."""
    import dataclasses

    from sdtpu.conditioning.conditioner import LensConditioner
    from sdtpu.diffusion.denoiser import FluxFlowDenoiser
    from sdtpu.models import lens as lens_mod
    from sdtpu.models import llm as llm_mod

    if small:
        dit_cfg = lens_mod.LensConfig(
            in_channels=16, out_channels=4, num_layers=2, head_dim=8,
            num_heads=4, joint_attention_dim=16, selected_layer_count=2,
            axes_dim=(4, 2, 2),
        )
        llm_cfg = dataclasses.replace(
            llm_mod.GPT_OSS_20B_CONFIG, num_layers=2, hidden_size=16,
            intermediate_size=8, num_heads=2, num_kv_heads=1, head_dim=8,
            vocab_size=64, num_experts=4, num_experts_per_tok=2,
            sliding_attention=(4, 0))
        vae_cfg = vae_mod.VAEConfig(base_channels=32, channel_mult=(1, 2, 2, 2),
                                    num_res_blocks=1, z_channels=4,
                                    scale_factor=1.0)
        out_layers = (1, 2)
        pack_c = 4
    else:
        d = params.get("diffusion")
        dit_cfg = (lens_mod.detect_lens_config(
            d.keys(), {k: tuple(v.shape) for k, v in d.items()})
            if d else lens_mod.LENS_CONFIG)
        llm = params.get("llm")
        llm_cfg = (llm_mod.detect_llm_config(
            llm.keys(), {k: tuple(v.shape) for k, v in llm.items()},
            arch="gpt_oss_20b") if llm else llm_mod.GPT_OSS_20B_CONFIG)
        vae_cfg = vae_mod.FLUX2_VAE_CONFIG
        out_layers = (6, 12, 18, 24)
        pack_c = 32

    dit_params = params.get("diffusion") or lens_mod.init_lens_params(
        dit_cfg, seed, dtype=dtype)
    llm_params = params.get("llm") or llm_mod.init_llm_params(
        llm_cfg, seed + 3, dtype=dtype)
    vae_params = params.get("vae") or vae_mod.init_vae_params(
        vae_cfg, seed=seed, dtype=dtype)

    conditioner = LensConditioner(gptoss_tokenizer, llm_params, llm_cfg,
                                  out_layers=out_layers)

    def diffusion_fn(p, x, t, ctx, y):
        return lens_mod.lens_forward(p, x, t, ctx, cfg=dit_cfg)

    if small:
        # tiny config: plain 4-ch VAE with a 2x2 pack, no statistics
        def vae_decode_fn(p, z):
            return vae_mod.vae_decode(p, vae_mod.flux2_unpack(z), vae_cfg)

        def vae_encode_fn(p, x, noise=None):
            return vae_mod.flux2_pack(vae_mod.vae_encode(p, x, noise=noise, cfg=vae_cfg))
    else:
        def vae_decode_fn(p, z):
            return vae_mod.flux2_vae_decode(p, z, vae_cfg)

        def vae_encode_fn(p, x, noise=None):
            return vae_mod.flux2_vae_encode(p, x, noise=noise, cfg=vae_cfg)

    return DiffusionPipeline(
        version=SDVersion.LENS,
        diffusion_params=dit_params,
        diffusion_fn=diffusion_fn,
        conditioner=conditioner,
        vae_params=vae_params,
        vae_decode_fn=vae_decode_fn,
        vae_encode_fn=vae_encode_fn,
        denoiser=FluxFlowDenoiser(shift=1.83 if flow_shift is None else flow_shift),
        rng_type=rng_type,
        latent_channels=dit_cfg.in_channels,
        scale_factor=16,
        compute_dtype=dtype,
    )


def _create_ernie_pipeline(params, rng_type, dtype, small, seed, flow_shift,
                           mistral_tokenizer=None):
    """ERNIE-Image (reference construction stable-diffusion.cpp:1240-1262:
    Ministral LLMEmbedder + ErnieImageRunner + FLUX.2 packed VAE; FLOW_PRED
    with default shift 4.0, :1717)."""
    import dataclasses

    from sdtpu.conditioning.conditioner import ErnieImageConditioner
    from sdtpu.diffusion.denoiser import DiscreteFlowDenoiser
    from sdtpu.models import ernie_image as ei_mod
    from sdtpu.models import llm as llm_mod

    if small:
        dit_cfg = ei_mod.ErnieImageConfig(
            hidden_size=32, num_heads=4, num_layers=2, ffn_hidden_size=64,
            in_channels=16, out_channels=16, text_in_dim=24,
            axes_dim=(4, 2, 2))
        llm_cfg = dataclasses.replace(
            llm_mod.MINISTRAL_33B_CONFIG, num_layers=2, hidden_size=24,
            intermediate_size=48, num_heads=2, num_kv_heads=1, head_dim=8,
            vocab_size=64)
        vae_cfg = vae_mod.VAEConfig(base_channels=32, channel_mult=(1, 2, 2, 2),
                                    num_res_blocks=1, z_channels=4,
                                    scale_factor=1.0)
    else:
        d = params.get("diffusion")
        dit_cfg = (ei_mod.detect_ernie_config(
            d.keys(), {k: tuple(v.shape) for k, v in d.items()})
            if d else ei_mod.ERNIE_IMAGE_CONFIG)
        llm = params.get("llm")
        llm_cfg = (llm_mod.detect_llm_config(
            llm.keys(), {k: tuple(v.shape) for k, v in llm.items()},
            arch="ministral_3_3b") if llm else llm_mod.MINISTRAL_33B_CONFIG)
        vae_cfg = vae_mod.FLUX2_VAE_CONFIG

    dit_params = params.get("diffusion") or ei_mod.init_ernie_params(
        dit_cfg, seed, dtype=dtype)
    llm_params = params.get("llm") or llm_mod.init_llm_params(
        llm_cfg, seed + 3, dtype=dtype)
    vae_params = params.get("vae") or vae_mod.init_vae_params(
        vae_cfg, seed=seed, dtype=dtype)

    conditioner = ErnieImageConditioner(mistral_tokenizer, llm_params, llm_cfg)

    def diffusion_fn(p, x, t, ctx, y):
        return ei_mod.ernie_image_forward(p, x, t, ctx, cfg=dit_cfg)

    if small:
        def vae_decode_fn(p, z):
            return vae_mod.vae_decode(p, vae_mod.flux2_unpack(z), vae_cfg)

        def vae_encode_fn(p, x, noise=None):
            return vae_mod.flux2_pack(vae_mod.vae_encode(p, x, noise=noise, cfg=vae_cfg))
    else:
        def vae_decode_fn(p, z):
            return vae_mod.flux2_vae_decode(p, z, vae_cfg)

        def vae_encode_fn(p, x, noise=None):
            return vae_mod.flux2_vae_encode(p, x, noise=noise, cfg=vae_cfg)

    return DiffusionPipeline(
        version=SDVersion.ERNIE_IMAGE,
        diffusion_params=dit_params,
        diffusion_fn=diffusion_fn,
        conditioner=conditioner,
        vae_params=vae_params,
        vae_decode_fn=vae_decode_fn,
        vae_encode_fn=vae_encode_fn,
        denoiser=DiscreteFlowDenoiser(shift=4.0 if flow_shift is None else flow_shift),
        rng_type=rng_type,
        latent_channels=dit_cfg.in_channels,
        scale_factor=16,
        compute_dtype=dtype,
    )


def _create_ideogram4_pipeline(params, rng_type, dtype, small, seed, flow_shift,
                               qwen_tokenizer=None):
    """Ideogram4 (reference: Qwen3-VL 13-layer LLMEmbedder +
    Ideogram4Runner (+optional uncond transformer) + FLUX.2 packed VAE;
    FLOW_PRED with shift 1.0, timesteps 1000 - t)."""
    import dataclasses

    from sdtpu.conditioning.conditioner import Ideogram4Conditioner
    from sdtpu.diffusion.denoiser import DiscreteFlowDenoiser
    from sdtpu.models import ideogram4 as id4_mod
    from sdtpu.models import llm as llm_mod

    if small:
        dit_cfg = id4_mod.Ideogram4Config(
            emb_dim=32, num_layers=2, num_heads=4, intermediate_size=64,
            adaln_dim=16, in_channels=16, llm_features_dim=3 * 24,
            ae_channels=4, llm_layers=3, mrope_section=(2, 1, 1))
        llm_cfg = dataclasses.replace(
            llm_mod.QWEN3_8B_CONFIG, num_layers=2, hidden_size=24,
            intermediate_size=48, num_heads=2, num_kv_heads=1, head_dim=8,
            vocab_size=64)
        vae_cfg = vae_mod.VAEConfig(base_channels=32, channel_mult=(1, 2, 2, 2),
                                    num_res_blocks=1, z_channels=4,
                                    scale_factor=1.0)
        out_layers = (1, 2, 3)
    else:
        d = params.get("diffusion")
        dit_cfg = (id4_mod.detect_ideogram4_config(
            d.keys(), {k: tuple(v.shape) for k, v in d.items()})
            if d else id4_mod.IDEOGRAM4_CONFIG)
        llm = params.get("llm")
        llm_cfg = (llm_mod.detect_llm_config(
            llm.keys(), {k: tuple(v.shape) for k, v in llm.items()},
            arch="qwen3") if llm else llm_mod.QWEN3_8B_CONFIG)
        vae_cfg = vae_mod.FLUX2_VAE_CONFIG
        out_layers = None

    dit_params = params.get("diffusion") or id4_mod.init_ideogram4_params(
        dit_cfg, seed, dtype=dtype)
    llm_params = params.get("llm") or llm_mod.init_llm_params(
        llm_cfg, seed + 3, dtype=dtype)
    vae_params = params.get("vae") or vae_mod.init_vae_params(
        vae_cfg, seed=seed, dtype=dtype)

    conditioner = Ideogram4Conditioner(qwen_tokenizer, llm_params, llm_cfg,
                                       out_layers=out_layers)
    has_uncond = any(k.startswith("uncond.") for k in dit_params)

    def diffusion_fn(p, x, t, ctx, y):
        # timesteps enter as 1000 - t (prepare_sample_timesteps,
        # stable-diffusion.cpp:2336)
        return id4_mod.ideogram4_forward(p, x, 1000.0 - t, ctx, cfg=dit_cfg)

    if small:
        def vae_decode_fn(p, z):
            return vae_mod.vae_decode(p, vae_mod.flux2_unpack(z), vae_cfg)

        def vae_encode_fn(p, x, noise=None):
            return vae_mod.flux2_pack(vae_mod.vae_encode(p, x, noise=noise, cfg=vae_cfg))
    else:
        def vae_decode_fn(p, z):
            return vae_mod.flux2_vae_decode(p, z, vae_cfg)

        def vae_encode_fn(p, x, noise=None):
            return vae_mod.flux2_vae_encode(p, x, noise=noise, cfg=vae_cfg)

    return DiffusionPipeline(
        version=SDVersion.IDEOGRAM4,
        diffusion_params=dit_params,
        diffusion_fn=diffusion_fn,
        conditioner=conditioner,
        vae_params=vae_params,
        vae_decode_fn=vae_decode_fn,
        vae_encode_fn=vae_encode_fn,
        denoiser=DiscreteFlowDenoiser(shift=1.0 if flow_shift is None else flow_shift),
        rng_type=rng_type,
        latent_channels=dit_cfg.in_channels,
        scale_factor=16,
        compute_dtype=dtype,
    )


def _create_minit2i_pipeline(params, rng_type, dtype, small, seed, flow_shift,
                             t5_tokenizer=None):
    """MiniT2I (reference construction stable-diffusion.cpp:1196-1206:
    T5 MiniT2IConditioner + MiniT2IRunner + FakeVAE pixel passthrough;
    MINIT2I_FLOW_PRED with uniform sigmas and x0-prediction)."""
    from sdtpu.conditioning.conditioner import MiniT2IConditioner
    from sdtpu.diffusion.denoiser import MiniT2IFlowDenoiser
    from sdtpu.models import minit2i as mt_mod
    from sdtpu.models import t5 as t5_mod

    if small:
        dit_cfg = mt_mod.MiniT2IConfig(
            patch_size=4, txt_input_size=48, hidden_size=32,
            txt_hidden_size=32, cond_vec_size=32, depth_double=2,
            txt_preamble_depth=1, num_heads=4, head_dim=8, pca_channels=8,
            prompt_length=16)
        t5_cfg = t5_mod.T5Config(
            vocab_size=256, d_model=48, d_kv=8, d_ff=96, num_layers=2,
            num_heads=4)
        seq_len = 16
    else:
        d = params.get("diffusion")
        dit_cfg = (mt_mod.detect_minit2i_config(
            d.keys(), {k: tuple(v.shape) for k, v in d.items()})
            if d else mt_mod.MINIT2I_CONFIG)
        t5_cfg = (_detect_t5_config(params["t5"], t5_mod)
                  if params.get("t5") else t5_mod.T5_XXL_CONFIG)
        seq_len = dit_cfg.prompt_length

    dit_params = params.get("diffusion") or mt_mod.init_minit2i_params(
        dit_cfg, seed, dtype=dtype)
    t5_params = params.get("t5") or t5_mod.init_t5_params(t5_cfg, seed + 2,
                                                          dtype=dtype)

    conditioner = MiniT2IConditioner(t5_tokenizer, t5_params, t5_cfg,
                                     seq_len=seq_len)

    def diffusion_fn(p, x, t, ctx, y):
        return mt_mod.minit2i_forward(p, x, t, ctx, mask=y, cfg=dit_cfg)

    # pixel-space FakeVAE: identity decode/encode (reference FakeVAE,
    # src/model/vae/vae.hpp:234)
    def vae_decode_fn(p, z):
        return jnp.clip(z, -1.0, 1.0)

    def vae_encode_fn(p, x, noise=None):
        return x

    return DiffusionPipeline(
        version=SDVersion.MINIT2I,
        diffusion_params=dit_params,
        diffusion_fn=diffusion_fn,
        conditioner=conditioner,
        vae_params={},
        vae_decode_fn=vae_decode_fn,
        vae_encode_fn=vae_encode_fn,
        denoiser=MiniT2IFlowDenoiser(),
        rng_type=rng_type,
        latent_channels=dit_cfg.in_channels,
        scale_factor=1,
        compute_dtype=dtype,
    )


def _create_mage_flow_pipeline(params, rng_type, dtype, small, seed, flow_shift,
                               qwen_tokenizer=None):
    """Mage-Flow (reference MageFlowRunner, mage_flow.hpp:60): Qwen-Image DiT
    body with fixed config (patch 1, 128-ch latents, 12 layers, zero text
    RoPE ids, bf16-rounded timestep projection) + Qwen2.5-VL conditioner +
    the Mage DiCo VAE; FLOW_PRED with default shift 6.0."""
    import dataclasses

    from sdtpu.conditioning.conditioner import QwenImageConditioner
    from sdtpu.diffusion.denoiser import DiscreteFlowDenoiser
    from sdtpu.models import llm as llm_mod
    from sdtpu.models import mage_vae as mv_mod
    from sdtpu.models import qwen_image as qi_mod

    if small:
        dit_cfg = qi_mod.QwenImageConfig(
            patch_size=1, in_channels=128, out_channels=128, num_layers=2,
            head_dim=16, num_heads=4, joint_attention_dim=48,
            axes_dim=(4, 6, 6), rope_scheme="mage", bf16_timestep=True)
        llm_cfg = llm_mod.LLMConfig(
            num_layers=2, hidden_size=48, intermediate_size=96, num_heads=4,
            num_kv_heads=2, head_dim=12, vocab_size=256)
        vae_blocks = 2
    else:
        dit_cfg = qi_mod.QwenImageConfig(
            patch_size=1, in_channels=128, out_channels=128, num_layers=12,
            head_dim=128, num_heads=24, joint_attention_dim=2560,
            axes_dim=(16, 56, 56), rope_scheme="mage", bf16_timestep=True)
        d = params.get("diffusion")
        if d:
            det = qi_mod.detect_qwen_image_config(d.keys())
            dit_cfg = dataclasses.replace(dit_cfg, num_layers=det.num_layers)
        llm = params.get("llm")
        llm_cfg = (llm_mod.detect_llm_config(
            llm.keys(), {k: tuple(v.shape) for k, v in llm.items()})
            if llm else llm_mod.QWEN25_VL_7B_CONFIG)
        v = params.get("vae")
        vae_blocks = mv_mod.count_dico_blocks(v.keys()) if v else 21

    dit_params = params.get("diffusion") or qi_mod.init_qwen_image_params(
        dit_cfg, seed, dtype=dtype)
    llm_params = params.get("llm") or llm_mod.init_llm_params(
        llm_cfg, seed + 3, dtype=dtype)
    vae_params = params.get("vae") or mv_mod.init_mage_vae_params(
        seed=seed + 1, dtype=dtype, n_blocks=vae_blocks)

    vis_keys, vision_cfg = _extract_vision_tower(llm_params)
    # Mage-Flow edit uses "Image N:" markers and max 384px VLM refs
    # (reference conditioner.hpp:2215-2231)
    conditioner = QwenImageConditioner(
        qwen_tokenizer, llm_params, llm_cfg,
        vision_params=vis_keys or None, vision_cfg=vision_cfg,
        picture_word="Image")

    def diffusion_fn(p, x, t, ctx, y, **ex):
        refs = [ex[k] for k in sorted(k2 for k2 in ex if k2.startswith("ref_latent_"))]
        return qi_mod.qwen_image_forward(p, x, t, ctx, cfg=dit_cfg,
                                         ref_latents=refs or None)

    def vae_decode_fn(p, z):
        return jnp.clip(mv_mod.mage_vae_decode(p, z, n_blocks=vae_blocks), -1.0, 1.0)

    def vae_encode_fn(p, x, noise=None):
        return mv_mod.mage_vae_encode(p, x, noise=noise, n_blocks=vae_blocks)

    return DiffusionPipeline(
        version=SDVersion.MAGE_FLOW,
        diffusion_params=dit_params,
        diffusion_fn=diffusion_fn,
        conditioner=conditioner,
        vae_params=vae_params,
        vae_decode_fn=vae_decode_fn,
        vae_encode_fn=vae_encode_fn,
        denoiser=DiscreteFlowDenoiser(shift=6.0 if flow_shift is None else flow_shift),
        rng_type=rng_type,
        latent_channels=128,
        scale_factor=16,
        compute_dtype=dtype,
    )


def _create_anima_pipeline(params, rng_type, dtype, small, seed, flow_shift,
                           qwen_tokenizer=None, t5_tokenizer=None):
    """Anima (reference construction stable-diffusion.cpp:1207-1213:
    AnimaConditioner (Qwen3 + T5 ids through the LLM adapter) + AnimaRunner +
    Wan 2.1 VAE in image mode; FLOW_PRED default shift 3.0)."""
    import dataclasses

    from sdtpu.conditioning.conditioner import AnimaConditioner
    from sdtpu.diffusion.denoiser import DiscreteFlowDenoiser
    from sdtpu.models import anima as an_mod
    from sdtpu.models import llm as llm_mod
    from sdtpu.models import wan_vae as wan_vae_mod

    if small:
        dit_cfg = an_mod.AnimaConfig(
            in_channels=4, out_channels=4, hidden_size=32, text_embed_dim=24,
            num_heads=2, head_dim=16, num_layers=2, axes_dim=(6, 6, 4),
            adaln_lora_dim=8)
        llm_cfg = dataclasses.replace(
            llm_mod.QWEN3_8B_CONFIG, num_layers=2, hidden_size=24,
            intermediate_size=48, num_heads=2, num_kv_heads=1, head_dim=8,
            vocab_size=64)
        vae_cfg = wan_vae_mod.WanVAEConfig(dim=8, z_dim=4, num_res_blocks=1)
        adapter_kw = dict(adapter_layers=1, adapter_vocab=64, adapter_dim=24)
    else:
        d = params.get("diffusion")
        dit_cfg = (an_mod.detect_anima_config(
            d.keys(), {k: tuple(v.shape) for k, v in d.items()})
            if d else an_mod.ANIMA_CONFIG)
        llm = params.get("llm")
        llm_cfg = (llm_mod.detect_llm_config(
            llm.keys(), {k: tuple(v.shape) for k, v in llm.items()},
            arch="qwen3") if llm else llm_mod.QWEN3_8B_CONFIG)
        vae_cfg = (_detect_wan_vae_config(params["vae"], wan_vae_mod)
                   if params.get("vae") else wan_vae_mod.WAN21_VAE_CONFIG)
        adapter_kw = {}

    dit_params = params.get("diffusion") or an_mod.init_anima_params(
        dit_cfg, seed, dtype=dtype, **adapter_kw)
    llm_params = params.get("llm") or llm_mod.init_llm_params(
        llm_cfg, seed + 3, dtype=dtype)
    vae_params = params.get("vae") or wan_vae_mod.init_wan_vae_params(
        vae_cfg, seed=seed, dtype=dtype)

    conditioner = AnimaConditioner(qwen_tokenizer, t5_tokenizer, llm_params,
                                   llm_cfg, dit_params)

    def diffusion_fn(p, x, t, ctx, y):
        return an_mod.anima_forward(p, x, t, ctx, cfg=dit_cfg)

    use_stats = vae_cfg.z_dim == 16

    def vae_decode_fn(p, z):
        if use_stats:
            z = wan_vae_mod.diffusion_to_vae_latents(z)
        return wan_vae_mod.wan_vae_decode(p, z[:, None] if z.ndim == 4 else z,
                                          vae_cfg)[:, 0]

    def vae_encode_fn(p, x, noise=None):
        z = wan_vae_mod.wan_vae_encode(p, x[:, None], vae_cfg)[:, 0]
        if use_stats:
            z = wan_vae_mod.vae_to_diffusion_latents(z)
        return z

    return DiffusionPipeline(
        version=SDVersion.ANIMA,
        diffusion_params=dit_params,
        diffusion_fn=diffusion_fn,
        conditioner=conditioner,
        vae_params=vae_params,
        vae_decode_fn=vae_decode_fn,
        vae_encode_fn=vae_encode_fn,
        denoiser=DiscreteFlowDenoiser(shift=3.0 if flow_shift is None else flow_shift),
        rng_type=rng_type,
        latent_channels=dit_cfg.in_channels,
        scale_factor=8,
        compute_dtype=dtype,
    )


def _create_boogu_pipeline(params, rng_type, dtype, small, seed, flow_shift,
                           qwen_tokenizer=None):
    """Boogu-Image (reference construction stable-diffusion.cpp:1227-1239:
    Qwen3-VL LLMEmbedder + BooguImageRunner + flux 16-ch VAE; FLOW_PRED with
    default shift 3.16, timesteps t/1000)."""
    import dataclasses

    from sdtpu.conditioning.conditioner import BooguConditioner
    from sdtpu.diffusion.denoiser import DiscreteFlowDenoiser
    from sdtpu.models import boogu as bg_mod
    from sdtpu.models import llm as llm_mod

    if small:
        dit_cfg = bg_mod.BooguConfig(
            in_channels=4, out_channels=4, hidden_size=48, num_layers=2,
            num_double_stream_layers=1, num_refiner_layers=1, num_heads=4,
            num_kv_heads=2, head_dim=12, multiple_of=16,
            instruction_feat_dim=24, axes_dim=(4, 4, 4))
        llm_cfg = dataclasses.replace(
            llm_mod.QWEN3_8B_CONFIG, num_layers=2, hidden_size=24,
            intermediate_size=48, num_heads=2, num_kv_heads=1, head_dim=8,
            vocab_size=64)
        vae_cfg = vae_mod.VAEConfig(
            base_channels=32, channel_mult=(1, 2, 2, 2), num_res_blocks=1,
            z_channels=4, scale_factor=0.3611, shift_factor=0.1159)
    else:
        d = params.get("diffusion")
        dit_cfg = (bg_mod.detect_boogu_config(
            d.keys(), {k: tuple(v.shape) for k, v in d.items()})
            if d else bg_mod.BOOGU_CONFIG)
        llm = params.get("llm")
        llm_cfg = (llm_mod.detect_llm_config(
            llm.keys(), {k: tuple(v.shape) for k, v in llm.items()},
            arch="qwen3") if llm else llm_mod.QWEN3_8B_CONFIG)
        vae_cfg = vae_mod.FLUX_VAE_CONFIG

    dit_params = params.get("diffusion") or bg_mod.init_boogu_params(
        dit_cfg, seed, dtype=dtype)
    llm_params = params.get("llm") or llm_mod.init_llm_params(
        llm_cfg, seed + 3, dtype=dtype)
    vae_params = params.get("vae") or vae_mod.init_vae_params(
        vae_cfg, seed=seed, dtype=dtype)

    vis_keys, vision_cfg = _extract_vision_tower(llm_params)
    conditioner = BooguConditioner(qwen_tokenizer, llm_params, llm_cfg,
                                   vision_params=vis_keys,
                                   vision_cfg=vision_cfg)

    def diffusion_fn(p, x, t, ctx, y):
        # timesteps enter as t/1000 (prepare_sample_timesteps,
        # stable-diffusion.cpp:2330)
        return bg_mod.boogu_forward(p, x, t / 1000.0, ctx, cfg=dit_cfg)

    def vae_decode_fn(p, z):
        return vae_mod.vae_decode(p, z, vae_cfg)

    def vae_encode_fn(p, x, noise=None):
        return vae_mod.vae_encode(p, x, noise=noise, cfg=vae_cfg)

    return DiffusionPipeline(
        version=SDVersion.BOOGU_IMAGE,
        diffusion_params=dit_params,
        diffusion_fn=diffusion_fn,
        conditioner=conditioner,
        vae_params=vae_params,
        vae_decode_fn=vae_decode_fn,
        vae_encode_fn=vae_encode_fn,
        denoiser=DiscreteFlowDenoiser(shift=3.16 if flow_shift is None else flow_shift),
        rng_type=rng_type,
        latent_channels=dit_cfg.in_channels,
        scale_factor=8,
        compute_dtype=dtype,
    )


def _create_krea2_pipeline(params, rng_type, dtype, small, seed, flow_shift,
                           qwen_tokenizer=None):
    """Krea2 (reference: Qwen3-VL 12-layer LLMEmbedder + Krea2Runner + Wan 2.1
    VAE image mode; FLUX_FLOW_PRED with default shift 1.15)."""
    import dataclasses

    from sdtpu.conditioning.conditioner import Krea2Conditioner
    from sdtpu.diffusion.denoiser import FluxFlowDenoiser
    from sdtpu.models import krea2 as k2_mod
    from sdtpu.models import llm as llm_mod
    from sdtpu.models import wan_vae as wan_vae_mod

    if small:
        dit_cfg = k2_mod.Krea2Config(
            in_channels=4, out_channels=4, features=32, text_dim=24,
            text_layers=3, layers=2, heads=4, kv_heads=2, text_heads=4,
            text_kv_heads=2, mlp_multiplier=2)
        llm_cfg = dataclasses.replace(
            llm_mod.QWEN3_8B_CONFIG, num_layers=2, hidden_size=24,
            intermediate_size=48, num_heads=2, num_kv_heads=1, head_dim=8,
            vocab_size=64)
        vae_cfg = wan_vae_mod.WanVAEConfig(dim=8, z_dim=4, num_res_blocks=1)
        out_layers = (1, 2, 3)
    else:
        d = params.get("diffusion")
        dit_cfg = (k2_mod.detect_krea2_config(
            d.keys(), {k: tuple(v.shape) for k, v in d.items()})
            if d else k2_mod.KREA2_CONFIG)
        llm = params.get("llm")
        llm_cfg = (llm_mod.detect_llm_config(
            llm.keys(), {k: tuple(v.shape) for k, v in llm.items()},
            arch="qwen3") if llm else llm_mod.QWEN3_8B_CONFIG)
        vae_cfg = (_detect_wan_vae_config(params["vae"], wan_vae_mod)
                   if params.get("vae") else wan_vae_mod.WAN21_VAE_CONFIG)
        out_layers = None

    dit_params = params.get("diffusion") or k2_mod.init_krea2_params(
        dit_cfg, seed, dtype=dtype)
    llm_params = params.get("llm") or llm_mod.init_llm_params(
        llm_cfg, seed + 3, dtype=dtype)
    vae_params = params.get("vae") or wan_vae_mod.init_wan_vae_params(
        vae_cfg, seed=seed, dtype=dtype)

    vis_keys, vision_cfg = _extract_vision_tower(llm_params)
    conditioner = Krea2Conditioner(qwen_tokenizer, llm_params, llm_cfg,
                                   out_layers=out_layers,
                                   vision_params=vis_keys,
                                   vision_cfg=vision_cfg)

    def diffusion_fn(p, x, t, ctx, y):
        return k2_mod.krea2_forward(p, x, t, ctx, cfg=dit_cfg)

    use_stats = vae_cfg.z_dim == 16

    def vae_decode_fn(p, z):
        if use_stats:
            z = wan_vae_mod.diffusion_to_vae_latents(z)
        return wan_vae_mod.wan_vae_decode(p, z[:, None] if z.ndim == 4 else z,
                                          vae_cfg)[:, 0]

    def vae_encode_fn(p, x, noise=None):
        z = wan_vae_mod.wan_vae_encode(p, x[:, None], vae_cfg)[:, 0]
        if use_stats:
            z = wan_vae_mod.vae_to_diffusion_latents(z)
        return z

    return DiffusionPipeline(
        version=SDVersion.KREA2,
        diffusion_params=dit_params,
        diffusion_fn=diffusion_fn,
        conditioner=conditioner,
        vae_params=vae_params,
        vae_decode_fn=vae_decode_fn,
        vae_encode_fn=vae_encode_fn,
        denoiser=FluxFlowDenoiser(shift=1.15 if flow_shift is None else flow_shift),
        rng_type=rng_type,
        latent_channels=dit_cfg.in_channels,
        scale_factor=8,
        compute_dtype=dtype,
    )

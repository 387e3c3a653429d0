"""LTX-2 video VAE: a 3-D causal pixel-norm VAE with pixel-shuffle (4x4)
patchified IO, space<->depth up/downsampling, per-channel latent statistics,
and a timestep-conditioned decoder (decode_timestep=0.05).

Reference analog: LTXVAE::VideoVAE / LTXVideoVAE
(src/model/vae/ltx_vae.hpp:1052,1211).  Checkpoint names (relative to the VAE
prefix): ``encoder.conv_in.conv.*``, ``encoder.down_blocks.N.{res_blocks.M.
{conv1,conv2}.conv.*, conv.conv.*}``, ``encoder.conv_out.conv.*``,
``decoder.conv_in.conv.*``, ``decoder.up_blocks.N.{res_blocks.M.{conv1,conv2}
.conv.*, res_blocks.M.scale_shift_table, time_embedder.timestep_embedder.
linear_{1,2}.*, conv.conv.*}``, ``decoder.{timestep_scale_multiplier,
last_scale_shift_table, last_time_embedder.timestep_embedder.linear_{1,2}.*,
conv_out.conv.*}``, ``per_channel_statistics.{std-of-means,mean-of-means}``.

Layouts: channels-last video [B, T, H, W, C]; latent [B, Tl, Hl, Wl, 128]
with scale factors (8, 32, 32) — spatial 32 = patch 4 x depth-to-space 8;
temporal is causal: T = 8*(Tl-1)+1.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sdtpu.ops import linear, rms_norm, timestep_embedding
from sdtpu.ops.basic import matmul_precision, silu


# ------------------------------------------------------------------ primitives


def _causal_conv3d(x: jnp.ndarray, weight: jnp.ndarray,
                   bias: Optional[jnp.ndarray], causal: bool) -> jnp.ndarray:
    """x [B,T,H,W,C]; weight torch [O, I, kt, kh, kw].  Temporal padding is
    REPLICATE of the first frame (kt-1 frames, causal) or first/last frames
    ((kt-1)/2 each, non-causal) — reference LTXVAE::CausalConv3d
    (ltx_vae.hpp:84)."""
    kt, kh = weight.shape[2], weight.shape[3]
    if kt > 1:
        if causal:
            front = jnp.repeat(x[:, :1], kt - 1, axis=1)
            x = jnp.concatenate([front, x], axis=1)
        else:
            half = (kt - 1) // 2
            front = jnp.repeat(x[:, :1], half, axis=1)
            back = jnp.repeat(x[:, -1:], half, axis=1)
            x = jnp.concatenate([front, x, back], axis=1)
    sp = kh // 2
    kernel = jnp.transpose(weight, (2, 3, 4, 1, 0))  # DHWIO
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=(1, 1, 1),
        padding=((0, 0), (sp, sp), (sp, sp)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x.dtype,
        precision=matmul_precision(x.dtype),
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def _pixel_norm(x: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Channel RMS norm, no affine (PixelNorm3D, ltx_vae.hpp:198)."""
    return rms_norm(x, eps=eps)


def ltx_patchify(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """[B,T,H*p,W*p,C] -> [B,T,H,W,C*p*p], channel order (c, w_off, h_off)
    (WAN::WanVAE::patchify, wan_vae.hpp:1075)."""
    if p == 1:
        return x
    b, t, hp, wp, c = x.shape
    h, w = hp // p, wp // p
    y = x.reshape(b, t, h, p, w, p, c)          # [B,T,H,q,W,r,C]
    y = y.transpose(0, 1, 2, 4, 6, 5, 3)         # [B,T,H,W,C,r,q]
    return y.reshape(b, t, h, w, c * p * p)


def ltx_unpatchify(x: jnp.ndarray, p: int) -> jnp.ndarray:
    if p == 1:
        return x
    b, t, h, w, cpp = x.shape
    c = cpp // (p * p)
    y = x.reshape(b, t, h, w, c, p, p)
    y = y.transpose(0, 1, 2, 6, 3, 5, 4)         # [B,T,H,q,W,r,C]
    return y.reshape(b, t, h * p, w * p, c)


def _depth_to_space_3d(x: jnp.ndarray, c_out: int, ft: int, fs: int,
                       drop_first: bool) -> jnp.ndarray:
    """rearrange 'b t h w (c p1 p2 p3) -> b (t p1) (h p2) (w p3) c'
    (depth_to_space_3d, ltx_vae.hpp:49); optionally drop the first
    (duplicated) temporal frame."""
    b, t, h, w, _ = x.shape
    y = x.reshape(b, t, h, w, c_out, ft, fs, fs)
    y = y.transpose(0, 1, 5, 2, 6, 3, 7, 4)      # [B,T,p1,H,p2,W,p3,C]
    y = y.reshape(b, t * ft, h * fs, w * fs, c_out)
    if drop_first and ft > 1 and y.shape[1] > 0:
        y = y[:, 1:]
    return y


def _avg_down_3d(x: jnp.ndarray, out_c: int, ft: int, fs: int) -> jnp.ndarray:
    """Space-to-depth + grouped channel mean (WAN::AvgDown3D,
    wan_vae.hpp:257).  T is front-zero-padded to a multiple of ft."""
    b, t, h, w, c = x.shape
    pad_t = (ft - t % ft) % ft
    if pad_t:
        x = jnp.concatenate(
            [jnp.zeros((b, pad_t, h, w, c), x.dtype), x], axis=1)
        t += pad_t
    y = x.reshape(b, t // ft, ft, h // fs, fs, w // fs, fs, c)
    y = y.transpose(0, 1, 3, 5, 7, 2, 4, 6)      # [B,T',H',W',C,ft,fsh,fsw]
    y = y.reshape(b, t // ft, h // fs, w // fs, c * ft * fs * fs)
    group = (c * ft * fs * fs) // out_c
    y = y.reshape(*y.shape[:-1], out_c, group)
    return y.mean(axis=-1)


def _time_embedder(p, pre: str, t: jnp.ndarray, dim_hint: int) -> jnp.ndarray:
    """TimestepEmbedder (ltxv.hpp:548) reused by the VAE: sinusoid(256) ->
    linear/silu/linear. t: [N] -> [N, dim]."""
    emb = timestep_embedding(t, 256)
    h = linear(emb, p[f"{pre}.linear_1.weight"], p[f"{pre}.linear_1.bias"])
    return linear(silu(h), p[f"{pre}.linear_2.weight"], p[f"{pre}.linear_2.bias"])


# ------------------------------------------------------------------ config


@dataclasses.dataclass(frozen=True)
class LTXVAEBlock:
    type: str           # res_x | compress_all | compress_space | compress_time
    num_layers: int = 0
    multiplier: int = 1


@dataclasses.dataclass(frozen=True)
class LTXVAEConfig:
    patch_size: int = 4
    latent_channels: int = 128
    timestep_conditioning: bool = True
    decode_timestep: float = 0.05
    encoder_blocks: Tuple[LTXVAEBlock, ...] = ()
    decoder_blocks: Tuple[LTXVAEBlock, ...] = ()


# LTX-2 default encoder layout (get_default_encoder_config, ltx_vae.hpp:753)
LTX2_ENCODER_BLOCKS = (
    LTXVAEBlock("res_x", 4), LTXVAEBlock("compress_space_res", 0, 2),
    LTXVAEBlock("res_x", 6), LTXVAEBlock("compress_time_res", 0, 2),
    LTXVAEBlock("res_x", 6), LTXVAEBlock("compress_all_res", 0, 2),
    LTXVAEBlock("res_x", 2), LTXVAEBlock("compress_all_res", 0, 2),
    LTXVAEBlock("res_x", 2),
)


def detect_ltx_vae_config(names, shapes) -> LTXVAEConfig:
    """Block layout from checkpoint shapes (infer_{decoder,encoder}_config_
    from_weights, ltx_vae.hpp:593,661).  shapes are torch-order; conv bias
    shape [O]."""
    names = set(names)

    def bias_ch(n):
        s = shapes.get(n)
        return s[0] if s else 0

    def infer(side: str, is_decoder: bool) -> List[LTXVAEBlock]:
        blocks: List[LTXVAEBlock] = []
        current = bias_ch(f"{side}.conv_in.conv.bias")
        idx = 0
        while True:
            bp = f"{side}.{'up_blocks' if is_decoder else 'down_blocks'}.{idx}"
            res0 = f"{bp}.res_blocks.0.conv1.conv.bias"
            convb = f"{bp}.conv.conv.bias"
            if res0 in names:
                n = 0
                while f"{bp}.res_blocks.{n}.conv1.conv.bias" in names:
                    n += 1
                blocks.append(LTXVAEBlock("res_x", n))
                current = bias_ch(res0) or current
                idx += 1
                continue
            if convb not in names:
                break
            conv_ch = bias_ch(convb)
            nxt = 0
            j = idx + 1
            while True:
                nres = f"{side}.{'up_blocks' if is_decoder else 'down_blocks'}.{j}.res_blocks.0.conv1.conv.bias"
                nconv = f"{side}.{'up_blocks' if is_decoder else 'down_blocks'}.{j}.conv.conv.bias"
                if nres in names:
                    nxt = bias_ch(nres)
                    break
                if nconv not in names:
                    break
                j += 1
            if is_decoder:
                if nxt <= 0 or current % nxt != 0:
                    nxt = max(1, current // 2)
                mult = max(1, current // nxt)
                factor = conv_ch // nxt if nxt else 0
                kind = {8: "compress_all", 4: "compress_space",
                        2: "compress_time"}.get(factor, "compress_all")
                blocks.append(LTXVAEBlock(kind, 0, mult))
                current = nxt
            else:
                mult = (nxt // current
                        if current > 0 and nxt > 0 and nxt % current == 0 else 1)
                factor = (nxt // conv_ch
                          if conv_ch > 0 and nxt > 0 and nxt % conv_ch == 0 else 0)
                kind = {8: "compress_all_res", 4: "compress_space_res",
                        2: "compress_time_res"}.get(factor, "compress_all_res")
                blocks.append(LTXVAEBlock(kind, 0, max(1, mult)))
                current = nxt if nxt > 0 else current * mult
            idx += 1
        return blocks

    enc = infer("encoder", False) if "encoder.conv_in.conv.bias" in names else []
    dec = infer("decoder", True)
    ts_cond = "decoder.timestep_scale_multiplier" in names
    return LTXVAEConfig(
        encoder_blocks=tuple(enc) or (LTX2_ENCODER_BLOCKS if enc == [] and
                                      "encoder.conv_in.conv.bias" in names else ()),
        decoder_blocks=tuple(dec),
        timestep_conditioning=ts_cond,
    )


_FACTORS = {
    "compress_all": (2, 2), "compress_time": (2, 1), "compress_space": (1, 2),
    "compress_all_res": (2, 2), "compress_time_res": (2, 1),
    "compress_space_res": (1, 2),
}


# ------------------------------------------------------------------ blocks


def _resblock3d(p, pre: str, x, t_embed: Optional[jnp.ndarray], causal: bool):
    """ResnetBlock3D (ltx_vae.hpp:226): pixel-norm -> (scale/shift) -> silu ->
    causal conv, twice, residual.  scale_shift_table [4, C] + t_embed
    [B, 4*C]."""
    shift1 = scale1 = shift2 = scale2 = None
    if t_embed is not None and f"{pre}.scale_shift_table" in p:
        c = p[f"{pre}.scale_shift_table"].shape[1]
        vals = (p[f"{pre}.scale_shift_table"][None].astype(x.dtype)
                + t_embed.reshape(-1, 4, c).astype(x.dtype))
        mods = vals[:, :, None, None, None, :]  # [B, 4, 1, 1, 1, C]
        shift1, scale1, shift2, scale2 = (mods[:, 0], mods[:, 1],
                                          mods[:, 2], mods[:, 3])
    h = _pixel_norm(x, 1e-6)
    if scale1 is not None:
        h = h * (1.0 + scale1) + shift1
    h = _causal_conv3d(silu(h), p[f"{pre}.conv1.conv.weight"],
                       p[f"{pre}.conv1.conv.bias"], causal)
    h = _pixel_norm(h, 1e-6)
    if scale2 is not None:
        h = h * (1.0 + scale2) + shift2
    h = _causal_conv3d(silu(h), p[f"{pre}.conv2.conv.weight"],
                       p[f"{pre}.conv2.conv.bias"], causal)
    return x + h


def _mid_block(p, pre: str, x, num_layers: int, scaled_t, causal: bool):
    """UNetMidBlock3D (ltx_vae.hpp:339)."""
    t_embed = None
    if scaled_t is not None and \
            f"{pre}.time_embedder.timestep_embedder.linear_1.weight" in p:
        t_embed = _time_embedder(
            p, f"{pre}.time_embedder.timestep_embedder", scaled_t, 0)
    for i in range(num_layers):
        x = _resblock3d(p, f"{pre}.res_blocks.{i}", x, t_embed, causal)
    return x


def _upsample(p, pre: str, x, mult: int, ft: int, fs: int, causal: bool):
    """DepthToSpaceUpsample (ltx_vae.hpp:398), residual variant."""
    c_in = x.shape[-1]
    factor = ft * fs * fs
    drop = ft > 1
    res = _depth_to_space_3d(x, c_in // factor, ft, fs, drop)
    repeat = factor // mult
    res = jnp.tile(res, (1, 1, 1, 1, repeat))
    h = _causal_conv3d(x, p[f"{pre}.conv.conv.weight"],
                       p[f"{pre}.conv.conv.bias"], causal)
    h = _depth_to_space_3d(h, c_in // mult, ft, fs, drop)
    return h + res


def _downsample(p, pre: str, x, out_c: int, ft: int, fs: int, causal: bool):
    """SpaceToDepthDownsample (ltx_vae.hpp:479)."""
    if ft > 1:
        front = jnp.repeat(x[:, :1], ft - 1, axis=1)
        x = jnp.concatenate([front, x], axis=1)
    residual = _avg_down_3d(x, out_c, ft, fs)
    factor = ft * fs * fs
    h = _causal_conv3d(x, p[f"{pre}.conv.conv.weight"],
                       p[f"{pre}.conv.conv.bias"], causal)
    h = _avg_down_3d(h, out_c, ft, fs)
    return h + residual


# ------------------------------------------------------------------ API


def ltx_vae_normalize(p, z: jnp.ndarray) -> jnp.ndarray:
    """(z - mean) / std, channels-last (PerChannelStatistics::normalize)."""
    mean = p["per_channel_statistics.mean-of-means"].astype(z.dtype)
    std = p["per_channel_statistics.std-of-means"].astype(z.dtype)
    return (z - mean) / std


def ltx_vae_un_normalize(p, z: jnp.ndarray) -> jnp.ndarray:
    mean = p["per_channel_statistics.mean-of-means"].astype(z.dtype)
    std = p["per_channel_statistics.std-of-means"].astype(z.dtype)
    return z * std + mean


def ltx_vae_decode(p, z: jnp.ndarray, cfg: LTXVAEConfig) -> jnp.ndarray:
    """z: [B, Tl, Hl, Wl, 128] normalized latent -> [B, T, H, W, 3] pixels
    in [-1, 1] (LTXVAE::VideoVAE::decode + Decoder::forward,
    ltx_vae.hpp:1086,951)."""
    causal = False  # causal_decoder=false for all shipped LTX decoders
    x = ltx_vae_un_normalize(p, z)
    scaled_t = None
    if cfg.timestep_conditioning:
        mult = p["decoder.timestep_scale_multiplier"].reshape(()).astype(jnp.float32)
        scaled_t = jnp.full((z.shape[0],), cfg.decode_timestep,
                            dtype=jnp.float32) * mult

    x = _causal_conv3d(x, p["decoder.conv_in.conv.weight"],
                       p["decoder.conv_in.conv.bias"], causal)
    for i, blk in enumerate(cfg.decoder_blocks):
        pre = f"decoder.up_blocks.{i}"
        if blk.type == "res_x":
            x = _mid_block(p, pre, x, blk.num_layers, scaled_t, causal)
        else:
            ft, fs = _FACTORS[blk.type]
            x = _upsample(p, pre, x, blk.multiplier, ft, fs, causal)

    x = _pixel_norm(x, 1e-8)
    if cfg.timestep_conditioning:
        emb = _time_embedder(p, "decoder.last_time_embedder.timestep_embedder",
                             scaled_t, 0)
        c = p["decoder.last_scale_shift_table"].shape[1]
        vals = (p["decoder.last_scale_shift_table"][None].astype(x.dtype)
                + emb.reshape(-1, 2, c).astype(x.dtype))
        shift = vals[:, 0][:, None, None, None, :]
        scale = vals[:, 1][:, None, None, None, :]
        x = x * (1.0 + scale) + shift
    x = _causal_conv3d(silu(x), p["decoder.conv_out.conv.weight"],
                       p["decoder.conv_out.conv.bias"], causal)
    return ltx_unpatchify(x, cfg.patch_size)


def ltx_vae_encode(p, x: jnp.ndarray, cfg: LTXVAEConfig) -> jnp.ndarray:
    """x: [B, T, H, W, 3] pixels -> normalized latent [B, Tl, Hl, Wl, 128]
    (LTXVAE::VideoVAE::encode, ltx_vae.hpp:1183).  T is cropped to 8k+1."""
    t = x.shape[1]
    # crop T to (factor*k + 1); the reference hardcodes 8 (ltx_vae.hpp:1444)
    # because every shipped encoder has three temporal x2 stages.
    tf = 1
    for blk in cfg.encoder_blocks:
        if blk.type != "res_x":
            tf *= _FACTORS[blk.type][0]
    crop_t = max(1, 1 + (t - 1) // tf * tf)
    x = x[:, :crop_t]
    x = ltx_patchify(x, cfg.patch_size)
    x = _causal_conv3d(x, p["encoder.conv_in.conv.weight"],
                       p["encoder.conv_in.conv.bias"], True)
    for i, blk in enumerate(cfg.encoder_blocks):
        pre = f"encoder.down_blocks.{i}"
        if blk.type == "res_x":
            x = _mid_block(p, pre, x, blk.num_layers, None, True)
        else:
            ft, fs = _FACTORS[blk.type]
            x = _downsample(p, pre, x, x.shape[-1] * blk.multiplier, ft, fs, True)
    x = _pixel_norm(x, 1e-8)
    x = _causal_conv3d(silu(x), p["encoder.conv_out.conv.weight"],
                       p["encoder.conv_out.conv.bias"], True)
    mean = x[..., : cfg.latent_channels]
    return ltx_vae_normalize(p, mean)


# ------------------------------------------------------------------ init


def init_ltx_vae_params(cfg: LTXVAEConfig, channels: int = 32, seed: int = 0,
                        dtype=jnp.float32) -> dict:
    """Random checkpoint-shaped params (tests).  `channels` is the decoder
    conv_in output width; encoder starts at the narrow end."""
    g = np.random.default_rng(seed)

    def w(*shape, scale=0.05):
        return jnp.asarray(g.standard_normal(shape, dtype=np.float32) * scale,
                           dtype=dtype)

    def conv(p, pre, o, i, k=3):
        p[f"{pre}.conv.weight"] = w(o, i, k, k, k, scale=0.05 / k)
        p[f"{pre}.conv.bias"] = jnp.zeros((o,), dtype=dtype)

    def temb(p, pre, dim):
        p[f"{pre}.linear_1.weight"] = w(dim, 256)
        p[f"{pre}.linear_1.bias"] = jnp.zeros((dim,), dtype=dtype)
        p[f"{pre}.linear_2.weight"] = w(dim, dim)
        p[f"{pre}.linear_2.bias"] = jnp.zeros((dim,), dtype=dtype)

    p: dict = {}
    lc = cfg.latent_channels
    p["per_channel_statistics.mean-of-means"] = jnp.zeros((lc,), dtype=dtype)
    p["per_channel_statistics.std-of-means"] = jnp.ones((lc,), dtype=dtype)

    # decoder
    ch = channels
    conv(p, "decoder.conv_in", ch, lc)
    for i, blk in enumerate(cfg.decoder_blocks):
        pre = f"decoder.up_blocks.{i}"
        if blk.type == "res_x":
            for j in range(blk.num_layers):
                conv(p, f"{pre}.res_blocks.{j}.conv1", ch, ch)
                conv(p, f"{pre}.res_blocks.{j}.conv2", ch, ch)
                if cfg.timestep_conditioning:
                    p[f"{pre}.res_blocks.{j}.scale_shift_table"] = w(4, ch, scale=0.1)
            if cfg.timestep_conditioning:
                temb(p, f"{pre}.time_embedder.timestep_embedder", ch * 4)
        else:
            ft, fs = _FACTORS[blk.type]
            conv(p, f"{pre}.conv", ch * ft * fs * fs // blk.multiplier, ch)
            ch //= blk.multiplier
    if cfg.timestep_conditioning:
        p["decoder.timestep_scale_multiplier"] = jnp.asarray([1000.0], dtype=dtype)
        p["decoder.last_scale_shift_table"] = w(2, ch, scale=0.1)
        temb(p, "decoder.last_time_embedder.timestep_embedder", ch * 2)
    conv(p, "decoder.conv_out", 3 * cfg.patch_size**2, ch)

    # encoder
    if cfg.encoder_blocks:
        # derive start width so that the end width matches the decoder start
        cur = channels
        for blk in reversed(cfg.encoder_blocks):
            if blk.type != "res_x":
                cur //= blk.multiplier
        conv(p, "encoder.conv_in", cur, 3 * cfg.patch_size**2)
        for i, blk in enumerate(cfg.encoder_blocks):
            pre = f"encoder.down_blocks.{i}"
            if blk.type == "res_x":
                for j in range(blk.num_layers):
                    conv(p, f"{pre}.res_blocks.{j}.conv1", cur, cur)
                    conv(p, f"{pre}.res_blocks.{j}.conv2", cur, cur)
            else:
                ft, fs = _FACTORS[blk.type]
                nxt = cur * blk.multiplier
                conv(p, f"{pre}.conv", nxt // (ft * fs * fs), cur)
                cur = nxt
        conv(p, "encoder.conv_out", lc + 1, cur)
    return p

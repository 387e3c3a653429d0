"""SD UNet backbone (SD1.x / SD2.x / SDXL families) as a pure JAX function.

Reference analog: UNetModelRunner (src/model/diffusion/unet.hpp:748).  This is
a ground-up functional implementation: NHWC activations for TPU convs, params
in a flat dict keyed by original CompVis checkpoint names
(``input_blocks.N.M.…``, ``middle_block.…``, ``output_blocks.…``,
``time_embed.…``, ``label_emb.…``, ``out.…``) so loaders map 1:1.

Structure (CompVis openaimodel semantics):
  time_embed: Linear→SiLU→Linear on the sinusoidal timestep embedding
  label_emb (SDXL): same MLP on pooled+size/crop vector (adm_in_channels)
  input blocks: conv stem, then per level {ResBlock [+SpatialTransformer]}×n,
    strided-conv Downsample between levels
  middle: ResBlock, SpatialTransformer, ResBlock
  output blocks: mirrored with skip concatenation, nearest-2x Upsample
  out: GroupNorm→SiLU→conv
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp

from sdtpu.ops import attention, conv2d, gelu, group_norm, linear, timestep_embedding
from sdtpu.ops.basic import silu


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    model_channels: int = 320
    num_res_blocks: int = 2
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    attention_resolutions: Tuple[int, ...] = (1, 2, 4)  # ds values with attention
    transformer_depth: Tuple[int, ...] = (1, 1, 1, 1)  # per level
    context_dim: int = 768
    num_heads: Optional[int] = 8
    num_head_channels: Optional[int] = None
    use_linear_in_transformer: bool = False
    adm_in_channels: Optional[int] = None  # SDXL conditioning vector
    svd: bool = False  # spatial-video: VideoResBlock + SpatialVideoTransformer
    # distilled tiny UNets (SD-Turbo tiny / SDXS; reference unet.hpp:72-78):
    # one resblock per level, 3 levels, NO middle block, and the original
    # SD block numbering kept with holes (input_blocks 1,4,7; upsamples at
    # shifted output indices)
    tiny_unet: bool = False
    # SDXS-0.9 quirk: the 320-wide attention runs as 1 head × 320 instead of
    # 5 × 64 (reference unet.hpp:360-363)
    sdxs09_wide_head: bool = False


SD1_UNET_CONFIG = UNetConfig()
SD1_INPAINT_UNET_CONFIG = dataclasses.replace(SD1_UNET_CONFIG, in_channels=9)
SD2_UNET_CONFIG = UNetConfig(
    context_dim=1024, num_heads=None, num_head_channels=64, use_linear_in_transformer=True
)
SD2_INPAINT_UNET_CONFIG = dataclasses.replace(SD2_UNET_CONFIG, in_channels=9)
SDXL_UNET_CONFIG = UNetConfig(
    channel_mult=(1, 2, 4),
    attention_resolutions=(2, 4),
    transformer_depth=(0, 2, 10),
    context_dim=2048,
    num_heads=None,
    num_head_channels=64,
    use_linear_in_transformer=True,
    adm_in_channels=2816,
)
SDXL_INPAINT_UNET_CONFIG = dataclasses.replace(SDXL_UNET_CONFIG, in_channels=9)
SD1_TINY_UNET_CONFIG = dataclasses.replace(
    SD1_UNET_CONFIG, num_res_blocks=1, channel_mult=(1, 2, 4),
    transformer_depth=(1, 1, 1), tiny_unet=True,
)
SDXS_512_UNET_CONFIG = dataclasses.replace(
    SD1_TINY_UNET_CONFIG, attention_resolutions=(2, 4),
)
SD2_TINY_UNET_CONFIG = dataclasses.replace(
    SD2_UNET_CONFIG, num_res_blocks=1, channel_mult=(1, 2, 4),
    transformer_depth=(1, 1, 1), tiny_unet=True,
)
SDXS_09_UNET_CONFIG = dataclasses.replace(
    SD2_TINY_UNET_CONFIG, sdxs09_wide_head=True,
)
# SSD-1B / Vega prune transformer depth; configs detected from weights later.
SDXL_SSD1B_UNET_CONFIG = dataclasses.replace(SDXL_UNET_CONFIG, transformer_depth=(0, 2, 4))
SDXL_VEGA_UNET_CONFIG = dataclasses.replace(SDXL_UNET_CONFIG, transformer_depth=(0, 1, 2))
# Stable Video Diffusion: 4ch latent + 4ch first-frame concat, CLIP-vision
# context, 768-dim (fps, motion bucket, aug) label vector
# (reference unet.hpp:58-66)
SVD_UNET_CONFIG = UNetConfig(
    in_channels=8, out_channels=4, context_dim=1024, num_heads=None,
    num_head_channels=64, use_linear_in_transformer=True,
    adm_in_channels=768, svd=True,
)


def _heads_for(cfg: UNetConfig, ch: int) -> int:
    if cfg.num_head_channels is not None:
        n = ch // cfg.num_head_channels
        if cfg.sdxs09_wide_head and n == 5:
            # SDXS-0.9: 5×64 runs as 1×320 (reference unet.hpp:360-363)
            return 1
        return n
    return cfg.num_heads or 8


def resblock(p, pre: str, x: jnp.ndarray, emb: jnp.ndarray) -> jnp.ndarray:
    """CompVis ResBlock: GN→SiLU→conv, +time-emb, GN→SiLU→conv, skip."""
    out_ch = p[f"{pre}.out_layers.3.weight"].shape[0]
    h = group_norm(x, p[f"{pre}.in_layers.0.weight"], p[f"{pre}.in_layers.0.bias"], eps=1e-5)
    h = silu(h)
    h = conv2d(h, p[f"{pre}.in_layers.2.weight"], p[f"{pre}.in_layers.2.bias"])
    emb_out = linear(silu(emb), p[f"{pre}.emb_layers.1.weight"], p[f"{pre}.emb_layers.1.bias"])
    h = h + emb_out[:, None, None, :].astype(h.dtype)
    h = group_norm(h, p[f"{pre}.out_layers.0.weight"], p[f"{pre}.out_layers.0.bias"], eps=1e-5)
    h = silu(h)
    h = conv2d(h, p[f"{pre}.out_layers.3.weight"], p[f"{pre}.out_layers.3.bias"])
    if x.shape[-1] != out_ch:
        x = conv2d(x, p[f"{pre}.skip_connection.weight"], p[f"{pre}.skip_connection.bias"], padding=0)
    return x + h


def _alpha_mix(p, pre: str, spatial: jnp.ndarray, temporal: jnp.ndarray) -> jnp.ndarray:
    """AlphaBlender (reference block.hpp:580): sigmoid(mix_factor) weights the
    spatial branch."""
    a = jnp.asarray(jax_sigmoid(p[f"{pre}.mix_factor"].astype(jnp.float32)),
                    dtype=spatial.dtype)
    return spatial * a + temporal * (1.0 - a)


def jax_sigmoid(x):
    import jax

    return jax.nn.sigmoid(x)


def _temporal_conv(x: jnp.ndarray, w5, b) -> jnp.ndarray:
    """Conv over the FRAME axis only (kernel (3,1,1), reference ResBlock
    conv_nd dims=3, block.hpp:84-85).  x: [B, T, S, C]; w5: [out,in,3,1,1]."""
    w4 = w5.reshape(w5.shape[0], w5.shape[1], w5.shape[2], 1)
    return conv2d(x, w4, b, padding=((w5.shape[2] // 2, w5.shape[2] // 2), (0, 0)))


def temporal_resblock(p, pre: str, x: jnp.ndarray, emb: jnp.ndarray) -> jnp.ndarray:
    """SVD time_stack ResBlock on [B, T, S, C] (spatial flattened): GN→SiLU→
    temporal conv, +emb per frame, GN→SiLU→temporal conv (reference
    VideoResBlock.time_stack, block.hpp:615-662)."""
    h = group_norm(x, p[f"{pre}.in_layers.0.weight"], p[f"{pre}.in_layers.0.bias"], eps=1e-5)
    h = silu(h)
    h = _temporal_conv(h, p[f"{pre}.in_layers.2.weight"], p[f"{pre}.in_layers.2.bias"])
    emb_out = linear(silu(emb), p[f"{pre}.emb_layers.1.weight"], p[f"{pre}.emb_layers.1.bias"])
    h = h + emb_out[:, :, None, :].astype(h.dtype)  # [B,T,1,C]
    h = group_norm(h, p[f"{pre}.out_layers.0.weight"], p[f"{pre}.out_layers.0.bias"], eps=1e-5)
    h = silu(h)
    h = _temporal_conv(h, p[f"{pre}.out_layers.3.weight"], p[f"{pre}.out_layers.3.bias"])
    return x + h


def video_resblock(p, pre: str, x: jnp.ndarray, emb: jnp.ndarray,
                   num_frames: int) -> jnp.ndarray:
    """Spatial ResBlock + alpha-blended temporal ResBlock (reference
    VideoResBlock, block.hpp:615).  x: [B*T, H, W, C] (frames in batch)."""
    x = resblock(p, pre, x, emb)
    bt, hh, ww, c = x.shape
    b = bt // num_frames
    x4 = x.reshape(b, num_frames, hh * ww, c)
    emb4 = emb.reshape(b, num_frames, emb.shape[-1])
    mixed = temporal_resblock(p, f"{pre}.time_stack", x4, emb4)
    x4 = _alpha_mix(p, f"{pre}.time_mixer", x4, mixed)
    return x4.reshape(bt, hh, ww, c)


def cross_attention(
    p, pre: str, x: jnp.ndarray, context: Optional[jnp.ndarray], num_heads: int,
    ip_context: Optional[jnp.ndarray] = None, ip_scale: float = 1.0,
) -> jnp.ndarray:
    """attn1 (self, context=None) / attn2 (cross). to_q/k/v have no bias.

    IP-Adapter decoupled cross-attention fires when the block carries
    to_k_ip/to_v_ip weights and ip_context (image tokens) is given
    (reference unet.hpp:779-857)."""
    b, l, c = x.shape
    ctx = x if context is None else context
    d = c // num_heads
    q = linear(x, p[f"{pre}.to_q.weight"]).reshape(b, l, num_heads, d).transpose(0, 2, 1, 3)
    k = (
        linear(ctx, p[f"{pre}.to_k.weight"])
        .reshape(b, ctx.shape[1], num_heads, d)
        .transpose(0, 2, 1, 3)
    )
    v = (
        linear(ctx, p[f"{pre}.to_v.weight"])
        .reshape(b, ctx.shape[1], num_heads, d)
        .transpose(0, 2, 1, 3)
    )
    o = attention(q, k, v)
    if ip_context is not None and f"{pre}.to_k_ip.weight" in p:
        li = ip_context.shape[1]
        k_ip = (
            linear(ip_context, p[f"{pre}.to_k_ip.weight"])
            .reshape(b, li, num_heads, d)
            .transpose(0, 2, 1, 3)
        )
        v_ip = (
            linear(ip_context, p[f"{pre}.to_v_ip.weight"])
            .reshape(b, li, num_heads, d)
            .transpose(0, 2, 1, 3)
        )
        o = o + attention(q, k_ip, v_ip) * ip_scale
    o = o.transpose(0, 2, 1, 3).reshape(b, l, c)
    return linear(o, p[f"{pre}.to_out.0.weight"], p[f"{pre}.to_out.0.bias"])


def geglu_ff(p, pre: str, x: jnp.ndarray) -> jnp.ndarray:
    h = linear(x, p[f"{pre}.net.0.proj.weight"], p[f"{pre}.net.0.proj.bias"])
    a, g = jnp.split(h, 2, axis=-1)
    h = a * gelu(g)
    return linear(h, p[f"{pre}.net.2.weight"], p[f"{pre}.net.2.bias"])


def transformer_block(
    p, pre: str, x: jnp.ndarray, context: jnp.ndarray, num_heads: int,
    ip_context=None, ip_scale: float = 1.0,
) -> jnp.ndarray:
    from sdtpu.ops import layer_norm

    if f"{pre}.norm_in.weight" in p:
        # ff_in variant (SVD time_stack, reference block.hpp:441-450)
        h = layer_norm(x, p[f"{pre}.norm_in.weight"], p[f"{pre}.norm_in.bias"])
        x = x + geglu_ff(p, f"{pre}.ff_in", h)
    h = layer_norm(x, p[f"{pre}.norm1.weight"], p[f"{pre}.norm1.bias"])
    x = x + cross_attention(p, f"{pre}.attn1", h, None, num_heads)
    h = layer_norm(x, p[f"{pre}.norm2.weight"], p[f"{pre}.norm2.bias"])
    x = x + cross_attention(
        p, f"{pre}.attn2", h, context, num_heads, ip_context=ip_context, ip_scale=ip_scale
    )
    h = layer_norm(x, p[f"{pre}.norm3.weight"], p[f"{pre}.norm3.bias"])
    return x + geglu_ff(p, f"{pre}.ff", h)


def spatial_transformer(
    p, pre: str, x: jnp.ndarray, context: jnp.ndarray, cfg: UNetConfig, depth: int,
    ip_context=None, ip_scale: float = 1.0, num_frames: int = 1,
) -> jnp.ndarray:
    b, hh, ww, c = x.shape
    num_heads = _heads_for(cfg, c)
    h = group_norm(x, p[f"{pre}.norm.weight"], p[f"{pre}.norm.bias"], eps=1e-6)
    if cfg.use_linear_in_transformer:
        h = h.reshape(b, hh * ww, c)
        h = linear(h, p[f"{pre}.proj_in.weight"], p[f"{pre}.proj_in.bias"])
    else:
        h = conv2d(h, p[f"{pre}.proj_in.weight"], p[f"{pre}.proj_in.bias"], padding=0)
        h = h.reshape(b, hh * ww, c)
    if cfg.svd and num_frames > 1:
        # SpatialVideoTransformer (reference unet.hpp:150-297): after each
        # spatial block, a time_stack block attends across frames per spatial
        # position, blended by sigmoid(mix_factor)
        bt = b
        bb = bt // num_frames
        s = hh * ww
        t_emb = timestep_embedding(
            jnp.arange(num_frames, dtype=jnp.float32), c).astype(h.dtype)
        t_emb = linear(t_emb, p[f"{pre}.time_pos_embed.0.weight"],
                       p[f"{pre}.time_pos_embed.0.bias"])
        t_emb = linear(silu(t_emb), p[f"{pre}.time_pos_embed.2.weight"],
                       p[f"{pre}.time_pos_embed.2.bias"])  # [T, C]
        # temporal cross-attn context: the FIRST frame's spatial context,
        # shared across every spatial position
        tctx = context.reshape(bb, num_frames, context.shape[1], -1)[:, 0]
        tctx = jnp.broadcast_to(tctx[:, None], (bb, s) + tctx.shape[1:]
                                ).reshape(bb * s, context.shape[1], -1)
        for k in range(depth):
            h = transformer_block(
                p, f"{pre}.transformer_blocks.{k}", h, context, num_heads,
                ip_context=ip_context, ip_scale=ip_scale,
            )
            hm = h + jnp.tile(t_emb, (bb, 1))[:, None, :]
            hm = (hm.reshape(bb, num_frames, s, c).transpose(0, 2, 1, 3)
                  .reshape(bb * s, num_frames, c))
            hm = transformer_block(p, f"{pre}.time_stack.{k}", hm, tctx, num_heads)
            hm = (hm.reshape(bb, s, num_frames, c).transpose(0, 2, 1, 3)
                  .reshape(bt, s, c))
            h = _alpha_mix(p, f"{pre}.time_mixer", h, hm)
    else:
        for k in range(depth):
            h = transformer_block(
                p, f"{pre}.transformer_blocks.{k}", h, context, num_heads,
                ip_context=ip_context, ip_scale=ip_scale,
            )
    if cfg.use_linear_in_transformer:
        h = linear(h, p[f"{pre}.proj_out.weight"], p[f"{pre}.proj_out.bias"])
        h = h.reshape(b, hh, ww, c)
    else:
        h = h.reshape(b, hh, ww, c)
        h = conv2d(h, p[f"{pre}.proj_out.weight"], p[f"{pre}.proj_out.bias"], padding=0)
    return x + h


def upsample(p, pre: str, x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return conv2d(x, p[f"{pre}.conv.weight"], p[f"{pre}.conv.bias"])


def _block_layout(cfg: UNetConfig):
    """Static layout of (input_blocks, output_blocks) with EXPLICIT block
    indices — CompVis numbering, which tiny UNets keep with holes (reference
    unet.hpp:398-401,466-471: the index advances an extra step per level /
    before upsamples, so checkpoints fingerprint like their full parents).

    inputs: [(idx, [kinds])]; outputs: [(idx, [kinds], up)] where up is
    None or (up_idx, up_sub) naming the UpSample conv position."""
    inputs = [(0, ["conv"])]
    ds = 1
    idx = 0
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            idx += 1
            blk = ["res"]
            if ds in cfg.attention_resolutions and cfg.transformer_depth[level] > 0:
                blk.append(("attn", cfg.transformer_depth[level]))
            inputs.append((idx, blk))
            if cfg.tiny_unet:
                idx += 1
        if level != len(cfg.channel_mult) - 1:
            idx += 1
            inputs.append((idx, ["down"]))
            ds *= 2
    outputs = []
    obi = 0
    for level in reversed(range(len(cfg.channel_mult))):
        for i in range(cfg.num_res_blocks + 1):
            blk = ["res"]
            up_sub = 1
            if ds in cfg.attention_resolutions and cfg.transformer_depth[level] > 0:
                blk.append(("attn", cfg.transformer_depth[level]))
                up_sub += 1
            entry_idx = obi
            up = None
            if level != 0 and i == cfg.num_res_blocks:
                if cfg.tiny_unet:
                    obi += 1
                    if obi == 2:
                        up_sub = 1
                up = (obi, up_sub)
                ds //= 2
            outputs.append((entry_idx, blk, up))
            obi += 1
    return inputs, outputs


def unet_forward(
    p,
    x: jnp.ndarray,
    timesteps: jnp.ndarray,
    context: jnp.ndarray,
    y: Optional[jnp.ndarray] = None,
    cfg: UNetConfig = SD1_UNET_CONFIG,
    controls=None,
    control_strength: float = 1.0,
    ip_context=None,
    ip_scale: float = 1.0,
    num_frames: int = 1,
) -> jnp.ndarray:
    """x: [B,H,W,C] latent (NHWC), timesteps: [B], context: [B,L,ctx],
    y: [B, adm_in_channels] (SDXL). Returns eps/v prediction [B,H,W,out].

    controls: optional (per-input-block residuals, middle residual) from a
    ControlNet (reference control.hpp), added to skips/middle scaled by
    control_strength."""
    t_emb = timestep_embedding(timesteps, cfg.model_channels).astype(x.dtype)
    emb = linear(t_emb, p["time_embed.0.weight"], p["time_embed.0.bias"])
    emb = linear(silu(emb), p["time_embed.2.weight"], p["time_embed.2.bias"])
    if cfg.adm_in_channels is not None and y is not None:
        lemb = linear(y.astype(x.dtype), p["label_emb.0.0.weight"], p["label_emb.0.0.bias"])
        emb = emb + linear(silu(lemb), p["label_emb.0.2.weight"], p["label_emb.0.2.bias"])

    inputs, outputs = _block_layout(cfg)

    def motion(h, key):
        # AnimateDiff temporal transformer, by key presence
        # (reference unet.hpp:603-630)
        full = f"motion_module.{key}.temporal_transformer.proj_in.weight"
        if num_frames > 1 and full in p:
            from sdtpu.models.animatediff import motion_module_forward

            return motion_module_forward(p, f"motion_module.{key}", h, num_frames)
        return h

    hs = []
    h = x
    level = 0
    res_j = 0
    for bi, blk in inputs:
        is_res = False
        for j, kind in enumerate(blk):
            pre = f"input_blocks.{bi}.{j}"
            if kind == "conv":
                h = conv2d(h, p[f"{pre}.weight"], p[f"{pre}.bias"])
            elif kind == "res":
                h = (video_resblock(p, pre, h, emb, num_frames)
                     if cfg.svd and num_frames > 1 else resblock(p, pre, h, emb))
                is_res = True
            elif kind == "down":
                h = conv2d(h, p[f"{pre}.op.weight"], p[f"{pre}.op.bias"], stride=2)
                level += 1
                res_j = 0
            elif isinstance(kind, tuple) and kind[0] == "attn":
                h = spatial_transformer(p, pre, h, context, cfg, kind[1], ip_context=ip_context, ip_scale=ip_scale, num_frames=num_frames)
        if is_res:
            h = motion(h, f"down_blocks.{level}.motion_modules.{res_j}")
            res_j += 1
        hs.append(h)

    def _res(pre, hh):
        return (video_resblock(p, pre, hh, emb, num_frames)
                if cfg.svd and num_frames > 1 else resblock(p, pre, hh, emb))

    if not cfg.tiny_unet:
        h = _res("middle_block.0", h)
        mid_depth = cfg.transformer_depth[-1] if cfg.transformer_depth[-1] > 0 else 1
        h = spatial_transformer(p, "middle_block.1", h, context, cfg, mid_depth, ip_context=ip_context, ip_scale=ip_scale, num_frames=num_frames)
        h = _res("middle_block.2", h)
        h = motion(h, "mid_block.motion_modules.0")

    if controls is not None:
        block_controls, middle_control = controls
        h = h + middle_control.astype(h.dtype) * control_strength
        hs = [s + c.astype(s.dtype) * control_strength for s, c in zip(hs, block_controls)]

    n_out_per_level = cfg.num_res_blocks + 1
    for oi, (bi, blk, up) in enumerate(outputs):
        h = jnp.concatenate([h, hs.pop()], axis=-1)
        for j, kind in enumerate(blk):
            pre = f"output_blocks.{bi}.{j}"
            if kind == "res":
                h = _res(pre, h)
            elif isinstance(kind, tuple) and kind[0] == "attn":
                h = spatial_transformer(p, pre, h, context, cfg, kind[1], ip_context=ip_context, ip_scale=ip_scale, num_frames=num_frames)
        h = motion(h, f"up_blocks.{oi // n_out_per_level}.motion_modules.{oi % n_out_per_level}")
        if up is not None:
            h = upsample(p, f"output_blocks.{up[0]}.{up[1]}", h)

    h = group_norm(h, p["out.0.weight"], p["out.0.bias"], eps=1e-5)
    h = silu(h)
    return conv2d(h, p["out.2.weight"], p["out.2.bias"])


def unet_param_shapes(cfg: UNetConfig) -> dict:
    """name → (kind, shape) for every UNet param; kind ∈ {w, b, g} (weight /
    zero-bias / ones-gain). Single source of truth for init and loaders."""
    p = {}

    def w(name, *shape, scale=0.02):
        p[name] = ("w", tuple(shape))

    def norm(name, ch):
        p[f"{name}.weight"] = ("g", (ch,))
        p[f"{name}.bias"] = ("b", (ch,))

    def lin(name, out_c, in_c, bias=True):
        w(f"{name}.weight", out_c, in_c)
        if bias:
            p[f"{name}.bias"] = ("b", (out_c,))

    def conv(name, out_c, in_c, k=3):
        w(f"{name}.weight", out_c, in_c, k, k)
        p[f"{name}.bias"] = ("b", (out_c,))

    def tconv(name, out_c, in_c, k=3):
        # temporal conv (k, 1, 1) (reference conv_nd dims=3, block.hpp:84)
        w(f"{name}.weight", out_c, in_c, k, 1, 1)
        p[f"{name}.bias"] = ("b", (out_c,))

    def res(pre, in_c, out_c, emb_dim):
        norm(f"{pre}.in_layers.0", in_c)
        conv(f"{pre}.in_layers.2", out_c, in_c)
        lin(f"{pre}.emb_layers.1", out_c, emb_dim)
        norm(f"{pre}.out_layers.0", out_c)
        conv(f"{pre}.out_layers.3", out_c, out_c)
        if in_c != out_c:
            conv(f"{pre}.skip_connection", out_c, in_c, k=1)
        if cfg.svd:
            ts = f"{pre}.time_stack"
            norm(f"{ts}.in_layers.0", out_c)
            tconv(f"{ts}.in_layers.2", out_c, out_c)
            lin(f"{ts}.emb_layers.1", out_c, emb_dim)
            norm(f"{ts}.out_layers.0", out_c)
            tconv(f"{ts}.out_layers.3", out_c, out_c)
            p[f"{pre}.time_mixer.mix_factor"] = ("b", (1,))

    def attn_block(pre, dim, ctx):
        lin(f"{pre}.to_q", dim, dim, bias=False)
        lin(f"{pre}.to_k", dim, ctx, bias=False)
        lin(f"{pre}.to_v", dim, ctx, bias=False)
        lin(f"{pre}.to_out.0", dim, dim)

    def trans_block(pre, dim, ctx):
        norm(f"{pre}.norm1", dim)
        attn_block(f"{pre}.attn1", dim, dim)
        norm(f"{pre}.norm2", dim)
        attn_block(f"{pre}.attn2", dim, ctx)
        norm(f"{pre}.norm3", dim)
        lin(f"{pre}.ff.net.0.proj", dim * 8, dim)
        lin(f"{pre}.ff.net.2", dim, dim * 4)

    def spatial(pre, dim, depth):
        norm(f"{pre}.norm", dim)
        if cfg.use_linear_in_transformer:
            lin(f"{pre}.proj_in", dim, dim)
            lin(f"{pre}.proj_out", dim, dim)
        else:
            conv(f"{pre}.proj_in", dim, dim, k=1)
            conv(f"{pre}.proj_out", dim, dim, k=1)
        for k in range(depth):
            trans_block(f"{pre}.transformer_blocks.{k}", dim, cfg.context_dim)
        if cfg.svd:
            for k in range(depth):
                ts = f"{pre}.time_stack.{k}"
                norm(f"{ts}.norm_in", dim)
                lin(f"{ts}.ff_in.net.0.proj", dim * 8, dim)
                lin(f"{ts}.ff_in.net.2", dim, dim * 4)
                trans_block(ts, dim, cfg.context_dim)
            lin(f"{pre}.time_pos_embed.0", dim * 4, dim)
            lin(f"{pre}.time_pos_embed.2", dim, dim * 4)
            p[f"{pre}.time_mixer.mix_factor"] = ("b", (1,))

    mc = cfg.model_channels
    emb_dim = 4 * mc
    lin("time_embed.0", emb_dim, mc)
    lin("time_embed.2", emb_dim, emb_dim)
    if cfg.adm_in_channels is not None:
        lin("label_emb.0.0", emb_dim, cfg.adm_in_channels)
        lin("label_emb.0.2", emb_dim, emb_dim)

    # walk the same loops as _block_layout, tracking channel flow
    in_specs = []
    skips = [mc]
    cur = mc
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            out_c = mult * mc
            in_specs.append(("res", cur, out_c, level))
            cur = out_c
            skips.append(cur)
        if level != len(cfg.channel_mult) - 1:
            in_specs.append(("down", cur, cur, level))
            skips.append(cur)

    conv("input_blocks.0.0", mc, cfg.in_channels)
    layout_in, layout_out = _block_layout(cfg)
    li = [e for e in layout_in if e[1] != ["conv"]]
    for (kind, in_c, out_c, level), (bi, _blk) in zip(in_specs, li):
        if kind == "res":
            res(f"input_blocks.{bi}.0", in_c, out_c, emb_dim)
            if (
                _ds_at_level(cfg, level) in cfg.attention_resolutions
                and cfg.transformer_depth[level] > 0
            ):
                spatial(f"input_blocks.{bi}.1", out_c, cfg.transformer_depth[level])
        else:
            conv(f"input_blocks.{bi}.0.op", out_c, in_c)

    top = cfg.channel_mult[-1] * mc
    if not cfg.tiny_unet:
        res("middle_block.0", top, top, emb_dim)
        mid_depth = cfg.transformer_depth[-1] if cfg.transformer_depth[-1] > 0 else 1
        spatial("middle_block.1", top, mid_depth)
        res("middle_block.2", top, top, emb_dim)

    cur = top
    out_iter = iter(layout_out)
    for level in reversed(range(len(cfg.channel_mult))):
        out_c = cfg.channel_mult[level] * mc
        for i in range(cfg.num_res_blocks + 1):
            bi, _blk, up = next(out_iter)
            skip = skips.pop()
            res(f"output_blocks.{bi}.0", cur + skip, out_c, emb_dim)
            cur = out_c
            if (
                _ds_at_level(cfg, level) in cfg.attention_resolutions
                and cfg.transformer_depth[level] > 0
            ):
                spatial(f"output_blocks.{bi}.1", out_c, cfg.transformer_depth[level])
            if up is not None:
                conv(f"output_blocks.{up[0]}.{up[1]}.conv", out_c, out_c)

    norm("out.0", mc)
    conv("out.2", cfg.out_channels, mc)
    return p


def init_unet_params(cfg: UNetConfig, seed: int = 0, dtype=jnp.float32) -> dict:
    """Random-init params keyed by checkpoint names (tests/bench without weights)."""
    return materialize_params(unet_param_shapes(cfg), seed=seed, dtype=dtype)


def materialize_params(shapes: dict, seed: int = 0, dtype=jnp.float32, scale: float = 0.02) -> dict:
    import numpy as np

    g = np.random.default_rng(seed)
    out = {}
    for name, (kind, shape) in shapes.items():
        if kind == "w":
            out[name] = jnp.asarray(g.standard_normal(shape, dtype=np.float32) * scale, dtype=dtype)
        elif kind == "g":
            out[name] = jnp.ones(shape, dtype=dtype)
        else:
            out[name] = jnp.zeros(shape, dtype=dtype)
    return out


def _ds_at_level(cfg: UNetConfig, level: int) -> int:
    return 2**level

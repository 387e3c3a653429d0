"""ControlNet (SD1.5-style) — UNet-encoder copy with zero-conv taps.

Reference analog: ControlNet (src/model/diffusion/control.hpp:311).  Param
names follow the checkpoint scheme: ``input_blocks…`` (encoder copy),
``zero_convs.N.0`` (per-block 1×1 taps), ``middle_block…``,
``middle_block_out.0``, ``input_hint_block.{0,2,…,14}`` (hint stem),
``time_embed…``, plus label_emb for SDXL controlnets.

Outputs: per-skip control residuals + middle residual, consumed by
unet_forward(controls=…, control_strength=…).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp

from sdtpu.models.unet import (
    SD1_UNET_CONFIG,
    UNetConfig,
    _block_layout,
    resblock,
    spatial_transformer,
)
from sdtpu.ops import conv2d, linear, timestep_embedding
from sdtpu.ops.basic import silu


def controlnet_forward(
    p,
    x: jnp.ndarray,
    hint: jnp.ndarray,
    timesteps: jnp.ndarray,
    context: jnp.ndarray,
    y: Optional[jnp.ndarray] = None,
    cfg: UNetConfig = SD1_UNET_CONFIG,
) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
    """x: [B,h,w,C] latent; hint: [B,H,W,3] control image in [0,1].
    → (per-input-block controls, middle control)."""
    t_emb = timestep_embedding(timesteps, cfg.model_channels).astype(x.dtype)
    emb = linear(t_emb, p["time_embed.0.weight"], p["time_embed.0.bias"])
    emb = linear(silu(emb), p["time_embed.2.weight"], p["time_embed.2.bias"])
    if cfg.adm_in_channels is not None and y is not None:
        lemb = linear(y.astype(x.dtype), p["label_emb.0.0.weight"], p["label_emb.0.0.bias"])
        emb = emb + linear(silu(lemb), p["label_emb.0.2.weight"], p["label_emb.0.2.bias"])

    # hint stem: conv-silu ladder 3→16→16→32→32→96→96→256→model_ch;
    # strided (×2 down) at conv indices 4, 8, 12 → total /8 to latent res
    h = hint.astype(x.dtype)
    idx_list = [0, 2, 4, 6, 8, 10, 12, 14]
    for n, idx in enumerate(idx_list):
        stride = 2 if idx in (4, 8, 12) else 1
        h = conv2d(h, p[f"input_hint_block.{idx}.weight"], p[f"input_hint_block.{idx}.bias"], stride=stride)
        if n < len(idx_list) - 1:
            h = silu(h)
    guided_hint = h

    inputs, _ = _block_layout(cfg)
    controls: List[jnp.ndarray] = []
    hx = x
    for tap, (bi, blk) in enumerate(inputs):
        for j, kind in enumerate(blk):
            pre = f"input_blocks.{bi}.{j}"
            if kind == "conv":
                hx = conv2d(hx, p[f"{pre}.weight"], p[f"{pre}.bias"])
                hx = hx + guided_hint
            elif kind == "res":
                hx = resblock(p, pre, hx, emb)
            elif kind == "down":
                hx = conv2d(hx, p[f"{pre}.op.weight"], p[f"{pre}.op.bias"], stride=2)
            elif isinstance(kind, tuple) and kind[0] == "attn":
                hx = spatial_transformer(p, pre, hx, context, cfg, kind[1])
        controls.append(
            conv2d(hx, p[f"zero_convs.{tap}.0.weight"],
                   p[f"zero_convs.{tap}.0.bias"], padding=0)
        )

    hx = resblock(p, "middle_block.0", hx, emb)
    mid_depth = cfg.transformer_depth[-1] if cfg.transformer_depth[-1] > 0 else 1
    hx = spatial_transformer(p, "middle_block.1", hx, context, cfg, mid_depth)
    hx = resblock(p, "middle_block.2", hx, emb)
    middle = conv2d(hx, p["middle_block_out.0.weight"], p["middle_block_out.0.bias"], padding=0)
    return controls, middle


def init_controlnet_params(cfg: UNetConfig = SD1_UNET_CONFIG, seed: int = 0, dtype=jnp.float32):
    """Random-init (zero convs start at zero, like the trained-from checkpoint
    structure; useful for structural tests)."""
    import numpy as np

    from sdtpu.models.unet import unet_param_shapes

    g = np.random.default_rng(seed)
    shapes = unet_param_shapes(cfg)
    p = {}
    for name, (kind, shape) in shapes.items():
        if name.startswith(("output_blocks.", "out.")):
            continue
        if kind == "w":
            p[name] = jnp.asarray(g.standard_normal(shape, dtype=np.float32) * 0.02, dtype=dtype)
        elif kind == "g":
            p[name] = jnp.ones(shape, dtype=dtype)
        else:
            p[name] = jnp.zeros(shape, dtype=dtype)

    inputs, _ = _block_layout(cfg)
    # channel at each input block tap
    ch = cfg.model_channels
    chans = [ch]
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            chans.append(mult * cfg.model_channels)
        if level != len(cfg.channel_mult) - 1:
            chans.append(mult * cfg.model_channels)
    for i, c in enumerate(chans):
        p[f"zero_convs.{i}.0.weight"] = jnp.zeros((c, c, 1, 1), dtype=dtype)
        p[f"zero_convs.{i}.0.bias"] = jnp.zeros((c,), dtype=dtype)
    top = cfg.channel_mult[-1] * cfg.model_channels
    p["middle_block_out.0.weight"] = jnp.zeros((top, top, 1, 1), dtype=dtype)
    p["middle_block_out.0.bias"] = jnp.zeros((top,), dtype=dtype)

    hint_chs = [(16, 3), (16, 16), (32, 16), (32, 32), (96, 32), (96, 96), (256, 96),
                (cfg.model_channels, 256)]
    for (o, ic), idx in zip(hint_chs, [0, 2, 4, 6, 8, 10, 12, 14]):
        p[f"input_hint_block.{idx}.weight"] = jnp.asarray(
            g.standard_normal((o, ic, 3, 3), dtype=np.float32) * 0.02, dtype=dtype
        )
        p[f"input_hint_block.{idx}.bias"] = jnp.zeros((o,), dtype=dtype)
    return p

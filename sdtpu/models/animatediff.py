"""AnimateDiff motion modules — temporal transformers injected into the SD1.5
UNet (arXiv:2307.04725).

Reference analog: AnimateDiff::AnimateDiffModel (src/model/diffusion/
animatediff.hpp:134), injected per UNet block in unet.hpp:603-630.
Checkpoint naming (merged under the ``motion_module.`` prefix):
``motion_module.{down_blocks.D.motion_modules.J | up_blocks.U.motion_modules.J
| mid_block.motion_modules.0}.temporal_transformer.{norm, proj_in,
transformer_blocks.0.{attention_blocks.{0,1}.{to_q,to_k,to_v,to_out.0,
pos_encoder.pe}, norms.{0,1}, ff.net.{0.proj,2}, ff_norm}, proj_out}``.

The temporal attention runs over the FRAME axis at each spatial position:
activations [(B·F), H, W, C] regroup to [(B·H·W), F, C].
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from sdtpu.ops import attention, group_norm, layer_norm, linear


def _temporal_attention(p, pre, x, num_heads: int):
    """x: [N, F, C]; sinusoidal pos_encoder.pe [max_frames, C] trimmed to F."""
    n, f, c = x.shape
    pe = p[f"{pre}.pos_encoder.pe"].reshape(-1, c)[:f]
    xp = x + pe[None].astype(x.dtype)
    d = c // num_heads
    q = linear(xp, p[f"{pre}.to_q.weight"]).reshape(n, f, num_heads, d).transpose(0, 2, 1, 3)
    k = linear(xp, p[f"{pre}.to_k.weight"]).reshape(n, f, num_heads, d).transpose(0, 2, 1, 3)
    v = linear(xp, p[f"{pre}.to_v.weight"]).reshape(n, f, num_heads, d).transpose(0, 2, 1, 3)
    o = attention(q, k, v).transpose(0, 2, 1, 3).reshape(n, f, c)
    return linear(o, p[f"{pre}.to_out.0.weight"], p[f"{pre}.to_out.0.bias"])


def motion_module_forward(p, pre: str, x: jnp.ndarray, num_frames: int,
                          num_heads: int = 8) -> jnp.ndarray:
    """x: [(B·F), H, W, C] → same, with temporal mixing.

    (reference TemporalTransformer::forward, animatediff.hpp:105)."""
    from sdtpu.ops.basic import gelu

    bf, hh, ww, c = x.shape
    b = bf // num_frames
    tt = f"{pre}.temporal_transformer"
    residual = x
    h = group_norm(x, p[f"{tt}.norm.weight"], p[f"{tt}.norm.bias"], eps=1e-6)
    # [(B F), H, W, C] → [(B H W), F, C]
    h = h.reshape(b, num_frames, hh, ww, c).transpose(0, 2, 3, 1, 4).reshape(
        b * hh * ww, num_frames, c
    )
    h = linear(h, p[f"{tt}.proj_in.weight"], p[f"{tt}.proj_in.bias"])

    blk = f"{tt}.transformer_blocks.0"
    h = h + _temporal_attention(
        p, f"{blk}.attention_blocks.0",
        layer_norm(h, p[f"{blk}.norms.0.weight"], p[f"{blk}.norms.0.bias"]), num_heads,
    )
    h = h + _temporal_attention(
        p, f"{blk}.attention_blocks.1",
        layer_norm(h, p[f"{blk}.norms.1.weight"], p[f"{blk}.norms.1.bias"]), num_heads,
    )
    hn = layer_norm(h, p[f"{blk}.ff_norm.weight"], p[f"{blk}.ff_norm.bias"])
    ffh = linear(hn, p[f"{blk}.ff.net.0.proj.weight"], p[f"{blk}.ff.net.0.proj.bias"])
    a, g = jnp.split(ffh, 2, axis=-1)
    h = h + linear(a * gelu(g), p[f"{blk}.ff.net.2.weight"], p[f"{blk}.ff.net.2.bias"])

    h = linear(h, p[f"{tt}.proj_out.weight"], p[f"{tt}.proj_out.bias"])
    h = h.reshape(b, hh, ww, num_frames, c).transpose(0, 3, 1, 2, 4).reshape(
        bf, hh, ww, c
    )
    return h + residual


def init_motion_params(channels_by_key, max_frames: int = 32, seed: int = 0,
                       dtype=jnp.float32):
    """channels_by_key: {'down_blocks.0.motion_modules.0': 320, ...}."""
    g = np.random.default_rng(seed)
    p = {}
    for key, c in channels_by_key.items():
        tt = f"motion_module.{key}.temporal_transformer"

        def lin(name, o, i, bias=True):
            p[f"{name}.weight"] = jnp.asarray(
                g.standard_normal((o, i), dtype=np.float32) * 0.02, dtype=dtype
            )
            if bias:
                p[f"{name}.bias"] = jnp.zeros((o,), dtype=dtype)

        p[f"{tt}.norm.weight"] = jnp.ones((c,), dtype=dtype)
        p[f"{tt}.norm.bias"] = jnp.zeros((c,), dtype=dtype)
        lin(f"{tt}.proj_in", c, c)
        lin(f"{tt}.proj_out", c, c)
        blk = f"{tt}.transformer_blocks.0"
        for i in (0, 1):
            lin(f"{blk}.attention_blocks.{i}.to_q", c, c, bias=False)
            lin(f"{blk}.attention_blocks.{i}.to_k", c, c, bias=False)
            lin(f"{blk}.attention_blocks.{i}.to_v", c, c, bias=False)
            lin(f"{blk}.attention_blocks.{i}.to_out.0", c, c)
            p[f"{blk}.attention_blocks.{i}.pos_encoder.pe"] = jnp.asarray(
                g.standard_normal((max_frames, c), dtype=np.float32) * 0.02, dtype=dtype
            )
            p[f"{blk}.norms.{i}.weight"] = jnp.ones((c,), dtype=dtype)
            p[f"{blk}.norms.{i}.bias"] = jnp.zeros((c,), dtype=dtype)
        lin(f"{blk}.ff.net.0.proj", 8 * c, c)
        lin(f"{blk}.ff.net.2", c, 4 * c)
        p[f"{blk}.ff_norm.weight"] = jnp.ones((c,), dtype=dtype)
        p[f"{blk}.ff_norm.bias"] = jnp.zeros((c,), dtype=dtype)
    return p


def default_motion_channel_map(cfg, with_mid: bool = False):
    """SD1.5 AnimateDiff v2/v3 layout (reference MotionModuleConfig)."""
    down = [cfg.model_channels * m for m in cfg.channel_mult]
    up = list(reversed(down))
    keys = {}
    for i, c in enumerate(down):
        for j in range(cfg.num_res_blocks):
            keys[f"down_blocks.{i}.motion_modules.{j}"] = c
    for i, c in enumerate(up):
        for j in range(cfg.num_res_blocks + 1):
            keys[f"up_blocks.{i}.motion_modules.{j}"] = c
    if with_mid:
        keys["mid_block.motion_modules.0"] = down[-1]
    return keys

"""MMDiT — SD3/3.5 joint-attention diffusion transformer.

Reference analog: MMDiT (src/model/diffusion/mmdit.hpp:757; upstream SD3
paper).  Param names follow the SD3 checkpoint scheme
(``joint_blocks.N.{context_block,x_block}.…``, ``x_embedder.proj``,
``t_embedder.mlp.{0,2}``, ``y_embedder.mlp.{0,2}``, ``context_embedder``,
``pos_embed``, ``final_layer.…``).

Supports SD3.5 per-head qk RMS norm and MMDiT-X dual self-attention
(``x_block.attn2``) used by SD3.5-medium.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sdtpu.ops import attention, layer_norm, linear, rms_norm, timestep_embedding
from sdtpu.ops.basic import gelu_tanh, silu


@dataclasses.dataclass(frozen=True)
class MMDiTConfig:
    patch_size: int = 2
    in_channels: int = 16
    depth: int = 24  # SD3-medium; 3.5-large = 38
    mlp_ratio: float = 4.0
    context_size: int = 4096
    adm_in_channels: int = 2048
    pos_embed_max_size: int = 192
    qk_norm: Optional[str] = None  # "rms" for SD3.5
    num_x_self_attn_layers: int = 0  # MMDiT-X (SD3.5-medium): x_block.attn2 depth

    @property
    def hidden_size(self) -> int:
        return 64 * self.depth

    @property
    def num_heads(self) -> int:
        return self.depth

    @property
    def out_channels(self) -> int:
        return self.in_channels


SD3_MEDIUM_CONFIG = MMDiTConfig(depth=24)
SD35_MEDIUM_CONFIG = MMDiTConfig(depth=24, qk_norm="rms", num_x_self_attn_layers=13, pos_embed_max_size=384)
SD35_LARGE_CONFIG = MMDiTConfig(depth=38, qk_norm="rms")


def detect_mmdit_config(names, shapes) -> MMDiTConfig:
    """Config from checkpoint fingerprints (reference mmdit.hpp model-type
    detection: depth from the joint_blocks count, SD3.5 from the attn qk RMS
    norms, MMDiT-X/SD3.5-medium from the x_block.attn2 dual-attention keys,
    pos-embed grid from the pos_embed table)."""
    depth = 0
    num_x = 0
    qk = None
    for n in names:
        if n.startswith("joint_blocks."):
            i = int(n.split(".")[1])
            depth = max(depth, i + 1)
            if ".x_block.attn2." in n:
                num_x = max(num_x, i + 1)
            if ".attn.ln_q" in n:
                qk = "rms"
    pos = shapes.get("pos_embed")
    pos_max = int(round(pos[1] ** 0.5)) if pos is not None else 192
    in_ch = shapes.get("x_embedder.proj.weight", (0, 16))[1]
    ctx = shapes.get("context_embedder.weight", (0, 4096))[1]
    base = (
        SD35_LARGE_CONFIG if depth >= 38
        else SD35_MEDIUM_CONFIG if (depth == 24 and qk == "rms")
        else SD3_MEDIUM_CONFIG
    )
    return dataclasses.replace(
        base, depth=depth or base.depth, qk_norm=qk,
        num_x_self_attn_layers=num_x, pos_embed_max_size=pos_max,
        in_channels=in_ch, context_size=ctx,
    )


def _modulate(x, shift, scale):
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


def _qkv(p, pre, x, num_heads, qk_norm):
    b, l, c = x.shape
    d = c // num_heads
    qkv = linear(x, p[f"{pre}.qkv.weight"], p.get(f"{pre}.qkv.bias"))
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, l, num_heads, d)
    k = k.reshape(b, l, num_heads, d)
    v = v.reshape(b, l, num_heads, d)
    if qk_norm == "rms":
        q = rms_norm(q, p[f"{pre}.ln_q.weight"], eps=1e-6)
        k = rms_norm(k, p[f"{pre}.ln_k.weight"], eps=1e-6)
    elif qk_norm == "ln":
        q = layer_norm(q, p[f"{pre}.ln_q.weight"], p.get(f"{pre}.ln_q.bias"), eps=1e-6)
        k = layer_norm(k, p[f"{pre}.ln_k.weight"], p.get(f"{pre}.ln_k.bias"), eps=1e-6)
    return q, k, v


def _mlp(p, pre, x):
    h = gelu_tanh(linear(x, p[f"{pre}.fc1.weight"], p[f"{pre}.fc1.bias"]))
    return linear(h, p[f"{pre}.fc2.weight"], p[f"{pre}.fc2.bias"])


def cropped_pos_embed(p, h_patches: int, w_patches: int, cfg: MMDiTConfig) -> jnp.ndarray:
    pe = p["pos_embed"]  # [1, P*P, hidden]
    P = cfg.pos_embed_max_size
    pe = pe.reshape(P, P, cfg.hidden_size)
    top = (P - h_patches) // 2
    left = (P - w_patches) // 2
    return pe[top : top + h_patches, left : left + w_patches].reshape(
        1, h_patches * w_patches, cfg.hidden_size
    )


def mmdit_forward(
    p,
    x: jnp.ndarray,
    timesteps: jnp.ndarray,
    context: jnp.ndarray,
    y: Optional[jnp.ndarray] = None,
    cfg: MMDiTConfig = SD3_MEDIUM_CONFIG,
    skip_layers: Tuple[int, ...] = (),
) -> jnp.ndarray:
    """x: [B,H,W,C] latent (NHWC), timesteps: [B], context: [B,L,4096],
    y: [B, adm] pooled. Returns velocity prediction [B,H,W,C].

    skip_layers: joint-block indices to skip (Skip-Layer Guidance pass)."""
    b, h, w, c = x.shape
    ps = cfg.patch_size
    hp, wp = h // ps, w // ps
    hidden = cfg.hidden_size

    # patchify via conv = reshape matmul (NHWC → tokens)
    xw = p["x_embedder.proj.weight"]  # [hidden, C, ps, ps]
    patches = x.reshape(b, hp, ps, wp, ps, c).transpose(0, 1, 3, 2, 4, 5).reshape(
        b, hp * wp, ps * ps * c
    )
    wmat = xw.transpose(0, 2, 3, 1).reshape(hidden, ps * ps * c)  # [hidden, ps*ps*C]
    tokens = linear(patches, wmat, p["x_embedder.proj.bias"])
    tokens = tokens + cropped_pos_embed(p, hp, wp, cfg).astype(tokens.dtype)

    t_emb = timestep_embedding(timesteps, 256).astype(x.dtype)
    cvec = linear(t_emb, p["t_embedder.mlp.0.weight"], p["t_embedder.mlp.0.bias"])
    cvec = linear(silu(cvec), p["t_embedder.mlp.2.weight"], p["t_embedder.mlp.2.bias"])
    if y is not None and "y_embedder.mlp.0.weight" in p:
        yv = linear(y.astype(x.dtype), p["y_embedder.mlp.0.weight"], p["y_embedder.mlp.0.bias"])
        yv = linear(silu(yv), p["y_embedder.mlp.2.weight"], p["y_embedder.mlp.2.bias"])
        cvec = cvec + yv

    ctx = linear(context.astype(x.dtype), p["context_embedder.weight"], p["context_embedder.bias"])

    n_ctx = ctx.shape[1]
    for i in range(cfg.depth):
        if i in skip_layers:
            continue
        pre_only = i == cfg.depth - 1
        self_attn_x = i < cfg.num_x_self_attn_layers
        cb = f"joint_blocks.{i}.context_block"
        xb = f"joint_blocks.{i}.x_block"

        # context modulation (6 mods, or 2 when pre_only)
        n_mods_c = 2 if pre_only else 6
        mc = linear(silu(cvec), p[f"{cb}.adaLN_modulation.1.weight"], p[f"{cb}.adaLN_modulation.1.bias"])
        mods_c = jnp.split(mc, n_mods_c, axis=-1)
        ctx_norm = layer_norm(ctx, eps=1e-6)
        ctx_in = _modulate(ctx_norm, mods_c[0], mods_c[1])
        cq, ck, cv = _qkv(p, f"{cb}.attn", ctx_in, cfg.num_heads, cfg.qk_norm)

        n_mods_x = 9 if self_attn_x else 6
        mx = linear(silu(cvec), p[f"{xb}.adaLN_modulation.1.weight"], p[f"{xb}.adaLN_modulation.1.bias"])
        mods_x = jnp.split(mx, n_mods_x, axis=-1)
        x_norm = layer_norm(tokens, eps=1e-6)
        x_in = _modulate(x_norm, mods_x[0], mods_x[1])
        xq, xk, xv = _qkv(p, f"{xb}.attn", x_in, cfg.num_heads, cfg.qk_norm)

        q = jnp.concatenate([cq, xq], axis=1).transpose(0, 2, 1, 3)
        k = jnp.concatenate([ck, xk], axis=1).transpose(0, 2, 1, 3)
        v = jnp.concatenate([cv, xv], axis=1).transpose(0, 2, 1, 3)
        att = attention(q, k, v).transpose(0, 2, 1, 3)
        att = att.reshape(b, att.shape[1], hidden)
        ctx_attn, x_attn = att[:, :n_ctx], att[:, n_ctx:]

        if not pre_only:
            ctx_attn = linear(ctx_attn, p[f"{cb}.attn.proj.weight"], p[f"{cb}.attn.proj.bias"])
            ctx = ctx + ctx_attn * mods_c[2][:, None, :]
            ctx_m = _modulate(layer_norm(ctx, eps=1e-6), mods_c[3], mods_c[4])
            ctx = ctx + _mlp(p, f"{cb}.mlp", ctx_m) * mods_c[5][:, None, :]

        x_attn = linear(x_attn, p[f"{xb}.attn.proj.weight"], p[f"{xb}.attn.proj.bias"])
        tokens = tokens + x_attn * mods_x[2][:, None, :]
        if self_attn_x:
            # MMDiT-X: second (pure self) attention on x tokens
            x_in2 = _modulate(x_norm, mods_x[6], mods_x[7])
            q2, k2, v2 = _qkv(p, f"{xb}.attn2", x_in2, cfg.num_heads, cfg.qk_norm)
            att2 = attention(
                q2.transpose(0, 2, 1, 3), k2.transpose(0, 2, 1, 3), v2.transpose(0, 2, 1, 3)
            ).transpose(0, 2, 1, 3).reshape(b, hp * wp, hidden)
            att2 = linear(att2, p[f"{xb}.attn2.proj.weight"], p[f"{xb}.attn2.proj.bias"])
            tokens = tokens + att2 * mods_x[8][:, None, :]
        x_m = _modulate(layer_norm(tokens, eps=1e-6), mods_x[3], mods_x[4])
        tokens = tokens + _mlp(p, f"{xb}.mlp", x_m) * mods_x[5][:, None, :]

    mf = linear(
        silu(cvec),
        p["final_layer.adaLN_modulation.1.weight"],
        p["final_layer.adaLN_modulation.1.bias"],
    )
    shift, scale = jnp.split(mf, 2, axis=-1)
    out = _modulate(layer_norm(tokens, eps=1e-6), shift, scale)
    out = linear(out, p["final_layer.linear.weight"], p["final_layer.linear.bias"])

    # unpatchify
    out = out.reshape(b, hp, wp, ps, ps, cfg.out_channels)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, cfg.out_channels)
    return out


def init_mmdit_params(cfg: MMDiTConfig = SD3_MEDIUM_CONFIG, seed: int = 0, dtype=jnp.float32):
    g = np.random.default_rng(seed)
    hid = cfg.hidden_size
    ps, c = cfg.patch_size, cfg.in_channels

    p = {}

    def w(name, *shape, scale=0.02):
        p[name] = jnp.asarray(g.standard_normal(shape, dtype=np.float32) * scale, dtype=dtype)

    def lin(name, o, i, bias=True):
        w(f"{name}.weight", o, i)
        if bias:
            p[f"{name}.bias"] = jnp.zeros((o,), dtype=dtype)

    w("pos_embed", 1, cfg.pos_embed_max_size**2, hid, scale=0.01)
    w("x_embedder.proj.weight", hid, c, ps, ps)
    p["x_embedder.proj.bias"] = jnp.zeros((hid,), dtype=dtype)
    lin("t_embedder.mlp.0", hid, 256)
    lin("t_embedder.mlp.2", hid, hid)
    if cfg.adm_in_channels > 0:
        lin("y_embedder.mlp.0", hid, cfg.adm_in_channels)
        lin("y_embedder.mlp.2", hid, hid)
    lin("context_embedder", hid, cfg.context_size)
    d_head = hid // cfg.num_heads
    for i in range(cfg.depth):
        pre_only = i == cfg.depth - 1
        self_attn_x = i < cfg.num_x_self_attn_layers
        for which, po in (("context_block", pre_only), ("x_block", False)):
            pre = f"joint_blocks.{i}.{which}"
            lin(f"{pre}.attn.qkv", 3 * hid, hid)
            if cfg.qk_norm == "rms":
                p[f"{pre}.attn.ln_q.weight"] = jnp.ones((d_head,), dtype=dtype)
                p[f"{pre}.attn.ln_k.weight"] = jnp.ones((d_head,), dtype=dtype)
            if not po:
                lin(f"{pre}.attn.proj", hid, hid)
                lin(f"{pre}.mlp.fc1", int(hid * cfg.mlp_ratio), hid)
                lin(f"{pre}.mlp.fc2", hid, int(hid * cfg.mlp_ratio))
            n_mods = 2 if po else (9 if (which == "x_block" and self_attn_x) else 6)
            lin(f"{pre}.adaLN_modulation.1", n_mods * hid, hid)
            if which == "x_block" and self_attn_x:
                lin(f"{pre}.attn2.qkv", 3 * hid, hid)
                lin(f"{pre}.attn2.proj", hid, hid)
                if cfg.qk_norm == "rms":
                    p[f"{pre}.attn2.ln_q.weight"] = jnp.ones((d_head,), dtype=dtype)
                    p[f"{pre}.attn2.ln_k.weight"] = jnp.ones((d_head,), dtype=dtype)
    lin("final_layer.adaLN_modulation.1", 2 * hid, hid)
    lin("final_layer.linear", ps * ps * cfg.out_channels, hid)
    return p

"""Z-Image (Lumina-2-style single-stream DiT): joint txt+img token stream
with GQA attention, per-head qk RMSNorm, swiglu FFN, tanh-gated scale-only
adaLN from a 256-d timestep embedding, learned pad tokens rounding both
streams to multiples of 32, and 3-axis RoPE with text positions 1..L and
image positions offset past the text.

Reference analog: ZImage::ZImageModel / ZImageRunner
(src/model/diffusion/z_image.hpp:367,549).  Checkpoint names:
``x_embedder``, ``t_embedder.mlp.{0,2}``, ``cap_embedder.{0,1}``,
``{noise_refiner,context_refiner,layers}.N.{attention.{qkv,out,q_norm,
k_norm}, feed_forward.{w1,w2,w3}, attention_norm{1,2}, ffn_norm{1,2},
adaLN_modulation.0}``, ``final_layer.{norm_final,linear,adaLN_modulation.1}``,
``cap_pad_token``, ``x_pad_token``.

The model predicts the NEGATED flow velocity; forward returns the negated
output (reference scale by -1, z_image.hpp:543).  Timesteps enter as
(1000 - t)/1000-style raw values prepared by the caller
(prepare_sample_timesteps, stable-diffusion.cpp:2336: 1000 - t).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from sdtpu.models.flux import apply_rope, rope_freqs
from sdtpu.ops import attention, layer_norm, linear, rms_norm, timestep_embedding
from sdtpu.ops.basic import silu

ADALN_EMBED_DIM = 256
SEQ_MULTI_OF = 32


@dataclasses.dataclass(frozen=True)
class ZImageConfig:
    patch_size: int = 2
    hidden_size: int = 3840
    in_channels: int = 16
    out_channels: int = 16
    num_layers: int = 30
    num_refiner_layers: int = 2
    head_dim: int = 128
    num_heads: int = 30
    num_kv_heads: int = 30
    multiple_of: int = 256
    ffn_dim_multiplier: float = 8.0 / 3.0
    norm_eps: float = 1e-5
    cap_feat_dim: int = 2560
    theta: int = 256
    axes_dim: Tuple[int, ...] = (32, 48, 48)


Z_IMAGE_CONFIG = ZImageConfig()


def detect_z_image_config(names, shapes) -> ZImageConfig:
    """Reference ZImageConfig::detect_from_weights (z_image.hpp:43)."""
    names = set(names)
    kw = {}
    xe = shapes.get("x_embedder.weight")
    if xe:
        kw["hidden_size"] = xe[0]
        kw["in_channels"] = xe[1] // 4
    ce = shapes.get("cap_embedder.1.weight")
    if ce:
        kw["cap_feat_dim"] = ce[1]
        kw["hidden_size"] = ce[0]
    fl = shapes.get("final_layer.linear.weight")
    if fl:
        kw["out_channels"] = fl[0] // 4
    qn = shapes.get("layers.0.attention.q_norm.weight")
    qkv = shapes.get("layers.0.attention.qkv.weight")
    if qn:
        hd = qn[0]
        kw["head_dim"] = hd
        nh = kw.get("hidden_size", 3840) // hd
        kw["num_heads"] = nh
        if qkv:
            kw["num_kv_heads"] = max(1, (qkv[0] // hd - nh) // 2)
    layers = refiners = 0
    for n in names:
        if n.startswith("layers."):
            layers = max(layers, int(n.split(".")[1]) + 1)
        elif n.startswith(("noise_refiner.", "context_refiner.")):
            refiners = max(refiners, int(n.split(".")[1]) + 1)
    if layers:
        kw["num_layers"] = layers
    if refiners:
        kw["num_refiner_layers"] = refiners
    return dataclasses.replace(Z_IMAGE_CONFIG, **kw)


def _bound_mod(n: int, m: int) -> int:
    return (m - n % m) % m


def _ffn_hidden(cfg: ZImageConfig) -> int:
    h = int(cfg.ffn_dim_multiplier * cfg.hidden_size)
    return cfg.multiple_of * ((h + cfg.multiple_of - 1) // cfg.multiple_of)


def _attn(p, pre, x, rot, cfg: ZImageConfig):
    """JointAttention (z_image.hpp:122): fused GQA qkv, per-head qk RMSNorm,
    interleaved rope."""
    b, l, _ = x.shape
    nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    qkv = linear(x, p[f"{pre}.qkv.weight"], p.get(f"{pre}.qkv.bias"))
    qkv = qkv.reshape(b, l, nh + 2 * nkv, hd)
    q, k, v = qkv[:, :, :nh], qkv[:, :, nh:nh + nkv], qkv[:, :, nh + nkv:]
    if f"{pre}.q_norm.weight" in p:
        q = rms_norm(q, p[f"{pre}.q_norm.weight"])
        k = rms_norm(k, p[f"{pre}.k_norm.weight"])
    q = q.transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    q = apply_rope(q, rot)
    k = apply_rope(k, rot)
    if nkv != nh:
        k = jnp.repeat(k, nh // nkv, axis=1)
        v = jnp.repeat(v, nh // nkv, axis=1)
    o = attention(q, k, v)
    o = o.transpose(0, 2, 1, 3).reshape(b, l, nh * hd)
    return linear(o, p[f"{pre}.out.weight"], p.get(f"{pre}.out.bias"))


def _ffn(p, pre, x):
    x1 = linear(x, p[f"{pre}.w1.weight"])
    x3 = linear(x, p[f"{pre}.w3.weight"])
    return linear(silu(x1) * x3, p[f"{pre}.w2.weight"])


def _block(p, pre, x, rot, t_emb, cfg: ZImageConfig):
    """JointTransformerBlock (z_image.hpp:255): RMS sandwich norms; when
    modulated, scale-only adaLN on the input norm and tanh-gated outputs."""
    if f"{pre}.adaLN_modulation.0.weight" in p:
        mods = linear(t_emb, p[f"{pre}.adaLN_modulation.0.weight"],
                      p.get(f"{pre}.adaLN_modulation.0.bias"))
        s_msa, g_msa, s_mlp, g_mlp = jnp.split(mods[:, None], 4, axis=-1)
        h = rms_norm(x, p[f"{pre}.attention_norm1.weight"], eps=cfg.norm_eps)
        h = h * (1.0 + s_msa)
        h = _attn(p, f"{pre}.attention", h, rot, cfg)
        h = rms_norm(h, p[f"{pre}.attention_norm2.weight"], eps=cfg.norm_eps)
        x = x + h * jnp.tanh(g_msa)
        h = rms_norm(x, p[f"{pre}.ffn_norm1.weight"], eps=cfg.norm_eps)
        h = h * (1.0 + s_mlp)
        h = _ffn(p, f"{pre}.feed_forward", h)
        h = rms_norm(h, p[f"{pre}.ffn_norm2.weight"], eps=cfg.norm_eps)
        return x + h * jnp.tanh(g_mlp)
    h = rms_norm(x, p[f"{pre}.attention_norm1.weight"], eps=cfg.norm_eps)
    h = _attn(p, f"{pre}.attention", h, rot, cfg)
    h = rms_norm(h, p[f"{pre}.attention_norm2.weight"], eps=cfg.norm_eps)
    x = x + h
    h = rms_norm(x, p[f"{pre}.ffn_norm1.weight"], eps=cfg.norm_eps)
    h = _ffn(p, f"{pre}.feed_forward", h)
    h = rms_norm(h, p[f"{pre}.ffn_norm2.weight"], eps=cfg.norm_eps)
    return x + h


def z_image_rope(hp: int, wp: int, n_txt_padded: int, cfg: ZImageConfig,
                 ref_grids=()):
    """ids: txt axis0 = 1..L_txt (incl. padding), img axis0 = L_txt+1 with an
    (h, w) grid on axes 1/2; image pad tokens all-zero
    (Rope::gen_z_image_ids, src/model/common/rope.hpp:896).

    ref_grids: (rhp, rwp) per reference latent — each ref gets its own grid
    at the next axis-0 index.  The reference leaves ref ids unassigned
    ("ignore ref_latents for now", rope.hpp:924); we give them proper grid
    ids so attention can distinguish the streams."""
    n_img = hp * wp
    n_ref = sum(rh * rw for rh, rw in ref_grids)
    n_img_pad = _bound_mod(n_img + n_ref, SEQ_MULTI_OF)
    ids = np.zeros((n_txt_padded + n_img + n_ref + n_img_pad, 3),
                   dtype=np.int64)
    ids[:n_txt_padded, 0] = np.arange(1, n_txt_padded + 1)
    ii, jj = np.meshgrid(np.arange(hp), np.arange(wp), indexing="ij")
    ids[n_txt_padded:n_txt_padded + n_img, 0] = n_txt_padded + 1
    ids[n_txt_padded:n_txt_padded + n_img, 1] = ii.reshape(-1)
    ids[n_txt_padded:n_txt_padded + n_img, 2] = jj.reshape(-1)
    off = n_txt_padded + n_img
    for k, (rh, rw) in enumerate(ref_grids):
        ri, rj = np.meshgrid(np.arange(rh), np.arange(rw), indexing="ij")
        ids[off:off + rh * rw, 0] = n_txt_padded + 2 + k
        ids[off:off + rh * rw, 1] = ri.reshape(-1)
        ids[off:off + rh * rw, 2] = rj.reshape(-1)
        off += rh * rw
    return jnp.asarray(rope_freqs(ids, cfg.axes_dim, cfg.theta))


def z_image_forward(
    p,
    x: jnp.ndarray,
    timesteps: jnp.ndarray,
    context: jnp.ndarray,
    cfg: ZImageConfig = Z_IMAGE_CONFIG,
    ref_latents=None,
) -> jnp.ndarray:
    """x: [B, H, W, C] latent; timesteps: [B] (already 1000-t scaled by the
    caller, /1000 applied here via t_embedder's raw input — the reference
    passes the raw value); context: [B, L, cap_feat_dim]; ref_latents:
    Z-Image-Omni reference latents appended to the img token stream and
    sliced off the output (reference z_image.hpp:531-541)."""
    b, h, w, c = x.shape
    ps = cfg.patch_size
    pad_h, pad_w = (-h) % ps, (-w) % ps
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = (h + pad_h) // ps, (w + pad_w) // ps

    # patch_last=false token layout: feature = (py, px, c), c fastest
    # (DiT::patchify, dit.hpp:29; z_image.hpp:528 passes false)
    img = x.reshape(b, hp, ps, wp, ps, c).transpose(0, 1, 3, 2, 4, 5)
    img = img.reshape(b, hp * wp, ps * ps * c)
    img = linear(img, p["x_embedder.weight"], p.get("x_embedder.bias"))
    n_img_main = hp * wp
    ref_grids = []
    if ref_latents:
        toks = [img]
        for r in ref_latents:
            rb, rh, rw, rc = r.shape
            rpad_h, rpad_w = (-rh) % ps, (-rw) % ps
            if rpad_h or rpad_w:
                r = jnp.pad(r, ((0, 0), (0, rpad_h), (0, rpad_w), (0, 0)))
            rhp, rwp = (rh + rpad_h) // ps, (rw + rpad_w) // ps
            rt = (r.astype(x.dtype)
                  .reshape(rb, rhp, ps, rwp, ps, rc).transpose(0, 1, 3, 2, 4, 5)
                  .reshape(rb, rhp * rwp, ps * ps * rc))
            toks.append(linear(rt, p["x_embedder.weight"],
                               p.get("x_embedder.bias")))
            ref_grids.append((rhp, rwp))
        img = jnp.concatenate(toks, axis=1)

    t_freq = timestep_embedding(timesteps, 256).astype(img.dtype)
    t_emb = linear(t_freq, p["t_embedder.mlp.0.weight"], p["t_embedder.mlp.0.bias"])
    t_emb = linear(silu(t_emb), p["t_embedder.mlp.2.weight"], p["t_embedder.mlp.2.bias"])

    txt = rms_norm(context, p["cap_embedder.0.weight"], eps=cfg.norm_eps)
    txt = linear(txt, p["cap_embedder.1.weight"], p.get("cap_embedder.1.bias"))

    n_txt = txt.shape[1]
    n_img = img.shape[1]
    n_txt_pad = _bound_mod(n_txt, SEQ_MULTI_OF)
    if n_txt_pad:
        pad = jnp.broadcast_to(p["cap_pad_token"].astype(txt.dtype),
                               (b, n_txt_pad, cfg.hidden_size))
        txt = jnp.concatenate([txt, pad], axis=1)
    n_img_pad = _bound_mod(n_img, SEQ_MULTI_OF)
    if n_img_pad:
        pad = jnp.broadcast_to(p["x_pad_token"].astype(img.dtype),
                               (b, n_img_pad, cfg.hidden_size))
        img = jnp.concatenate([img, pad], axis=1)

    rot = z_image_rope(hp, wp, n_txt + n_txt_pad, cfg, ref_grids=ref_grids)
    txt_rot = rot[: txt.shape[1]]
    img_rot = rot[txt.shape[1]:]

    for i in range(cfg.num_refiner_layers):
        txt = _block(p, f"context_refiner.{i}", txt, txt_rot, None, cfg)
    for i in range(cfg.num_refiner_layers):
        img = _block(p, f"noise_refiner.{i}", img, img_rot, t_emb, cfg)

    hseq = jnp.concatenate([txt, img], axis=1)
    for i in range(cfg.num_layers):
        hseq = _block(p, f"layers.{i}", hseq, rot, t_emb, cfg)

    # final layer (z_image.hpp:338)
    scale = linear(silu(t_emb), p["final_layer.adaLN_modulation.1.weight"],
                   p.get("final_layer.adaLN_modulation.1.bias"))
    out = layer_norm(hseq, eps=1e-6)
    out = out * (1.0 + scale[:, None])
    out = linear(out, p["final_layer.linear.weight"], p.get("final_layer.linear.bias"))

    img_out = out[:, txt.shape[1]: txt.shape[1] + n_img_main]
    img_out = img_out.reshape(b, hp, wp, ps, ps, cfg.out_channels)
    img_out = img_out.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, hp * ps, wp * ps, cfg.out_channels)
    if pad_h or pad_w:
        img_out = img_out[:, :h, :w]
    return -img_out  # model predicts the negated velocity (z_image.hpp:543)


def init_z_image_params(cfg: ZImageConfig, seed: int = 0, dtype=jnp.float32) -> dict:
    g = np.random.default_rng(seed)

    def wt(*shape, scale=0.02):
        return jnp.asarray(g.standard_normal(shape, dtype=np.float32) * scale,
                           dtype=dtype)

    def lin(p, pre, din, dout, bias=True):
        p[f"{pre}.weight"] = wt(dout, din)
        if bias:
            p[f"{pre}.bias"] = jnp.zeros((dout,), dtype=dtype)

    hid = cfg.hidden_size
    ffh = _ffn_hidden(cfg)
    p: dict = {
        "cap_pad_token": wt(hid),
        "x_pad_token": wt(hid),
        "cap_embedder.0.weight": jnp.ones((cfg.cap_feat_dim,), dtype=dtype),
    }
    lin(p, "x_embedder", cfg.patch_size**2 * cfg.in_channels, hid)
    te_hid = min(hid, 1024)
    lin(p, "t_embedder.mlp.0", 256, te_hid)
    # out = ADALN_EMBED_DIM for real sizes; capped at hidden for tiny configs
    lin(p, "t_embedder.mlp.2", te_hid, min(hid, ADALN_EMBED_DIM))
    lin(p, "cap_embedder.1", cfg.cap_feat_dim, hid)

    def blk(pre, modulated):
        nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
        lin(p, f"{pre}.attention.qkv", hid, (nh + 2 * nkv) * hd, bias=False)
        lin(p, f"{pre}.attention.out", nh * hd, hid, bias=False)
        p[f"{pre}.attention.q_norm.weight"] = jnp.ones((hd,), dtype=dtype)
        p[f"{pre}.attention.k_norm.weight"] = jnp.ones((hd,), dtype=dtype)
        lin(p, f"{pre}.feed_forward.w1", hid, ffh, bias=False)
        lin(p, f"{pre}.feed_forward.w2", ffh, hid, bias=False)
        lin(p, f"{pre}.feed_forward.w3", hid, ffh, bias=False)
        for nm in ("attention_norm1", "attention_norm2", "ffn_norm1", "ffn_norm2"):
            p[f"{pre}.{nm}.weight"] = jnp.ones((hid,), dtype=dtype)
        if modulated:
            lin(p, f"{pre}.adaLN_modulation.0", min(hid, ADALN_EMBED_DIM), 4 * hid)

    for i in range(cfg.num_refiner_layers):
        blk(f"noise_refiner.{i}", True)
        blk(f"context_refiner.{i}", False)
    for i in range(cfg.num_layers):
        blk(f"layers.{i}", True)
    lin(p, "final_layer.linear", hid, cfg.patch_size**2 * cfg.out_channels)
    lin(p, "final_layer.adaLN_modulation.1", min(hid, ADALN_EMBED_DIM), hid)
    return p

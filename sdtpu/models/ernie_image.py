"""ERNIE-Image: a single-stream DiT over FLUX.2-family packed latents with
ONE shared adaLN modulation (6 chunks computed once from the timestep and
reused by every layer), llama-style rotate-half RoPE with duplicated-adjacent
cos/sin, and a Ministral-3.3B text tower.

Reference analog: ErnieImage::ErnieImageModel / ErnieImageRunner
(src/model/diffusion/ernie_image.hpp:281,384).  Checkpoint names:
``x_embedder.proj``, ``text_proj``, ``time_embedding.linear_{1,2}``,
``adaLN_modulation.1``, ``layers.N.{adaLN_sa_ln, self_attention.{to_q,to_k,
to_v,norm_q,norm_k,to_out.0}, adaLN_mlp_ln, mlp.{gate_proj,up_proj,
linear_fc2}}``, ``final_norm.{norm,linear}``, ``final_linear``.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from sdtpu.ops import attention, layer_norm, linear, rms_norm, timestep_embedding
from sdtpu.ops.basic import gelu_tanh, silu


@dataclasses.dataclass(frozen=True)
class ErnieImageConfig:
    hidden_size: int = 4096
    num_heads: int = 32
    num_layers: int = 36
    ffn_hidden_size: int = 12288
    in_channels: int = 128
    out_channels: int = 128
    patch_size: int = 1
    text_in_dim: int = 3072
    theta: int = 256
    axes_dim: Tuple[int, ...] = (32, 48, 48)
    eps: float = 1e-6


ERNIE_IMAGE_CONFIG = ErnieImageConfig()


def detect_ernie_config(names, shapes) -> ErnieImageConfig:
    """Reference ErnieImageConfig::detect_from_weights (ernie_image.hpp:30)."""
    names = set(names)
    kw = {}
    xe = shapes.get("x_embedder.proj.weight")  # [hidden, C, p, p]
    if xe:
        kw["hidden_size"] = xe[0]
        kw["in_channels"] = xe[1]
        kw["patch_size"] = xe[3]
    tp = shapes.get("text_proj.weight")
    if tp:
        kw["text_in_dim"] = tp[1]
    nq = shapes.get("layers.0.self_attention.norm_q.weight")
    if nq:
        kw["num_heads"] = kw.get("hidden_size", 4096) // nq[0]
    gp = shapes.get("layers.0.mlp.gate_proj.weight")
    if gp:
        kw["ffn_hidden_size"] = gp[0]
    fl = shapes.get("final_linear.weight")
    if fl:
        kw["out_channels"] = fl[0] // kw.get("patch_size", 1) ** 2
    layers = 0
    for n in names:
        if n.startswith("layers."):
            layers = max(layers, int(n.split(".")[1]) + 1)
    kw["num_layers"] = layers or 36
    return dataclasses.replace(ERNIE_IMAGE_CONFIG, **kw)


def ernie_rope(hp: int, wp: int, n_txt: int, cfg: ErnieImageConfig):
    """(cos, sin) [S, head_dim] with duplicated-adjacent values; image tokens
    first with axis0 = n_txt constant, then text with axis0 = 0..n_txt-1
    (gen_ernie_image_ids + EmbedNDLayout::ErnieImage, rope.hpp:740,227)."""
    n_img = hp * wp
    ids = np.zeros((n_img + n_txt, 3), dtype=np.float64)
    ii, jj = np.meshgrid(np.arange(hp), np.arange(wp), indexing="ij")
    ids[:n_img, 0] = n_txt
    ids[:n_img, 1] = ii.reshape(-1)
    ids[:n_img, 2] = jj.reshape(-1)
    ids[n_img:, 0] = np.arange(n_txt)

    angles = []
    for a, dim in enumerate(cfg.axes_dim):
        scale = np.arange(0, dim, 2, dtype=np.float64) / dim
        omega = 1.0 / (float(cfg.theta) ** scale)
        angles.append(ids[:, a:a + 1] * omega[None])
    ang = np.concatenate(angles, axis=1)  # [S, head_dim/2]
    cos = np.repeat(np.cos(ang), 2, axis=1).astype(np.float32)
    sin = np.repeat(np.sin(ang), 2, axis=1).astype(np.float32)
    return jnp.asarray(cos), jnp.asarray(sin)


def _apply_rotary(x, cos, sin):
    """x: [B, S, H, D]; rotate-half with duplicated-adjacent cos/sin
    (apply_rotary_emb, ernie_image.hpp:98)."""
    d = x.shape[-1]
    half = d // 2
    xf = x.astype(jnp.float32)
    rotated = jnp.concatenate([-xf[..., half:], xf[..., :half]], axis=-1)
    out = xf * cos[None, :, None] + rotated * sin[None, :, None]
    return out.astype(x.dtype)


def _attn(p, pre, x, cos, sin, cfg: ErnieImageConfig):
    b, s, _ = x.shape
    nh = cfg.num_heads
    hd = cfg.hidden_size // nh
    q = linear(x, p[f"{pre}.to_q.weight"]).reshape(b, s, nh, hd)
    k = linear(x, p[f"{pre}.to_k.weight"]).reshape(b, s, nh, hd)
    v = linear(x, p[f"{pre}.to_v.weight"]).reshape(b, s, nh, hd)
    q = rms_norm(q, p[f"{pre}.norm_q.weight"], eps=cfg.eps)
    k = rms_norm(k, p[f"{pre}.norm_k.weight"], eps=cfg.eps)
    q = _apply_rotary(q, cos, sin).transpose(0, 2, 1, 3)
    k = _apply_rotary(k, cos, sin).transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    o = attention(q, k, v).transpose(0, 2, 1, 3).reshape(b, s, nh * hd)
    return linear(o, p[f"{pre}.to_out.0.weight"])


def ernie_image_forward(
    p,
    x: jnp.ndarray,
    timesteps: jnp.ndarray,
    context: jnp.ndarray,
    cfg: ErnieImageConfig = ERNIE_IMAGE_CONFIG,
) -> jnp.ndarray:
    """x: [B, H, W, C] packed latent; timesteps: [B] (raw 0..1000 t);
    context: [B, L, text_in_dim] Ministral hidden states."""
    b, h, w, c = x.shape
    ps = cfg.patch_size
    hp, wp = h // ps, w // ps
    n_img = hp * wp

    if ps == 1:
        img = x.reshape(b, n_img, c)
        img = linear(img, p["x_embedder.proj.weight"].reshape(cfg.hidden_size, -1),
                     p.get("x_embedder.proj.bias"))
    else:
        xp = x.reshape(b, hp, ps, wp, ps, c).transpose(0, 1, 3, 5, 2, 4)
        xp = xp.reshape(b, n_img, c * ps * ps)
        # conv weight [hidden, C, p, p] -> linear over (C, ph, pw)
        wgt = p["x_embedder.proj.weight"].reshape(cfg.hidden_size, -1)
        img = linear(xp, wgt, p.get("x_embedder.proj.bias"))

    txt = context
    if "text_proj.weight" in p:
        txt = linear(txt, p["text_proj.weight"])
    hseq = jnp.concatenate([img, txt], axis=1)

    # [sin | cos] timestep embedding (timestep_embedding_sin_cos,
    # ernie_image.hpp:86)
    sample = timestep_embedding(timesteps, cfg.hidden_size,
                                flip_sin_to_cos=False).astype(img.dtype)
    cvec = linear(sample, p["time_embedding.linear_1.weight"],
                  p["time_embedding.linear_1.bias"])
    cvec = linear(silu(cvec), p["time_embedding.linear_2.weight"],
                  p["time_embedding.linear_2.bias"])

    mods = linear(silu(cvec), p["adaLN_modulation.1.weight"],
                  p["adaLN_modulation.1.bias"])
    sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = [
        m for m in jnp.split(mods[:, None], 6, axis=-1)]

    cos, sin = ernie_rope(hp, wp, txt.shape[1], cfg)
    for i in range(cfg.num_layers):
        pre = f"layers.{i}"
        res = hseq
        hn = rms_norm(hseq, p[f"{pre}.adaLN_sa_ln.weight"], eps=cfg.eps)
        hn = hn * (1.0 + sc_msa) + sh_msa
        hseq = res + _attn(p, f"{pre}.self_attention", hn, cos, sin, cfg) * g_msa
        res = hseq
        hn = rms_norm(hseq, p[f"{pre}.adaLN_mlp_ln.weight"], eps=cfg.eps)
        hn = hn * (1.0 + sc_mlp) + sh_mlp
        gate = gelu_tanh(linear(hn, p[f"{pre}.mlp.gate_proj.weight"]))
        up = linear(hn, p[f"{pre}.mlp.up_proj.weight"])
        hseq = res + linear(up * gate, p[f"{pre}.mlp.linear_fc2.weight"]) * g_mlp

    # final AdaLN-continuous (ernie_image.hpp:260)
    fm = linear(cvec, p["final_norm.linear.weight"], p["final_norm.linear.bias"])
    scale, shift = jnp.split(fm[:, None], 2, axis=-1)
    out = layer_norm(hseq, eps=cfg.eps)
    out = out * (1.0 + scale) + shift
    out = linear(out, p["final_linear.weight"], p.get("final_linear.bias"))

    patches = out[:, :n_img]
    patches = patches.reshape(b, hp, wp, cfg.out_channels, ps, ps)
    patches = patches.transpose(0, 1, 4, 2, 5, 3).reshape(
        b, hp * ps, wp * ps, cfg.out_channels)
    return patches


def init_ernie_params(cfg: ErnieImageConfig, seed: int = 0, dtype=jnp.float32) -> dict:
    g = np.random.default_rng(seed)

    def wt(*shape, scale=0.02):
        return jnp.asarray(g.standard_normal(shape, dtype=np.float32) * scale,
                           dtype=dtype)

    def lin(p, pre, din, dout, bias=True):
        p[f"{pre}.weight"] = wt(dout, din)
        if bias:
            p[f"{pre}.bias"] = jnp.zeros((dout,), dtype=dtype)

    hid = cfg.hidden_size
    hd = hid // cfg.num_heads
    p: dict = {}
    p["x_embedder.proj.weight"] = wt(hid, cfg.in_channels, cfg.patch_size,
                                     cfg.patch_size)
    p["x_embedder.proj.bias"] = jnp.zeros((hid,), dtype=dtype)
    if cfg.text_in_dim != hid:
        lin(p, "text_proj", cfg.text_in_dim, hid, bias=False)
    lin(p, "time_embedding.linear_1", hid, hid)
    lin(p, "time_embedding.linear_2", hid, hid)
    lin(p, "adaLN_modulation.1", hid, 6 * hid)
    for i in range(cfg.num_layers):
        pre = f"layers.{i}"
        p[f"{pre}.adaLN_sa_ln.weight"] = jnp.ones((hid,), dtype=dtype)
        p[f"{pre}.adaLN_mlp_ln.weight"] = jnp.ones((hid,), dtype=dtype)
        lin(p, f"{pre}.self_attention.to_q", hid, hid, bias=False)
        lin(p, f"{pre}.self_attention.to_k", hid, hid, bias=False)
        lin(p, f"{pre}.self_attention.to_v", hid, hid, bias=False)
        p[f"{pre}.self_attention.norm_q.weight"] = jnp.ones((hd,), dtype=dtype)
        p[f"{pre}.self_attention.norm_k.weight"] = jnp.ones((hd,), dtype=dtype)
        lin(p, f"{pre}.self_attention.to_out.0", hid, hid, bias=False)
        lin(p, f"{pre}.mlp.gate_proj", hid, cfg.ffn_hidden_size, bias=False)
        lin(p, f"{pre}.mlp.up_proj", hid, cfg.ffn_hidden_size, bias=False)
        lin(p, f"{pre}.mlp.linear_fc2", cfg.ffn_hidden_size, hid, bias=False)
    lin(p, "final_norm.linear", hid, 2 * hid)
    lin(p, "final_linear", hid, cfg.patch_size**2 * cfg.out_channels)
    return p
